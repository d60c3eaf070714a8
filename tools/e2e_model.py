#!/usr/bin/env python
"""Measured e2e break-even model (VERDICT r2/r3 task: derive, don't assert,
"e2e tracks device-resident on a production link").

Measures on the attached chip + its link:
  1. link upload bandwidth (8 MB u8 and 33 MB f16 payloads) + RT latency,
  2. per-image device compute (programs A+B, resident pixels),
  3. pipelined e2e throughput (encode_images_device, default depth) over N
     images -> overlap efficiency = ideal pipeline bound / measured,
then solves for the link bandwidth where pipelined e2e crosses the 21.9
MP/s CPU reference anchor:

  time/image ~= max(bytes/BW + k_rt * RT_nonoverlap, t_device) / eff
  break-even BW*: bytes / (mp/21.9 * eff - k_rt * RT) for each ingest.

Writes JSON for tools/artifacts/ and the BASELINE.md curve.

Usage: python tools/e2e_model.py [--json out.json] [--n 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=6)
    args = ap.parse_args()

    from jxl_tiny_tpu.encoder import DeviceEncodeJob, encode_images_device
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops.pipeline_jax import analyze_image_packed
    import bench

    img = bench._load_image()
    mp = img.shape[1] * img.shape[2] / 1e6
    u8 = linear_to_srgb_u8(img)
    f16 = img.astype(np.float16)

    # --- 1. link characterization -------------------------------------
    dev = jax.devices()[0]

    def bw_probe(arr, n=3):
        best = 1e9
        for _ in range(n):
            t = time.perf_counter()
            d = jax.device_put(arr, dev)
            d.block_until_ready()
            best = min(best, time.perf_counter() - t)
            del d
        return best

    rt_times = []
    one = jax.device_put(np.zeros(8, np.uint8), dev)
    one.block_until_ready()
    for _ in range(8):
        t = time.perf_counter()
        # Fresh device op per probe — np.asarray(one) would hit jax.Array's
        # cached host copy after the first call and read ~0 ms.
        np.asarray(jnp.ravel(one)[:1])
        rt_times.append(time.perf_counter() - t)
    rt = min(rt_times)

    t_u8 = bw_probe(u8)
    t_f16 = bw_probe(f16)
    bw_u8 = u8.nbytes / max(t_u8 - rt, 1e-9)
    bw_f16 = f16.nbytes / max(t_f16 - rt, 1e-9)
    print(f"link: RT {rt*1e3:.1f} ms; upload u8 {u8.nbytes/1e6:.1f} MB in "
          f"{t_u8*1e3:.0f} ms ({bw_u8/1e6:.1f} MB/s), f16 "
          f"{f16.nbytes/1e6:.1f} MB in {t_f16*1e3:.0f} ms "
          f"({bw_f16/1e6:.1f} MB/s)", flush=True)

    # --- 2. device compute per image (resident pixels) ----------------
    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    up = jnp.asarray(u8)
    yb = jnp.asarray(job.yb_arr)
    xb = jnp.asarray(job.xb_arr)
    np.asarray(up.ravel()[:1])
    dev_times = []
    for _ in range(4):
        t = time.perf_counter()
        out_a = analyze_image_packed(up, yb, xb, cap=job.cap, **job._kwargs)
        np.asarray(out_a["hists"].ravel()[:1])
        job.out_a = out_a
        job._stream = out_a["stream"][:, : job.cap]
        job._totals_d = out_a["totals"]
        job._dispatch_b()
        np.asarray(job.out_small[:1])
        dev_times.append(time.perf_counter() - t)
    t_dev_res = min(dev_times)
    t_dev = max(t_dev_res - 2 * rt, 1e-6)
    print(f"device-resident {t_dev_res*1e3:.1f} ms; compute est "
          f"{t_dev*1e3:.1f} ms ({mp/t_dev:.1f} MP/s)", flush=True)

    # --- 3. pipelined e2e over n images -------------------------------
    results = {}
    for tag, src in (("u8", u8), ("f16", img)):
        imgs = [src] * args.n
        # warm compile on one
        next(iter(encode_images_device([src], 1.0,
                                       upload_dtype=None if tag == "u8"
                                       else np.float16)))
        t = time.perf_counter()
        outs = list(encode_images_device(imgs, 1.0,
                                         upload_dtype=None if tag == "u8"
                                         else np.float16))
        wall = time.perf_counter() - t
        per = wall / args.n
        nbytes = u8.nbytes if tag == "u8" else f16.nbytes
        t_link = nbytes / (bw_u8 if tag == "u8" else bw_f16)
        ideal = max(t_link, t_dev)
        eff = ideal / per
        results[tag] = dict(
            e2e_s_per_image=round(per, 4),
            e2e_mps=round(mp / per, 2),
            upload_s=round(t_link, 4),
            pipeline_ideal_s=round(ideal, 4),
            overlap_efficiency=round(eff, 3),
            bytes=nbytes,
        )
        print(f"{tag}: {per*1e3:.0f} ms/image e2e ({mp/per:.2f} MP/s), "
              f"ideal {ideal*1e3:.0f} ms, overlap eff {eff:.2f}", flush=True)

    # --- 4. break-even curve ------------------------------------------
    target_s = mp / 21.9  # CPU reference anchor
    curve = {}
    for tag in results:
        r = results[tag]
        eff = max(min(r["overlap_efficiency"], 1.0), 1e-3)
        # time/image = (bytes/BW)/eff once link-bound; cross 21.9 MP/s when
        # bytes/BW = target_s * eff (device side already far under target).
        bw_star = r["bytes"] / (target_s * eff)
        curve[tag] = dict(
            breakeven_link_mbps=round(bw_star / 1e6, 1),
            device_bound_mps_at_fast_link=round(mp / t_dev, 1),
        )
        print(f"{tag}: break-even link {bw_star/1e6:.1f} MB/s "
              f"(measured now: {(bw_u8 if tag=='u8' else bw_f16)/1e6:.1f})",
              flush=True)

    out = dict(
        image=f"photo8mp {img.shape[2]}x{img.shape[1]}", mp=round(mp, 3),
        link=dict(rt_ms=round(rt * 1e3, 2),
                  bw_u8_mbps=round(bw_u8 / 1e6, 1),
                  bw_f16_mbps=round(bw_f16 / 1e6, 1)),
        device=dict(resident_ms=round(t_dev_res * 1e3, 2),
                    compute_est_ms=round(t_dev * 1e3, 2),
                    compute_est_mps=round(mp / t_dev, 1)),
        pipelined=results,
        breakeven=curve,
        anchor_mps=21.9,
        model="time/image = max(bytes/BW, t_device)/overlap_eff; "
              "break-even BW* = bytes/(mp/21.9 * eff)",
    )
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            f.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
