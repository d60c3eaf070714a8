#!/usr/bin/env python
"""Pin down program B's whole-dispatch time (VERDICT r4 task 6).

Round 4 saw program B's whole-dispatch wall time swing 4-12 ms while its
prefix-delta stage sum was 2-4 ms, and waved the difference at "tunnel
variance". This probe settles it: B dispatched back-to-back N times with
RESIDENT inputs (stream/totals/d_table/dc_layout live in HBM, uploaded
once), one sync per dispatch, per-dispatch wall timestamps, and the tunnel
RT probed immediately before and after with a fresh one-element device
read. If median(B_wall) - RT exceeds the stage sum by >= 2 ms, that is
real dispatch+sync overhead (fuse B's epilogue into A or batch B across
images); otherwise the earlier swings were tunnel noise riding the
per-dispatch sync.

Run during a hardware window:
  python tools/probe_b_dispatch.py [--n 20] [--json out.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rt_probe(x, n=6):
    import jax.numpy as jnp

    ts = []
    for _ in range(n):
        t = time.perf_counter()
        np.asarray(jnp.ravel(x)[:1])  # fresh device op: no host-copy cache
        ts.append(time.perf_counter() - t)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.io.pfm import read_pfm
    from jxl_tiny_tpu.ops.dc_kernels import pack_all_sections

    img = read_pfm(
        os.path.join(os.path.dirname(__file__), "..", "testdata", "photo8mp.pfm")
    )
    u8 = linear_to_srgb_u8(img)

    job = DeviceEncodeJob(u8, 1.0)
    job.pack()  # dispatches B once (compiles); inputs now resident
    np.asarray(job.out_small[:1])  # drain

    stream = job._stream
    totals = job._totals_d
    d_dev = job._d_dev
    d_dc = job._d_dc
    layout = job.out_a["dc_layout"]
    pk = dict(
        ow_ac=job.ow, wcap_ac=job.wcap, ow_dc=job._ow_dc,
        wcap_dc=job._wcap_dc, compact_ac=True, compact_dc=True,
    )

    def run_b():
        out = pack_all_sections(stream, totals, d_dev, layout, d_dc, **pk)
        return out["small"]

    np.asarray(run_b()[:1])  # warm (same executable as job's dispatch)

    rt0 = rt_probe(totals)
    walls = []
    for _ in range(args.n):
        t = time.perf_counter()
        np.asarray(run_b()[:1])
        walls.append(time.perf_counter() - t)
    rt1 = rt_probe(totals)

    rt = min(rt0, rt1)
    walls_ms = [round(w * 1e3, 2) for w in walls]
    med = float(np.median(walls))
    out = {
        "n": args.n,
        "rt_before_ms": round(rt0 * 1e3, 2),
        "rt_after_ms": round(rt1 * 1e3, 2),
        "b_wall_ms": walls_ms,
        "b_wall_med_ms": round(med * 1e3, 2),
        "b_wall_min_ms": round(min(walls) * 1e3, 2),
        "b_wall_max_ms": round(max(walls) * 1e3, 2),
        "b_device_est_ms": round((med - rt) * 1e3, 2),
        "b_device_est_min_ms": round((min(walls) - rt) * 1e3, 2),
        "note": "b_device_est = median wall minus one tunnel RT (each "
        "dispatch syncs once); compare against the prefix-delta stage sum "
        "from tools/profile_b.py in the SAME window",
    }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
