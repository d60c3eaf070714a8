#!/usr/bin/env python
"""Device-resident A+B loop timing only (bench.py's headline, more reps)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops.pipeline_jax import analyze_image_packed
    import bench

    img = bench._load_image()
    mp = img.shape[1] * img.shape[2] / 1e6
    u8 = linear_to_srgb_u8(img)
    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    up = jnp.asarray(u8)
    yb = jnp.asarray(job.yb_arr)
    xb = jnp.asarray(job.xb_arr)
    np.asarray(up.ravel()[:1])
    ts = []
    for _ in range(10):
        t = time.time()
        out_a = analyze_image_packed(up, yb, xb, cap=job.cap, **job._kwargs)
        np.asarray(out_a["hists"].ravel()[:1])
        job.out_a = out_a
        job._stream = out_a["stream"][:, : job.cap]
        job._totals_d = out_a["totals"]
        job._dispatch_b()
        np.asarray(job.out_small[:1])
        ts.append(time.time() - t)
    best = min(ts)
    print("times:", " ".join(f"{t*1e3:.1f}" for t in ts))
    print(f"best {best*1e3:.1f} ms = {mp/best:.1f} MP/s")


if __name__ == "__main__":
    main()
