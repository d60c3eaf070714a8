#!/usr/bin/env python
"""Per-kernel DEVICE time via scan-repeat slope.

The tunneled link adds ~25-40 ms of dispatch+sync overhead to every jitted
call, swamping single-call timings. This harness runs each op K times inside
one jit (a lax.scan whose carry perturbs the inputs so XLA cannot hoist or
CSE the op) and reports (t[K=5] - t[K=1]) / 4 — the true marginal device
cost of one application. Measured history (8MP, v5e):

  round 1 flagship:  compact_stream 32.8 | AC bitpack(pair) 30.2 |
                     DC bitpack(pair) ~20 | einsums/cumsum/hist ~0-0.6
  rows refactor:     compact gone; bitpack_rows / bitpack_groups_var
                     write only overlapped words (~2 per oct entry)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    np.asarray(x.ravel()[:1])


def slope(name, make_fn, *inputs):
    ts = {}
    for k in (1, 5):
        fn = jax.jit(make_fn(k))
        fn(*inputs)  # compile
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            sync(fn(*inputs))
            best = min(best, time.perf_counter() - t)
        ts[k] = best
    dev = (ts[5] - ts[1]) / 4
    print(
        f"{name:30s} {dev*1e3:8.2f} ms/app   (K1 {ts[1]*1e3:.1f} ms, K5 {ts[5]*1e3:.1f} ms)"
    )
    return dev


def main():
    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import dc_kernels as DK
    from jxl_tiny_tpu.ops import pack_kernels as PK
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    job.result()
    ow = job.ow
    print(f"ow={ow} g={job.dim.num_groups}")

    rows = jnp.asarray(np.asarray(job.out_a["rows"]))
    rows_cnt = jnp.asarray(np.asarray(job.out_a["rows_cnt"]))
    layout = jnp.asarray(np.asarray(job.out_a["dc_layout"]))
    d_ac = job._d_dev
    d_dc = job._d_dc
    g = rows.shape[0]

    def mk_ac(k):
        def f(r, rc, d):
            def body(c, _):
                out = PK._pack_ac_rows_impl(
                    r ^ (c & 1), rc, d, ow, job.wcap
                )
                return out["words"][0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("AC pack (rows, full)", mk_ac, rows, rows_cnt, d_ac)

    def mk_dc(k):
        def f(l, d):
            def body(c, _):
                out = DK._pack_dc_impl(l ^ (c & 1), d, job._ow_dc, job._wcap_dc)
                return out["words"][0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("DC pack (layout, full)", mk_dc, layout, d_dc)

    def mk_hist(k):
        def f(r, rc):
            def body(c, _):
                h = PK.hist_rows(r ^ (c & 0xFF), rc)
                return h[0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("hist_rows", mk_hist, rows, rows_cnt)

    def mk_dchist(k):
        def f(l):
            def body(c, _):
                h = DK.dc_hist(l ^ (c & 1))
                return h[0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("dc_hist", mk_dchist, layout)


if __name__ == "__main__":
    main()
