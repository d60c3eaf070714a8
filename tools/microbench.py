#!/usr/bin/env python
"""Per-kernel DEVICE time via scan-repeat slope.

The tunneled link adds ~25-40 ms of dispatch+sync overhead to every jitted
call, swamping single-call timings. This harness runs each op K times inside
one jit (a lax.scan whose carry perturbs the inputs so XLA cannot hoist or
CSE the op) and reports (t[K=5] - t[K=1]) / 4 — the true marginal device
cost of one application.

Measured history (8MP, d=1.0, v5e; ms per application):

  einsums (token_data_bits, dc variant)   ~0     (fused; MXU)
  hist_base64 on the compact stream        0.3-0.6
  compact_stream                          32.8 -> 21 (skip empty rows)
                                          -> 15.4 (log-merge precond.)
                                          -> 10.8 (dense-halving merge, 4 lv)
  AC bitpack  pair / quad / oct           30.2 / 21.7 / 14.7
    -> 11 (16-token entries) -> 6.1 (zero-init only words touched)
  AC pack total (tdb+cumsum+var+sec)      14.9 -> 6.6-8.3
  DC pack total                           18.8 -> 2.8-4  (tiling reshapes:
    [Gd,~400k] arrays used 4/8 sublanes — dc_hist/merge/cumsum now run on
    re-rowed 2D views; see pack_kernels/dc_kernels comments)
  AQ field                                 6.8 -> 5.5 (pinned strided folds)
  quantize+tokenize                       ~20 -> ~2-4 (Pallas kernels F/T,
    ops/quantize_kernel.py + ops/tokenize_kernel.py)

  A rows-layout redesign (no compaction; tokens packed straight from the
  [G, 3072, 128] emission rows) was built, measured, and reverted: every
  downstream stage paid the 12x slot count (tdb 17, cumsum 7, oct merge 19,
  row-bounded kernel 37, hist 13) for 86 ms of AC packing vs ~50 then —
  token compaction earns its cost by shrinking all downstream work.
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
    cap, ow = job.cap, job.ow
    print(f"cap={cap} ow={ow} g={job.dim.num_groups}")

    stream = jnp.asarray(np.asarray(job._stream))
    totals = jnp.asarray(np.asarray(job.out_a["totals"]))
    layout = jnp.asarray(np.asarray(job.out_a["dc_layout"]))
    d_ac = job._d_dev
    d_dc = job._d_dc
    g = stream.shape[0]

    rng = np.random.RandomState(0)
    tot_np = np.asarray(totals)
    w = rng.rand(g, PK.ROWS)
    # ~40% of emission rows are empty on real content (continuation cells of
    # multi-block transforms emit nothing) — reflect that here so empty-row
    # skipping in the compact kernel is measured realistically.
    w[rng.rand(g, PK.ROWS) < 0.4] = 0.0
    cnt = np.floor(w / w.sum(1, keepdims=True) * tot_np[:, None]).astype(np.int32)
    rows_cnt = jnp.asarray(np.minimum(cnt, 127))
    rows_tok = jnp.asarray(
        rng.randint(0, 1 << 22, size=(g, PK.ROWS, PK.W)).astype(np.uint32)
    )

    def mk_compact(k):
        def f(rt, rc):
            def body(c, _):
                s, t = PK.compact_stream(rt ^ c, rc, cap)
                return s[0, 0] + t[0].astype(jnp.uint32), ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("compact_stream", mk_compact, rows_tok, rows_cnt)

    def mk_ac(k):
        def f(s, t, d):
            def body(c, _):
                out = PK._pack_ac_impl(s ^ (c & 0xFF), t, d, ow, job.wcap)
                return out["words"][0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("AC pack (tdb+cumsum+var+sec)", mk_ac, stream, totals, d_ac)

    data, nbits = PK.token_data_bits(stream, totals, d_ac)
    ends = jnp.cumsum(nbits, axis=1)
    pos = (ends - nbits).astype(jnp.int32)
    data = jnp.asarray(np.asarray(data))
    nbits = jnp.asarray(np.asarray(nbits))
    pos = jnp.asarray(np.asarray(pos))

    def mk_bp(k):
        def f(d, nb, p):
            def body(c, _):
                out = PK.bitpack_groups_var(d ^ (c & 1), nb, p, ow)
                return out[0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("AC bitpack var", mk_bp, data, nbits, pos)

    def mk_hist(k):
        def f(s, t):
            def body(c, _):
                h = PK.hist_base64(s ^ (c & 0xFF), t)
                return h[0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("hist_base64", mk_hist, stream, totals)

    def mk_dc(k):
        def f(l, d):
            def body(c, _):
                out = DK._pack_dc_impl(l ^ (c & 1), d, job._ow_dc, job._wcap_dc)
                return out["words"][0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("DC pack (tdb+cumsum+var+sec)", mk_dc, layout, d_dc)


if __name__ == "__main__":
    main()
