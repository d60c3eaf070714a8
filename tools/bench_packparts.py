#!/usr/bin/env python
"""Decompose _pack_ac_rows_impl cost on real 8MP inputs (scan-repeat slope)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def slope(name, make_fn, *inputs):
    ts = {}
    for k in (1, 5):
        fn = jax.jit(make_fn(k))
        fn(*inputs)
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(fn(*inputs).ravel()[:1])
            best = min(best, time.perf_counter() - t)
        ts[k] = best
    print(f"{name:30s} {(ts[5]-ts[1])/4*1e3:8.2f} ms/app")


def main():
    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pack_kernels as PK
    import bench

    u8 = linear_to_srgb_u8(bench._load_image())
    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    job.result()
    ow = job.ow

    rows = jnp.asarray(np.asarray(job.out_a["rows"]))
    rows_cnt = jnp.asarray(np.asarray(job.out_a["rows_cnt"]))
    d_ac = job._d_dev
    g = rows.shape[0]

    # Precompute real (data, nbits, pos) once.
    def tdb(r, rc, d):
        flat = r.reshape(g, -1)
        valid = (jnp.arange(PK.W)[None, None, :] < rc[..., None]).reshape(g, -1)
        base = (flat >> 16).astype(jnp.int32) & 63
        tok, nb_extra, extra = PK._uint_token_extra(flat & 0xFFFF)
        packed = PK.table_lookup_packed(base, tok, d)
        depth = (packed >> 16).astype(jnp.uint32)
        code = (packed & 0xFFFF).astype(jnp.uint32)
        data = jnp.where(valid, code | (extra.astype(jnp.uint32) << depth), 0)
        nbits = (depth.astype(jnp.int32) + nb_extra) * valid
        return data, nbits

    data, nbits = jax.jit(tdb)(rows, rows_cnt, d_ac)
    ends = jnp.cumsum(nbits, axis=1)
    pos = (ends - nbits).astype(jnp.int32)
    data = jnp.asarray(np.asarray(data))
    nbits = jnp.asarray(np.asarray(nbits))
    pos = jnp.asarray(np.asarray(pos))

    def mk_tdb(k):
        def f(r, rc, d):
            def body(c, _):
                dd, nb = tdb(r ^ (c & 1), rc, d)
                return dd[0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("tdb on rows", mk_tdb, rows, rows_cnt, d_ac)

    def mk_cumsum(k):
        def f(nb):
            def body(c, _):
                e = jnp.cumsum(nb + (c & 1).astype(nb.dtype), axis=1)
                return e[0, -1].astype(jnp.uint32), ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("flat cumsum", mk_cumsum, nbits)

    def mk_prep(k):
        def f(d, nb):
            def body(c, _):
                qall, n8 = PK._oct_entries(d ^ (c & 1), nb)
                return qall[0, 0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("oct entry merge", mk_prep, data, nbits)

    def mk_kernel(k):
        def f(d, nb, p, rc):
            def body(c, _):
                out = PK.bitpack_rows(
                    (d ^ (c & 1)).reshape(g, PK.ROWS, PK.W),
                    nb.reshape(g, PK.ROWS, PK.W),
                    p.reshape(g, PK.ROWS, PK.W), rc, ow,
                )
                return out[0, 0] + c, ()

            c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
            return c

        return f

    slope("bitpack_rows (merge+kernel)", mk_kernel, data, nbits, pos, rows_cnt)


if __name__ == "__main__":
    main()
