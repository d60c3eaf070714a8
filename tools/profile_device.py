#!/usr/bin/env python
"""Ad-hoc stage profiler for the flagship device programs (A and B).

Times each sub-stage as its own jitted program on the attached TPU with
realistic inputs taken from a real 8MP encode, so optimization effort goes
where the milliseconds are. Compiles are cached (~/.cache/jxl_tiny_tpu_xla).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def timeit(name, fn, n=4):
    fn()  # compile / warm
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms   {[round(t*1e3,1) for t in ts]}")
    return min(ts)


def main():
    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import dc_kernels as DK
    from jxl_tiny_tpu.ops import pack_kernels as PK
    from jxl_tiny_tpu.ops.pipeline_jax import analyze_image_packed
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    bytes_out = job.result()
    print(f"encoded {len(bytes_out)} bytes; cap={job.cap} ow={job.ow}")

    up = jnp.asarray(u8)
    yb = jnp.asarray(job.yb_arr)
    xb = jnp.asarray(job.xb_arr)
    sync(up)

    # --- program A total and pieces ---
    def run_a():
        return analyze_image_packed(up, yb, xb, cap=job.cap, **job._kwargs)

    t_a = timeit("A total", run_a)
    out_a = run_a()
    stream = out_a["stream"][:, : job.cap]
    totals = out_a["totals"]
    layout = out_a["dc_layout"]
    sync((stream, totals, layout))

    # Rows for compaction timing: re-derive realistic row counts from totals.
    g = stream.shape[0]
    rows_tok = jnp.zeros((g, PK.ROWS, PK.W), jnp.uint32)
    rng = np.random.RandomState(0)
    tot_np = np.asarray(totals)
    cnt = rng.rand(g, PK.ROWS).astype(np.float32)
    cnt = np.floor(cnt / cnt.sum(1, keepdims=True) * tot_np[:, None]).astype(
        np.int32
    )
    rows_cnt = jnp.asarray(np.minimum(cnt, 127))

    cs = jax.jit(lambda rt, rc: PK.compact_stream(rt, rc, job.cap))
    timeit("A: compact_stream", lambda: cs(rows_tok, rows_cnt))

    hb = jax.jit(lambda s, t: PK.hist_base64(s, t))
    timeit("A: hist_base64", lambda: hb(stream, totals))

    dh = jax.jit(DK.dc_hist)
    timeit("A: dc_hist", lambda: dh(layout))

    # --- program B total and pieces ---
    d_ac = job._d_dev
    d_dc = job._d_dc
    sync((d_ac, d_dc))

    def run_b():
        return DK.pack_all_sections(
            stream, totals, d_ac, layout, d_dc,
            ow_ac=job.ow, wcap_ac=job.wcap, ow_dc=job._ow_dc,
            wcap_dc=job._wcap_dc,
        )

    t_b = timeit("B total", run_b)

    ac_only = jax.jit(
        lambda s, t, d: PK._pack_ac_impl(s, t, d, job.ow, job.wcap)
    )
    timeit("B: AC pack total", lambda: ac_only(stream, totals, d_ac))

    dc_only = jax.jit(
        lambda l, d: DK._pack_dc_impl(l, d, job._ow_dc, job._wcap_dc)
    )
    timeit("B: DC pack total", lambda: dc_only(layout, d_dc))

    tdb = jax.jit(PK.token_data_bits)
    timeit("B: AC token_data_bits", lambda: tdb(stream, totals, d_ac))

    data, nbits = tdb(stream, totals, d_ac)
    ends = jnp.cumsum(nbits, axis=1)
    pos = ends - nbits
    sync((data, nbits, pos))

    bp = jax.jit(
        lambda d, nb, p: PK.bitpack_groups_paired(d, nb, p, job.ow)
    )
    timeit("B: AC bitpack_paired", lambda: bp(data, nbits, pos))

    dtdb = jax.jit(DK.dc_token_data_bits)
    timeit("B: DC token_data_bits", lambda: dtdb(layout, d_dc))

    ddata, dnbits = dtdb(layout, d_dc)
    dends = jnp.cumsum(dnbits, axis=1)
    dpos = dends - dnbits
    sync((ddata, dnbits, dpos))
    dbp = jax.jit(
        lambda d, nb, p: PK.bitpack_groups_paired(d, nb, p, job._ow_dc)
    )
    timeit("B: DC bitpack_paired", lambda: dbp(ddata, dnbits, dpos))

    print(json.dumps({"A_ms": round(t_a * 1e3, 1), "B_ms": round(t_b * 1e3, 1)}))


if __name__ == "__main__":
    main()
