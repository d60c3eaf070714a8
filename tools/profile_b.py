#!/usr/bin/env python
"""Prefix-delta attribution inside device program B (AC + DC section
packing, ~10-11 ms of the round-4 whole-program trace). Same methodology
as profile_whole.py; inputs are the real program-A outputs + entropy code
tables of the 8MP flagship encode.

Usage: python tools/profile_b.py [--json tools/artifacts/profile_b_r04.json]
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


def _fsum(*arrs):
    tot = jnp.float32(0)
    for a in arrs:
        tot = tot + jnp.sum(a.astype(jnp.float32))
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pack_kernels as PK
    from jxl_tiny_tpu.ops import dc_kernels as DK
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    np.asarray(job.out_small[:1])

    stream = job._stream
    totals = job._totals_d
    d_ac = job._d_dev
    d_dc = job._d_dc
    layout = job.out_a["dc_layout"]
    ow_ac, wcap_ac = job.ow, job.wcap
    ow_dc, wcap_dc = job._ow_dc, job._wcap_dc

    def s_tdb(st):
        data, nbits = PK.token_data_bits(st["stream"], st["totals"], d_ac)
        return (data, nbits), dict(data=data, nbits=nbits)

    def s_cumsum(st):
        ends = jnp.cumsum(st["nbits"], axis=1)
        pos = ends - st["nbits"]
        bits = ends[:, -1].astype(jnp.int32)
        return (pos, bits), dict(pos=pos, bits=bits)

    def s_bitpack(st):
        packed = PK.bitpack_groups_words(
            st["data"], st["nbits"], st["pos"], ow_ac
        )
        return (packed,), dict(packed=packed)

    def s_compactsec(st):
        words, offs = PK.compact_sections(st["packed"], st["bits"], wcap_ac)
        return (words, offs), dict()

    def s_dc(st):
        dc = DK._pack_dc_impl(st["layout"], d_dc, ow_dc, wcap_dc, True)
        return (dc["words"], dc["bits"], dc["word_offs"]), dict()

    stages = [
        ("ac token_data_bits", s_tdb),
        ("ac cumsum bitpos", s_cumsum),
        ("ac bitpack_groups_words", s_bitpack),
        ("ac compact_sections", s_compactsec),
        ("dc pack (tokens+pack+compact)", s_dc),
    ]

    rows = []
    prev = 0.0
    for k in range(1, len(stages) + 1):
        sub = stages[:k]

        def fn(stream, totals, layout, _sub=sub):
            st = dict(stream=stream, totals=totals, layout=layout)
            force = jnp.float32(0)
            for _, sfn in _sub:
                outs, upd = sfn(st)
                st.update(upd)
                force = force + _fsum(*outs)
            return force

        jf = jax.jit(fn)
        out = jf(stream, totals, layout)
        np.asarray(out)
        best = 1e9
        for _ in range(args.n):
            t = time.perf_counter()
            np.asarray(jf(stream, totals, layout))
            best = min(best, time.perf_counter() - t)
        delta = best - prev
        rows.append(dict(stage=stages[k - 1][0],
                         prefix_ms=round(best * 1e3, 2),
                         delta_ms=round(delta * 1e3, 2)))
        prev = best
        print(f"{stages[k-1][0]:32s} prefix {best*1e3:7.2f} ms  "
              f"delta {delta*1e3:7.2f} ms", flush=True)

    out = json.dumps(dict(stages=rows), indent=1)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
