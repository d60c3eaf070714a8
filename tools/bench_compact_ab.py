#!/usr/bin/env python
"""A/B compact_stream variants on hardware with REAL content rows
(round 5): {classic, hier} x {banks 1, 2, 4}.

The round-5 ledger shows compact_stream at ~8.5-11 ms — the largest
tokenize-chain stage. Hypothesis: the OR-placement loop is latency-bound
on the serial read-OR-write chain through the output VMEM buffer, so
K-bank accumulation (JXL_COMPACT_BANKS) should cut it ~K-fold until the
loop's issue rate dominates. Rows come from the actual 8MP pipeline (not
synthetic): the merge preconditioner's win depends on the real content's
row-count distribution (avg ~4 tokens, 96.7% <= 32).

Slope method (k=1 vs 5 applications in one jit) — scale-correct for
ranking variants of the SAME stage in the same harness.
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
    np.asarray(jnp.ravel(x)[:1])


def rep_tok(op, k):
    def f(tok, cnt):
        def body(c, _):
            stream, totals = op(tok ^ c, cnt)
            return c ^ stream[0, 0], ()

        c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
        return c

    return f


def slope(name, fn1, fn5, tok, cnt, reps=4):
    ts = {}
    for k, fn in ((1, fn1), (5, fn5)):
        fn = jax.jit(fn)
        sync(fn(tok, cnt))
        best = 1e9
        for _ in range(reps):
            t = time.perf_counter()
            sync(fn(tok, cnt))
            best = min(best, time.perf_counter() - t)
        ts[k] = best
    dev = (ts[5] - ts[1]) / 4
    print(f"{name:28s} {dev*1e3:8.2f} ms/app", flush=True)
    return dev


def main():
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops import pack_kernels as PK
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    from jxl_tiny_tpu.ops.tokenize_kernel import tokenize_cells
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    cap = 32768

    @jax.jit
    def to_rows(up):
        groups = PJ.extract_groups_device(up)
        xyb = PJ.to_xyb(groups)
        g = groups.shape[0]
        qf, masking, raw_qf0 = PJ.adaptive_quant_field(
            xyb, distp.distance, distp.inv_scale
        )
        blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef8 = dct2d(blocks8, 8, 8)
        valid = jnp.ones((g, 32, 32), bool)
        ytox, ytob = PJ.compute_cmap(coef8, valid)
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, distp.distance,
            jnp.full((g,), 32, jnp.int32), jnp.full((g,), 32, jnp.int32),
        )
        raw_qf = PJ.adjust_quant_field(strategy, is_first, raw_qf0)
        first = is_first & valid
        m = PJ._encode_middle(
            coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
            distp.scale, distp.scale_dc, distp.x_qm_mul, first,
        )
        shp = m["nzeros_total"].shape
        covered_b = jnp.broadcast_to(m["covered"][:, None], shp)
        first_b = jnp.broadcast_to(first[:, None], shp)
        chan = jnp.asarray(PJ._EMIT_CHAN)

        def em(a):
            return a[:, chan].transpose(0, 2, 3, 1)

        tokens_em, count_em = tokenize_cells(
            m["ordered"], em(covered_b), em(m["nzeros_total"]),
            em(m["block_ctx"]), em(m["nzero_ctx"]), em(m["prev_init"]),
            em(first_b),
        )
        return tokens_em.reshape(g, -1, 128), count_em.reshape(g, -1)

    tok, cnt = to_rows(jnp.asarray(u8))
    tok = jnp.asarray(np.asarray(tok))
    cnt = jnp.asarray(np.asarray(cnt))
    c = np.asarray(cnt)
    print(f"g={tok.shape[0]} rows={tok.shape[1]} "
          f"tokens/group med={np.median(c.sum(1)):.0f} "
          f"nonempty={float((c > 0).mean()):.2f} "
          f"thin<=32={float((c[c > 0] <= 32).mean()):.3f}", flush=True)

    for hier, name in ((PK.compact_stream, "classic"),
                       (PK.compact_stream_hier, "hier")):
        for banks in (1, 2, 4):
            os.environ["JXL_COMPACT_BANKS"] = str(banks)
            try:
                slope(f"{name} banks={banks}",
                      rep_tok(lambda t, c_: hier(t, c_, cap), 1),
                      rep_tok(lambda t, c_: hier(t, c_, cap), 5),
                      tok, cnt)
            finally:
                del os.environ["JXL_COMPACT_BANKS"]


if __name__ == "__main__":
    main()
