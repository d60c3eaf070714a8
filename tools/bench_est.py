#!/usr/bin/env python
"""Locate the cost inside compute_ac_strategy on hardware (round 5).

The round-5 prefix-delta ledger says the ac_strategy stage still costs
~9-10 ms after the DCT16-recombination landed; on paper the estimate
kernel is ~1-2 ms of VPU work. Slope-bench the three pieces separately:

  a. DCT16/8x16 recombination from coef8 (two K=8 contractions)
  b. estimate_partials (the Pallas kernel) on materialized inputs
  c. full compute_ac_strategy (recombination + kernel + combine + quad)

Isolated slopes overcount cheap stages (see profile_r04.md) but a
kernel-dominated stage benched against ITS OWN variants in the same
harness is scale-correct; use these to rank, not as ledger truth.
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


def slope(name, make_fn, *inputs, ks=(1, 5), reps=4):
    ts = {}
    for k in ks:
        fn = jax.jit(make_fn(k))
        sync(fn(*inputs))
        best = 1e9
        for _ in range(reps):
            t = time.perf_counter()
            sync(fn(*inputs))
            best = min(best, time.perf_counter() - t)
        ts[k] = best
    dev = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
    print(f"{name:34s} {dev*1e3:8.2f} ms/app", flush=True)
    return dev


def rep(op, k):
    """Repeat op k times with a data-dependent perturbation so XLA can't
    CSE the applications; return a forcing scalar."""
    def f(*args):
        def body(c, _):
            outs = op(*((args[0] + c,) + args[1:]))
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            s = jnp.float32(0)
            for o in outs:
                s = s + jnp.ravel(o)[0].astype(jnp.float32)
            return s + c, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=k)
        return c

    return f


def main():
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.dct_jax import dct2d, dct16x8_from_8, dct8x16_from_8
    from jxl_tiny_tpu.ops.strategy_kernel import (
        combine_partials, estimate_partials,
    )
    import bench

    C = PJ.C
    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    groups = jax.jit(PJ.extract_groups_device)(jnp.asarray(u8))
    xyb = jax.jit(PJ.to_xyb)(groups.astype(jnp.float32))
    g = xyb.shape[0]
    blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    coef8 = jnp.asarray(np.asarray(jax.jit(lambda b: dct2d(b, 8, 8))(blocks8)))
    print(f"g={g}")

    def recomb(c8):
        cpair = c8.reshape(g, 3, 16, 2, 32, 8, 8)
        cv = dct16x8_from_8(cpair[:, :, :, 0], cpair[:, :, :, 1])
        hpair = c8.reshape(g, 3, 32, 16, 2, 8, 8)
        ch = dct8x16_from_8(hpair[:, :, :, :, 0], hpair[:, :, :, :, 1])
        return cv, ch

    slope("recombination (v+h)", lambda k: rep(recomb, k), coef8)

    cv, ch = jax.jit(recomb)(coef8)
    coef_v = jnp.asarray(np.asarray(cv).reshape(g, 3, 16, 32, 128))
    coef_h = jnp.asarray(np.asarray(ch).reshape(g, 3, 32, 16, 128))

    rng = np.random.RandomState(0)
    qf = jnp.asarray(rng.rand(g, 32, 32).astype(np.float32) * 2 + 0.2)
    masking = qf * 1.7
    fac_x = qf * 0.01
    fac_b = 1.0 + qf * 0.01
    qm8 = jnp.asarray(C.QUANT_DCT8.reshape(3, 64))
    qm16 = jnp.asarray(C.QUANT_DCT16.reshape(3, 128))

    def est(c8, cv_, ch_):
        q_v = jnp.maximum(qf.reshape(g, 16, 2, 32)[:, :, 0],
                          qf.reshape(g, 16, 2, 32)[:, :, 1])
        m_v = jnp.maximum(masking.reshape(g, 16, 2, 32)[:, :, 0],
                          masking.reshape(g, 16, 2, 32)[:, :, 1])
        q_h = jnp.maximum(qf.reshape(g, 32, 16, 2)[..., 0],
                          qf.reshape(g, 32, 16, 2)[..., 1])
        m_h = jnp.maximum(masking.reshape(g, 32, 16, 2)[..., 0],
                          masking.reshape(g, 32, 16, 2)[..., 1])
        return estimate_partials(
            c8.reshape(g, 3, 32, 32, 64), cv_, ch_,
            qf, q_v, q_h, masking, m_v, m_h,
            jnp.stack([fac_x, fac_b], axis=1),
            jnp.stack([fac_x.reshape(g, 16, 2, 32)[:, :, 0],
                       fac_b.reshape(g, 16, 2, 32)[:, :, 0]], axis=1),
            jnp.stack([fac_x.reshape(g, 32, 16, 2)[..., 0],
                       fac_b.reshape(g, 32, 16, 2)[..., 0]], axis=1),
            qm8, qm16, 1.0 / 3.0,
        )

    slope("estimate_partials (pallas)", lambda k: rep(est, k),
          coef8, coef_v, coef_h)

    yb_valid = jnp.full((g,), 32, jnp.int32)
    xb_valid = jnp.full((g,), 32, jnp.int32)
    ytox = jnp.zeros((g, 4, 4), jnp.float32)
    ytob = jnp.ones((g, 4, 4), jnp.float32)

    def full(x):
        return PJ.compute_ac_strategy(
            x, coef8, qf, masking, ytox, ytob, 1.0, yb_valid, xb_valid
        )

    slope("compute_ac_strategy (full)", lambda k: rep(full, k), xyb)


if __name__ == "__main__":
    main()
