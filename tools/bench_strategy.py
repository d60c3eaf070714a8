#!/usr/bin/env python
"""Decompose compute_ac_strategy's device cost (scan-repeat slope, 8MP)."""
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


def slope(name, make_fn, *inputs, ks=(1, 5)):
    ts = {}
    for k in ks:
        fn = jax.jit(make_fn(k))
        fn(*inputs)
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            sync(fn(*inputs))
            best = min(best, time.perf_counter() - t)
        ts[k] = best
    dev = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
    print(f"{name:30s} {dev*1e3:8.2f} ms/app")
    return dev


def rep(op, k):
    def f(*args):
        def body(c, _):
            out = op(*((args[0] + c,) + args[1:]))
            return out.ravel()[0].astype(jnp.float32) + c, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=k)
        return c

    return f


def main():
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    groups = jax.jit(PJ.extract_groups_device)(jnp.asarray(u8))
    groups = jnp.asarray(np.asarray(groups).astype(np.float32))
    xyb = jnp.asarray(np.asarray(jax.jit(PJ.to_xyb)(groups)))
    g = xyb.shape[0]
    print(f"g={g}")

    def mk(op):
        return lambda k: rep(op, k)

    # 1. the vertical blk transpose alone
    def tr_v(x):
        return x.reshape(g, 3, 16, 16, 32, 8).transpose(0, 1, 2, 4, 3, 5) + 0.0

    slope("blk_v transpose", mk(tr_v), xyb)

    # 2. transpose + dct (current two-step einsum form)
    def dct_v(x):
        b = x.reshape(g, 3, 16, 16, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        return dct2d(b, 16, 8).reshape(g, 3, 16, 32, 128)

    slope("blk_v transpose+dct2d", mk(dct_v), xyb)

    # 3. transpose + single [128,128] matmul form
    from jxl_tiny_tpu.ref.dct_np import dct_matrix

    D16, D8 = dct_matrix(16), dct_matrix(8)
    M = np.einsum("fy,gx->fgyx", D16, D8)  # [yf, xf, y, x]
    M = M.transpose(1, 0, 2, 3).reshape(128, 256 // 2)  # wrong shape guard
    M = np.einsum("fy,gx->gfyx", D16, D8).reshape(128, 128).astype(np.float32)
    Mj = jnp.asarray(M)

    def dct_v_m(x):
        b = (
            x.reshape(g, 3, 16, 16, 32, 8)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(g, 3, 16, 32, 128)
        )
        return jnp.einsum(
            "...p,kp->...k", b, Mj, precision=jax.lax.Precision.HIGHEST
        )

    slope("blk_v transpose+M128 matmul", mk(dct_v_m), xyb)

    # 4. estimate_entropy alone on coef_v
    blk_v = xyb.reshape(g, 3, 16, 16, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    coef_v = jnp.asarray(
        np.asarray(jax.jit(lambda b: dct2d(b, 16, 8))(blk_v)).reshape(
            g, 3, 16, 32, 128
        )
    )
    qf = jnp.asarray(np.random.RandomState(0).rand(g, 32, 32).astype(np.float32))
    masking = qf * 2.0
    fac_x = qf * 0.01
    fac_b = 1.0 + qf * 0.01
    qm16 = jnp.asarray(
        np.asarray(jax.jit(lambda: jnp.asarray(PJ.C.QUANT_DCT16.reshape(3, 128)))())
    )

    def est_v(cv):
        q_v = jnp.maximum(qf[:, ::2], qf[:, 1::2])
        m_v = jnp.maximum(masking[:, ::2], masking[:, 1::2])
        return PJ._estimate_entropy(
            cv, qm16, q_v, m_v, fac_x[:, ::2], fac_b[:, ::2], 1.0
        )

    slope("estimate_entropy(coef_v)", mk(est_v), coef_v)

    # 5. estimate_entropy on coef8
    blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    coef8 = jnp.asarray(np.asarray(jax.jit(lambda b: dct2d(b, 8, 8))(blocks8)))
    qm8 = jnp.asarray(PJ.C.QUANT_DCT8.reshape(3, 64))

    def est_8(c8):
        return PJ._estimate_entropy(
            c8.reshape(g, 3, 32, 32, 64), qm8, qf, masking, fac_x, fac_b, 1.0
        )

    slope("estimate_entropy(coef8)", mk(est_8), coef8)


if __name__ == "__main__":
    main()
