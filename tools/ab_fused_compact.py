#!/usr/bin/env python
"""A/B on real hardware: fused tokenize_compact vs separate-stage path.

Encodes the bench image's analysis front-end once, then produces the
compact token stream both ways and byte-compares. Also reports slope-timed
device cost of each variant (old = tokenize_cells + rows_from_tokens +
merge + compact; new = fused kernel)."""
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
    print(f"{name:34s} {dev*1e3:8.2f} ms/app  (K1 {ts[ks[0]]*1e3:.1f})")
    return dev


def main():
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    from jxl_tiny_tpu.ops.pack_kernels import compact_stream, rows_from_tokens
    from jxl_tiny_tpu.ops.tokenize_kernel import tokenize_cells
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    F = dict(
        scale=float(distp.scale), scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul), distance=float(distp.distance),
        inv_scale=float(distp.inv_scale),
    )
    cap = 16384

    groups = jax.jit(PJ.extract_groups_device)(jnp.asarray(u8))
    groups = jnp.asarray(np.asarray(groups).astype(np.float32))
    g = groups.shape[0]
    yb = jnp.full((g,), 32, jnp.int32)
    xb = jnp.full((g,), 32, jnp.int32)
    print(f"g={g}")

    @jax.jit
    def front(groups):
        xyb = PJ.to_xyb(groups)
        qf, masking, raw_qf = PJ.adaptive_quant_field(
            xyb, F["distance"], F["inv_scale"]
        )
        blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef8 = dct2d(blocks8, 8, 8)
        by_i = jnp.arange(32)[:, None]
        bx_i = jnp.arange(32)[None, :]
        valid = (by_i[None] < yb[:, None, None]) & (bx_i[None] < xb[:, None, None])
        ytox, ytob = PJ.compute_cmap(coef8, valid)
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, F["distance"], yb, xb
        )
        raw_qf = PJ.adjust_quant_field(strategy, is_first, raw_qf)
        return xyb, coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob, valid

    xyb, coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob, valid = [
        jnp.asarray(np.asarray(a)) for a in front(groups)
    ]

    @jax.jit
    def old_path(coef8, coef_v, coef_h):
        tf, cf, qdc, _ = PJ.encode_groups(
            xyb, coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox,
            ytob, F["scale"], F["scale_dc"], F["x_qm_mul"], valid,
            base_ctx=True,
        )
        rt, rc = rows_from_tokens(tf, cf)
        return compact_stream(rt, rc, cap)

    @jax.jit
    def new_path(coef8, coef_v, coef_h):
        s, t, _ = PJ.encode_groups_stream(
            coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
            F["scale"], F["scale_dc"], F["x_qm_mul"], valid, cap,
        )
        return s, t

    so, to = old_path(coef8, coef_v, coef_h)
    sn, tn = new_path(coef8, coef_v, coef_h)
    so, to, sn, tn = (np.asarray(a) for a in (so, to, sn, tn))
    print("totals equal:", np.array_equal(to, tn), " max total:", to.max())
    print("stream equal:", np.array_equal(so, sn))
    if not np.array_equal(so, sn):
        bad = np.argwhere(so != sn)
        print("first diffs:", bad[:10], so[tuple(bad[0])], sn[tuple(bad[0])])
        sys.exit(1)

    def mk(path):
        def make(k):
            def f(c8, cv, ch):
                def body(c, _):
                    s, t = path(c8 + c, cv, ch)
                    return s[0, 0].astype(jnp.float32) + c, ()

                c, _ = lax.scan(body, jnp.float32(0), None, length=k)
                return c

            return f

        return make

    def old_fn(c8, cv, ch):
        return old_path.__wrapped__(c8, cv, ch)

    def new_fn(c8, cv, ch):
        return new_path.__wrapped__(c8, cv, ch)

    slope("old: tok+rows+merge+compact", mk(old_fn), coef8, coef_v, coef_h, ks=(1, 3))
    slope("new: fused tokenize_compact", mk(new_fn), coef8, coef_v, coef_h, ks=(1, 3))


if __name__ == "__main__":
    main()
