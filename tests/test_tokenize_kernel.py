"""Fused tokenization kernel vs the jnp tail it replaces (bit-equal)."""
import numpy as np
import jax.numpy as jnp

from jxl_tiny_tpu.ops import pipeline_jax as PJ
from jxl_tiny_tpu.ops.tokenize_kernel import tokenize_cells


def _jnp_tail(ordered, covered, nztot, block_ctx, nzero_ctx, prev_init, first):
    """Verbatim twin of encode_groups' tokenization tail (base_ctx=True)."""
    from jxl_tiny_tpu.ops.pack_kernels import base64_zd

    k_idx = jnp.arange(128)
    size = covered * 64
    in_range = (k_idx >= covered[..., None]) & (k_idx < size[..., None])
    nonzero = (ordered != 0) & in_range
    cum_nz = jnp.cumsum(nonzero, axis=-1)
    nz_left = nztot[..., None] - cum_nz + nonzero
    prev_nonzero = PJ._shift0(nonzero.astype(jnp.int32), -1, -1)
    first_pos = k_idx == covered[..., None]
    prev = jnp.where(first_pos, prev_init[..., None], prev_nonzero)
    cov2 = (covered > 1)[..., None]
    nzl_shift = -(-nz_left // jnp.maximum(covered[..., None], 1))
    nnz_part = jnp.zeros_like(nzl_shift)
    for t, d in zip(PJ._NNZ_THRESH.tolist(), PJ._NNZ_DELTA.tolist()):
        nnz_part = nnz_part + jnp.where(nzl_shift >= t, d, 0)
    freq_part = jnp.where(
        cov2, jnp.asarray(PJ._FREQ_TAB[1]), jnp.asarray(PJ._FREQ_TAB[0])
    )
    coeff_ctx = base64_zd(nnz_part + freq_part, prev, block_ctx[..., None])
    tok_valid = in_range & (nz_left > 0) & first[..., None]
    coeff_val = PJ._pack_signed(ordered)

    def shift_sel(a, fill):
        sh = jnp.concatenate([a[..., 1:], jnp.full_like(a[..., :1], fill)], -1)
        return jnp.where(cov2, sh, a)

    ctx_g = shift_sel(coeff_ctx, 0)
    val_g = shift_sel(coeff_val, 0)
    valid_g = shift_sel(tok_valid, False)
    slot0 = jnp.zeros((128,), bool).at[0].set(True)
    valid_g = valid_g & ~slot0
    packed = (ctx_g.astype(jnp.uint32) << 16) | val_g.astype(jnp.uint32)
    nz_token = (nzero_ctx.astype(jnp.uint32) << 16) | nztot.astype(jnp.uint32)
    tokens = jnp.where(valid_g, packed, 0)
    tokens = jnp.where(slot0, nz_token[..., None], tokens)
    last_valid = jnp.max(jnp.where(valid_g, jnp.arange(128), 0), axis=-1)
    count = jnp.where(first, 1 + last_valid, 0)
    return tokens, count


def test_tokenize_cells_matches_jnp_tail():
    rng = np.random.RandomState(5)
    n = 1500  # not a multiple of the kernel tile (exercises padding)
    ordered = rng.randint(-40, 40, size=(n, 128)).astype(np.int32)
    ordered[rng.rand(n, 128) < 0.8] = 0
    covered = rng.randint(1, 3, size=(n,)).astype(np.int32)
    block_ctx = rng.randint(0, 4, size=(n,)).astype(np.int32)
    nzero_ctx = rng.randint(0, 16, size=(n,)).astype(np.int32)
    first = rng.rand(n) < 0.8
    k = np.arange(128)
    in_range = (k >= covered[:, None]) & (k < covered[:, None] * 64)
    nztot = ((ordered != 0) & in_range).sum(-1).astype(np.int32)
    prev_init = (nztot <= (covered * 64) >> 4).astype(np.int32)

    args = [
        jnp.asarray(a)
        for a in (ordered, covered, nztot, block_ctx, nzero_ctx, prev_init, first)
    ]
    tok_k, cnt_k = tokenize_cells(*args)
    tok_j, cnt_j = _jnp_tail(*args)
    assert np.array_equal(np.asarray(cnt_k), np.asarray(cnt_j))
    assert np.array_equal(np.asarray(tok_k), np.asarray(tok_j))
