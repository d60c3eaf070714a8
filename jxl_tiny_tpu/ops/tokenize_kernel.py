"""Fused per-coefficient tokenization as a Pallas TPU kernel.

`tokenize_cells` — the tail of pipeline_jax.encode_groups (everything after
the zig-zag reorder: prefix nonzero counts, zero-density contexts, validity,
token packing) in one read + one write. Semantics mirror
enc_group.cc:448-493 tokenization exactly (through the jnp twin in
pipeline_jax; tested bit-equal). base-64 contexts only.

  - per-row scalars (covered, nzeros, contexts, flags) ride in a separate
    [rows/128, 128] meta input, broadcast per row via a minor-dim insert
  - the inclusive prefix count of nonzeros is one [R,128]x[128,128]
    triangular matmul on the MXU (counts <= 128 exact)
  - neighbor lanes (prev-nonzero, the covered=2 slot shift) are cyclic
    pltpu.roll's with edge masks

A fully fused variant (`tokenize_compact`: tokenize + log-merge + stream
compaction in one kernel per group, tokens VMEM-resident from birth to
placement) was built in rounds 2-3 and DELETED in round 4 after losing
the A/B at every tested scale (G=16: 69.6 vs 70.4 ms, G=135: tie, G=512:
137.6 vs 145.2 — tools/artifacts/ab_fused_r04.json): its chunk-local plan
recompute and in-kernel scalar placement cost more than the fat token
array's HBM round trip that it avoided. See git history for the kernel.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pipeline_jax import _NNZ_THRESH, _NNZ_DELTA, _FREQ_TAB
from .pack_kernels import _interpret

R = 1024  # rows per grid step (tokenize_cells)
W = 128  # token capacity per emission row

_TRI_INCL = np.tril(np.ones((128, 128), np.float32)).T  # [k,j]=1 iff k<=j


def pack_row_meta(covered, nzeros_total, block_ctx, nzero_ctx, prev_init, first):
    """Per-cell scalars -> one i32 word."""
    return (
        ((covered - 1) & 1)
        | (nzeros_total << 1)
        | (block_ctx << 8)
        | (nzero_ctx << 12)
        | (prev_init << 18)
        | (first.astype(jnp.int32) << 19)
    )


def _tokenize_block(x, meta, tri, freq):
    """Shared tokenization core. x: [n,128,128] i32 zig-zag coefficients;
    meta: [n,128,1] i32 packed per-row scalars; tri: [128,128] f32;
    freq: [2,128] i32. Returns tokens [n,128,128] u32 (lane 0 = nzeros
    token, lanes >= 1 = coefficient tokens)."""
    n = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128, 128), 2)
    lane0 = lane == 0
    covered = (meta & 1) + 1
    nztot = (meta >> 1) & 127
    block_ctx = (meta >> 8) & 15
    nzero_ctx = (meta >> 12) & 63
    prev_init = (meta >> 18) & 1
    first = (meta >> 19) & 1
    cov2 = covered == 2

    in_range = (lane >= covered) & (lane < covered * 64)
    nonzero = (x != 0) & in_range
    nzv = nonzero.astype(jnp.int32)
    cum = jax.lax.dot_general(
        nonzero.astype(jnp.float32).reshape(n * 128, 128),
        tri,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(n, 128, 128)
    nz_left = nztot - cum + nzv
    prev_nz = jnp.where(lane0, 0, pltpu.roll(nzv, 1, axis=2))
    prev = jnp.where(lane == covered, prev_init, prev_nz)

    nzl_shift = jnp.where(cov2, (nz_left + 1) >> 1, nz_left)
    freq_sel = jnp.where(cov2, freq[1][None, None, :], freq[0][None, None, :])
    # q = min(nnz_part + freq_part, 5) saturates whenever ANY nnz step has
    # fired: every COEFF_NNZ_CTX delta is >= 26 > 5 (the base-64 cap), so
    # the full 7-step monotone step function (12+ vector passes on the fat
    # lane array in round 4) collapses to one threshold test against the
    # first step. Guarded by the assert in tokenize_cells.
    q = jnp.where(
        nzl_shift >= int(_NNZ_THRESH[0]), 5, jnp.minimum(freq_sel, 5)
    )
    coeff_ctx = 16 + block_ctx * 12 + q * 2 + prev  # base64_zd
    tok_valid = in_range & (nz_left > 0) & (first > 0)
    coeff_val = jnp.where(x >= 0, 2 * x, -2 * x - 1)  # pack_signed

    def shsel(a):  # covered=2 reads lane k+1 (source slot shift), fill 0
        nxt = jnp.where(lane == 127, 0, pltpu.roll(a, 127, axis=2))
        return jnp.where(cov2, nxt, a)

    ctx_g = shsel(coeff_ctx)
    val_g = shsel(coeff_val)
    valid_g = shsel(tok_valid.astype(jnp.int32)) * (~lane0)
    packed = jnp.where(valid_g > 0, (ctx_g << 16) | val_g, 0)
    nz_token = (nzero_ctx << 16) | nztot
    return jnp.where(lane0, nz_token, packed).astype(jnp.uint32)


def _tok_kernel(x_ref, meta_ref, tri_ref, freq_ref, o_ref):
    x = x_ref[...].reshape(8, 128, 128)
    meta = meta_ref[...][:, :, None]  # [8,128,1] i32
    out = _tokenize_block(x, meta, tri_ref[...], freq_ref[...])
    o_ref[...] = out.reshape(1024, 128)


def tokenize_cells(
    ordered, covered, nzeros_total, block_ctx, nzero_ctx, prev_init, first
):
    """ordered: [..., 128] i32 zig-zag coeffs; the rest: [...] per-cell.

    Returns (tokens_full [..., 128] u32 — lane 0 = nzeros token, lanes >=1
    = coefficient tokens; count_full [...] i32), bit-equal to the jnp tail
    of encode_groups."""
    # The kernel's one-test NNZ context shortcut requires every step delta
    # to exceed the base-64 q cap (see _tokenize_block).
    assert int(_NNZ_DELTA.min()) > 5, "NNZ deltas must saturate the q cap"
    shp = ordered.shape
    n = int(np.prod(shp[:-1]))
    meta = pack_row_meta(
        covered.astype(jnp.int32),
        nzeros_total.astype(jnp.int32),
        block_ctx.astype(jnp.int32),
        nzero_ctx.astype(jnp.int32),
        prev_init.astype(jnp.int32),
        first,
    )
    x = ordered.astype(jnp.int32).reshape(n, 128)
    meta = meta.reshape(n)
    pad = (-n) % R
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 128), jnp.int32)], axis=0)
        meta = jnp.concatenate([meta, jnp.zeros((pad,), jnp.int32)])
    meta2d = meta.reshape(-1, 128)
    out = pl.pallas_call(
        _tok_kernel,
        grid=((n + pad) // R,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
            pl.BlockSpec((2, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + pad, 128), jnp.uint32),
        interpret=_interpret(),
    )(x, meta2d, jnp.asarray(_TRI_INCL), jnp.asarray(_FREQ_TAB))
    tokens = out[:n].reshape(shp)
    slot = jnp.arange(128)
    last_valid = jnp.max(
        jnp.where((tokens != 0) & (slot >= 1), slot, 0), axis=-1
    )
    count = jnp.where(first, 1 + last_valid, 0)
    return tokens, count
