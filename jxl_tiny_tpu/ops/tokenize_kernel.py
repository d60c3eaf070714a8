"""Fused per-coefficient tokenization as Pallas TPU kernels.

Two kernels share one tokenization core (`_tokenize_block`):

`tokenize_cells` — the tail of pipeline_jax.encode_groups (everything after
the zig-zag reorder: prefix nonzero counts, zero-density contexts, validity,
token packing) in one read + one write. Semantics mirror
enc_group.cc:448-493 tokenization exactly (through the jnp twin in
pipeline_jax; tested bit-equal). base-64 contexts only.

`tokenize_compact` — the flagship fusion: tokenize + log-merge + stream
compaction in ONE kernel per group. The separate-stage path materialized
the fat [G,3,32,32,128] token array three times (tokenize write, emission
reorder, merge levels) before the compact kernel's scalar OR-placement
loop; here tokens live in a VMEM scratch from birth to placement and only
the compact per-group stream is written to HBM. The merge *decisions*
depend only on per-row token counts, which are known before tokenization
(kernel F's last_nz output), so the merge plan (which adjacent rows fuse
at each level, the final visit list, stream positions) is precomputed with
cheap jnp on [G, 3072] arrays and the kernel only executes data movement.

  - per-row scalars (covered, nzeros, contexts, flags) ride in a separate
    [rows/128, 128] meta input, broadcast per row via a minor-dim insert
  - the inclusive prefix count of nonzeros is one [R,128]x[128,128]
    triangular matmul on the MXU (counts <= 128 exact)
  - neighbor lanes (prev-nonzero, the covered=2 slot shift) are cyclic
    pltpu.roll's with edge masks
  - merge level L ORs row i+2^L into row i (rows i = multiples of 2^(L+1))
    where both fit in 128 lanes; the variable lane shift by the head's
    count is 7 conditional rolls; sublane-offset reads go through aligned
    loads + a sublane roll (Mosaic dislikes unaligned sublane slices)
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
    nnz_part = jnp.zeros_like(x)
    for t, d in zip(_NNZ_THRESH.tolist(), _NNZ_DELTA.tolist()):
        nnz_part = nnz_part + jnp.where(nzl_shift >= t, d, 0)
    freq_sel = jnp.where(cov2, freq[1][None, None, :], freq[0][None, None, :])
    q = jnp.minimum(nnz_part + freq_sel, 5)
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


# ---------------------------------------------------------------------------
# Fused tokenize + merge + compact (T2)
# ---------------------------------------------------------------------------

MERGE_LEVELS = 6
CHUNK = 256  # rows tokenized/merged per in-kernel step
PAD_ROWS = 64  # scratch/plan row padding (>= max merge stride 2^(L-1))
_M30 = (1 << 30) - 1


def merge_plan(rows_cnt, levels=MERGE_LEVELS):
    """Simulate the in-kernel log-merge on token counts only.

    rows_cnt: [G, R] i32 per-emission-row token counts. Level L merges row
    i+2^L into row i (for i a multiple of 2^(L+1)) when the head holds all
    tokens of its span (`full`), the tail is non-empty, and the union fits
    in W lanes — the same adjacency rule as pack_kernels.merge_rows, so the
    compacted stream is bit-identical to the separate-stage path.

    Returns (plan [G, levels, R] i32 = cnt_at_level | do<<30,
    starts [G, R], cnt_final [G, R], order [G, R], nb [G], totals [G])."""
    g, nrows = rows_cnt.shape
    idx = jnp.arange(nrows)
    cnt = rows_cnt.astype(jnp.int32)
    ends = jnp.cumsum(cnt, axis=1)
    totals = ends[:, -1].astype(jnp.int32)
    starts = (ends - cnt).astype(jnp.int32)
    full = jnp.ones((g, nrows), bool)
    planes = []
    for lvl in range(levels):
        s = 1 << lvl
        active = (idx % (2 * s)) == 0
        c0 = cnt
        c1 = jnp.roll(cnt, -s, axis=1)
        f1 = jnp.roll(full, -s, axis=1)
        do = (
            active[None]
            & full
            & (c1 > 0)
            & (c0 + c1 <= W)
            & (idx[None] + s < nrows)
        )
        planes.append(c0 | (do.astype(jnp.int32) << 30))
        cnt = jnp.where(do, c0 + c1, cnt)
        cnt = jnp.where(jnp.roll(do, s, axis=1) & (idx[None] >= s), 0, cnt)
        full = jnp.where(active[None], full & f1 & (do | (c1 == 0)), full)
    plan = jnp.stack(planes, axis=1)
    order = jnp.argsort(cnt == 0, axis=1, stable=True).astype(jnp.int32)
    nb = (cnt > 0).sum(axis=1).astype(jnp.int32)
    return plan, starts, cnt, order, nb, totals


def _tok_compact_kernel(
    smeta_ref, plan_ref, meta_ref, x_ref, tri_ref, freq_ref, out_ref,
    scr_ref, xs_ref, sem_x, *, cap, levels, rows
):
    """x_ref lives in HBM (memory_space ANY): streaming the whole group's
    coefficients as a pipeline block costs 1.57 MB x 2-3 buffers of scoped
    VMEM, which together with the 1.6 MB token scratch and the (then
    lane-padded x16) plan blew the 16 MB scoped-VMEM ceiling on hardware at
    G >= 64. The kernel DMAs coefficients chunk by chunk (double-buffered)
    into a small scratch instead. The plan streams normally but lane-major
    ([levels, rows/128+1, 128], ~100 KB/group): a DMA of the row-major
    [rows, levels] form is illegal (minor dim 8 not 128-aligned) and its
    streamed block tile-pads x16."""
    nchunk = rows // CHUNK
    nb128 = CHUNK // 128
    tri = tri_ref[...]
    freq = freq_ref[...]
    i = pl.program_id(0)

    def xdma(c, slot):
        return pltpu.make_async_copy(
            x_ref.at[i, pl.ds(c * CHUNK, CHUNK), :],
            xs_ref.at[slot],
            sem_x.at[slot],
        )

    # Phase 1: tokenize into scratch, chunk by chunk.
    xdma(0, 0).start()
    for c in range(nchunk):
        if c + 1 < nchunk:
            xdma(c + 1, (c + 1) % 2).start()
        xdma(c, c % 2).wait()
        x = xs_ref[c % 2].reshape(CHUNK // 128, 128, 128)
        meta = meta_ref[0, c * (CHUNK // 128) : (c + 1) * (CHUNK // 128), :][
            :, :, None
        ]
        scr_ref[c * CHUNK : (c + 1) * CHUNK, :] = _tokenize_block(
            x, meta, tri, freq
        ).reshape(CHUNK, 128)

    # Phase 2: log-merge in scratch. Sublane-offset reads (row i+s) are an
    # aligned 2-block load + sublane roll. The plan arrives lane-major
    # (emission rows on lanes, like meta); each chunk's per-row column is
    # recovered with the same minor-dim insert phase 1 uses for meta. All
    # plan handling is chunk-local: a whole-rows [rows+PAD, 1] column
    # (1.6 MB lane-padded) held live across the chunk loop for each of the
    # 6 levels is exactly how the round-2/3 hardware compiles blew the
    # 16 MB scoped-VMEM ceiling at G >= 64; chunk-local [CHUNK, 1]
    # temporaries die within their iteration and Mosaic reuses their slots.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (nb128, 128, 128), 2)
    subs = jax.lax.broadcasted_iota(jnp.int32, (nb128, 128, 1), 1)
    for lvl in range(levels):
        s = 1 << lvl
        for c in range(nchunk):
            r0 = c * CHUNK
            cur = scr_ref[r0 : r0 + CHUNK, :]
            nxt = scr_ref[r0 + CHUNK : r0 + CHUNK + PAD_ROWS, :]
            ext = jnp.concatenate([cur, nxt], axis=0)
            tail = pltpu.roll(ext, (CHUNK + PAD_ROWS) - s, axis=0)[:CHUNK, :]
            # This level's plan column for rows [r0, r0+CHUNK) plus one
            # extra 128-row block covering the +s tail rows. All handling
            # stays 3-D [nb,128,1] — the flat [CHUNK+128,1] reshape has no
            # Mosaic lowering on hardware — so the +s shift is a sublane
            # roll with a two-block select at the 128-row seam.
            w = plan_ref[0, lvl, c * nb128 : c * nb128 + nb128 + 1, :][
                :, :, None
            ]
            pc = w[:nb128]  # [nb,128,1] i32
            c0 = pc & _M30
            do = pc >> 30
            r_lo = pltpu.roll(w[:nb128], 128 - s, axis=1)
            r_hi = pltpu.roll(w[1 : nb128 + 1], 128 - s, axis=1)
            c1 = jnp.where(subs < 128 - s, r_lo, r_hi) & _M30
            cur3 = cur.reshape(nb128, 128, 128)
            sft = tail.reshape(nb128, 128, 128)
            for b in range(7):
                rolled = pltpu.roll(sft, 1 << b, axis=2)
                sft = jnp.where(((c0 >> b) & 1) > 0, rolled, sft)
            hm = jnp.where(lanes < c0, cur3, jnp.uint32(0))
            sm = jnp.where(
                (lanes >= c0) & (lanes < c0 + c1), sft, jnp.uint32(0)
            )
            res = jnp.where(do > 0, hm | sm, cur3)
            scr_ref[r0 : r0 + CHUNK, :] = res.reshape(CHUNK, 128)

    # Phase 3: scalar OR-placement of the merged rows into the stream.
    out_ref[...] = jnp.zeros_like(out_ref)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * W), 1)
    nb = smeta_ref[0, 3, 0]

    def body(i, _):
        r = smeta_ref[0, 2, i]  # nonempty merged rows, front-sorted
        st = smeta_ref[0, 0, r]
        ct = smeta_ref[0, 1, r]
        a = st & (W - 1)
        w0 = jnp.minimum((st >> 7) * W, cap - W)
        w0 = pl.multiple_of(w0, W)
        row = scr_ref[pl.ds(r, 1), :]
        ext = jnp.concatenate([row, jnp.zeros((1, W), jnp.uint32)], axis=1)
        rot = pltpu.roll(ext, a, axis=1)
        contrib = jnp.where(
            (lanes2 >= a) & (lanes2 < a + ct), rot, jnp.uint32(0)
        )
        cur = out_ref[0, 0, pl.ds(w0, 2 * W)].reshape(1, 2 * W)
        out_ref[0, 0, pl.ds(w0, 2 * W)] = (cur | contrib).reshape(2 * W)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def tokenize_compact(ordered_em, meta_em, cnt_em, cap, levels=MERGE_LEVELS):
    """ordered_em: [G, rows, 128] i32 zig-zag coefficients in emission-row
    order; meta_em: [G, rows] i32 packed per-row meta (pack_row_meta);
    cnt_em: [G, rows] i32 per-row token counts (from kernel F's last_nz).

    Returns (stream [G, cap + 128] u32, totals [G] i32) — bit-identical to
    tokenize_cells + rows_from_tokens + compact_stream, in one kernel."""
    g, rows, _ = ordered_em.shape
    assert rows % CHUNK == 0 and rows % 128 == 0
    assert (1 << (levels - 1)) <= PAD_ROWS, "merge stride exceeds row pad"
    plan, starts, cntf, order, nb, totals = merge_plan(cnt_em, levels)
    # [G, levels, rows/128+1, 128]: emission rows on lanes (like meta), one
    # zero block of row pad so phase 2's +s tail reads stay in-window. A
    # row-major [rows, levels] plan can neither stream (8-lane minor dim
    # tile-pads x16 -> 1.6 MB/group VMEM, the round-2/3 OOM) nor DMA
    # (minor dim must be 128-aligned).
    plan_p = jnp.pad(plan, ((0, 0), (0, 0), (0, 128))).reshape(
        g, levels, rows // 128 + 1, 128
    )
    meta2d = meta_em.astype(jnp.int32).reshape(g, rows // 128, 128)
    smeta = jnp.stack(
        [starts, cntf, order, jnp.broadcast_to(nb[:, None], (g, rows))], axis=1
    )
    out = pl.pallas_call(
        functools.partial(
            _tok_compact_kernel, cap=cap, levels=levels, rows=rows
        ),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, rows), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, levels, rows // 128 + 1, 128), lambda i: (i, 0, 0, 0)
            ),
            pl.BlockSpec((1, rows // 128, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
            pl.BlockSpec((2, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cap + W), lambda i: (i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, cap + W), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((rows + PAD_ROWS, 128), jnp.uint32),
            pltpu.VMEM((2, CHUNK, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(
        smeta,
        plan_p,
        meta2d,
        ordered_em.astype(jnp.int32),
        jnp.asarray(_TRI_INCL),
        jnp.asarray(_FREQ_TAB),
    )
    return out[:, 0], totals
