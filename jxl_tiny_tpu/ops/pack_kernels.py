"""Device-side AC-section entropy packing: Pallas TPU kernels + jnp glue.

This is the transfer-lean flagship path. The reference serializes AC group
sections on the host, one token at a time (enc_frame.cc:784-800 through
BitWriter, enc_bit_writer.cc:119-142). On TPU the device<->host link is the
scarce resource, so the final per-group section *bits* are produced on device
and only ~compressed-size bytes cross the link:

  program A (pipeline_jax.analyze_image_packed):
      pixels -> tokens in emission-row layout -> compact_stream (Pallas) ->
      base-64 histograms (one-hot outer-product matmul, MXU)
  host: cluster histograms (<=8), build canonical prefix codes as the
      factored [9, 64] (cluster map | depth, bits) table      (~tiny)
  program B (pack_ac_sections):
      per-token (data, nbits) via factored one-hot table lookup (MXU) ->
      per-group bit positions (cumsum) -> vectorized pair->quad->oct entry
      merge -> variable-window scalar bit-pack (Pallas, SMEM; each <=224-bit
      entry writes only the words it overlaps) -> aligned word-compaction
      of all sections into one buffer

Design constraints learned from hardware measurements (see repo history):
random gathers/scatters cost ~10-16 ns/element on TPU, so every table lookup
here is either arithmetic, a step-function, or a one-hot matmul; vector
stores to dynamic offsets must be 128-lane aligned, so the token compaction
kernel places each row with a dynamic roll and ORs into an aligned window.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

ROWS = 32 * 32 * 3  # emission rows per group: raster cells x channels (Y,X,B)
W = 128  # tokens per row capacity (= coeffs of a 2-block transform)


def _interpret():
    # Pallas TPU kernels run interpreted on CPU (tests / multichip dry runs)
    # and under utils.debug.debug_mode (the sanitizer-build equivalent).
    import os

    return (
        jax.default_backend() == "cpu"
        or os.environ.get("JXL_TPU_PALLAS_INTERPRET") == "1"
    )


# ---------------------------------------------------------------------------
# Base-64 context map (structured, arithmetic — no gather needed on device)
# ---------------------------------------------------------------------------
#
# The reference histograms tokens through a static 1980->64 cluster table at
# tokenize time and clusters those 64 to <=8 (static_entropy_codes.h:160-501,
# enc_frame.cc:768-782). Any base map yields a conformant stream (the final
# context map written to the codestream is the composition), so instead of a
# baked table we use a *structured* map computable with vector arithmetic:
#
#   nzeros tokens: base = block_ctx * 4 + bucket4(nz_pred_bucket)   in [0,16)
#   coeff tokens:  base = 16 + block_ctx * 12 + min(nnz+freq, 5)*2 + prev
#
# where nz_pred_bucket is the 37-bucket nonzero predictor bucket and
# (nnz, freq, prev) are the zero-density context parts (ac_context.h:64-114).

_NZ_SPLITS = (1, 4, 8)  # nz bucket -> 4 groups
_ZD_Q_MAX = 5  # (nnz+freq) cap -> 12 zd groups with prev bit


def base64_nz(nz_bucket, block_ctx):
    b4 = sum((nz_bucket >= t).astype(jnp.int32) for t in _NZ_SPLITS)
    return block_ctx * 4 + b4


def base64_zd(q, prev, block_ctx):
    """q = nnz_part + freq_part; prev in {0,1}."""
    z12 = jnp.minimum(q, _ZD_Q_MAX) * 2 + prev
    return 16 + block_ctx * 12 + z12


def ac_base64_map():
    """Numpy twin: full-context map [NUM_AC_CONTEXTS] -> base cluster (u8).

    Must match base64_nz/base64_zd exactly (tested)."""
    n_nz = C.NUM_BLOCK_CTXS * C.NONZERO_BUCKETS
    m = np.zeros(C.NUM_AC_CONTEXTS, np.uint8)
    ctx = np.arange(C.NUM_AC_CONTEXTS)
    nz = ctx < n_nz
    nz_bucket = ctx[nz] // C.NUM_BLOCK_CTXS
    block = ctx[nz] % C.NUM_BLOCK_CTXS
    b4 = sum((nz_bucket >= t).astype(np.int64) for t in _NZ_SPLITS)
    m[nz] = block * 4 + b4
    rest = ctx[~nz] - n_nz
    block = rest // C.ZERO_DENSITY_CONTEXT_COUNT
    zd = rest % C.ZERO_DENSITY_CONTEXT_COUNT
    q = zd >> 1
    prev = zd & 1
    m[~nz] = 16 + block * 12 + np.minimum(q, _ZD_Q_MAX) * 2 + prev
    return m


NUM_BASE_CTXS = 64


# ---------------------------------------------------------------------------
# Token compaction: emission rows -> per-group dense stream
# ---------------------------------------------------------------------------


def _compact_banks():
    """Accumulator banks for the OR-placement loops (JXL_COMPACT_BANKS,
    default 1). The loop's read-OR-write of the output buffer is one
    serial dependence chain through VMEM; with K banks iteration i lands
    in bank i mod K, splitting the chain K ways (placement is order-free,
    so banks OR together at the end — one vector pass over the ~130 KB
    buffers). Gated until the hardware window A/Bs it."""
    import os

    return max(1, int(os.environ.get("JXL_COMPACT_BANKS", "1")))


def _bank_place(refs, i, w0, contrib):
    """OR `contrib` into refs[i mod K] at word offset w0."""
    if len(refs) == 1:
        ref = refs[0]
        cur = ref[0, 0, pl.ds(w0, 2 * W)].reshape(1, 2 * W)
        ref[0, 0, pl.ds(w0, 2 * W)] = (cur | contrib).reshape(2 * W)
        return
    sel = jax.lax.rem(i, len(refs))
    for k, ref in enumerate(refs):
        @pl.when(sel == k)
        def _(ref=ref):
            cur = ref[0, 0, pl.ds(w0, 2 * W)].reshape(1, 2 * W)
            ref[0, 0, pl.ds(w0, 2 * W)] = (cur | contrib).reshape(2 * W)


def _bank_fold(out_ref, banks_refs):
    for b in banks_refs:
        out_ref[...] = out_ref[...] | b[...]


def _compact_kernel(meta_ref, tok_ref, out_ref, *banks_refs, cap):
    out_ref[...] = jnp.zeros_like(out_ref)
    for b in banks_refs:
        b[...] = jnp.zeros_like(b)
    refs = (out_ref,) + banks_refs
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * W), 1)
    nb = meta_ref[0, 3, 0]  # non-empty row count

    def body(i, _):
        r = meta_ref[0, 2, i]  # non-empty rows, front-sorted
        s = meta_ref[0, 0, r]
        c = meta_ref[0, 1, r]
        a = s & (W - 1)
        w0 = jnp.minimum((s >> 7) * W, cap - W)
        w0 = pl.multiple_of(w0, W)
        row = tok_ref[0, r, :].reshape(1, W)
        ext = jnp.concatenate([row, jnp.zeros((1, W), jnp.uint32)], axis=1)
        rot = pltpu.roll(ext, a, axis=1)
        contrib = jnp.where(
            (lanes >= a) & (lanes < a + c), rot, jnp.uint32(0)
        )
        _bank_place(refs, i, w0, contrib)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    _bank_fold(out_ref, banks_refs)


def left_pack(val, keep):
    """Stable left-pack along the last axis: survivors (keep) move left by
    their count of preceding holes; holes are overwritten, the tail is
    zero-filled. Pure log-shift compaction — ceil(log2(n)) select/shift
    passes, no gather/scatter/argsort (the r04 lesson: a [G, n] scatter
    costs milliseconds at n ~ 3072; these passes are microseconds).

    Each survivor's move distance dist = index - (rank - 1) is
    non-decreasing along the axis, so shifting by one bit of dist at a
    time never collides (standard vector-compaction argument; same
    machinery as the word left-pack in bitpack_groups_words)."""
    n = val.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1)
    dist = jnp.where(keep, idx - (rank - 1), 0).astype(jnp.int32)
    val = jnp.where(keep, val, jnp.zeros_like(val))
    s = 1
    while s < n:
        inc_v = jnp.concatenate(
            [val[..., s:], jnp.zeros_like(val[..., :s])], axis=-1
        )
        inc_d = jnp.concatenate(
            [dist[..., s:], jnp.zeros_like(dist[..., :s])], axis=-1
        )
        take = (inc_d & s) > 0
        leave = (dist & s) > 0
        val = jnp.where(take, inc_v, jnp.where(leave, jnp.zeros_like(val), val))
        dist = jnp.where(take, inc_d - s, jnp.where(leave, 0, dist))
        s *= 2
    return val


def merge_rows(
    rows_tok, rows_cnt, levels=6, starts=None, full_init=None,
    collect_tails=True,
):
    """Log-merge preconditioner: pairwise-merge adjacent emission rows whose
    combined token count fits in the row width, halving (per level) the
    rows the compact kernel's scalar loop must visit. Vectorized jnp: the
    variable right-shift of the tail row by the head's count is
    log2(width) conditional static shifts.

    Bit-exact by construction — tokens keep their stream positions, carried
    as explicit per-row starts. A tail may only merge into a head that
    holds ALL tokens of its half-block (tracked by `full`), otherwise runs
    would not be adjacent in the stream. Heads live in a dense, halving
    array per level and unmerged tails are collected aside (row order is
    free for the OR-placing kernel), so each level touches half the data
    of the one before instead of rebuilding the full array.

    Returns (tok [G, R, W], starts [G, R], cnt [G, R], totals [G]).

    width/starts/full_init/collect_tails parametrize the hierarchical
    variant (compact_stream_hier): a narrower merge width (fewer shift
    passes on narrower arrays), explicit global starts (the input rows may
    be pre-merged heads whose counts no longer cumsum to positions), a
    seeded fullness mask, and tail-dropping (the caller recovers dropped
    rows by coverage instead)."""
    g, R, _ = rows_tok.shape
    width = rows_tok.shape[-1]
    shift_bits = max(1, (width - 1).bit_length())
    cnt = rows_cnt.astype(jnp.int32)
    if starts is None:
        ends = jnp.cumsum(cnt, axis=1)
        totals = ends[:, -1]
        starts = ends - cnt
    else:
        totals = None
    lanes = jnp.arange(width)
    H, S, Cn = rows_tok, starts, cnt
    full = jnp.ones((g, R), bool) if full_init is None else full_init
    tails = []
    for _ in range(levels):
        if H.shape[1] % 2:
            break
        # Even/odd rows via reshape — x[:, ::2] lowers to stablehlo.gather
        # (slow path on TPU); a pair-axis reshape + unit slice does not.
        Hr = H.reshape(g, -1, 2, H.shape[-1])
        head, tail = Hr[:, :, 0], Hr[:, :, 1]
        Cr = Cn.reshape(g, -1, 2)
        c0, c1 = Cr[:, :, 0], Cr[:, :, 1]
        s1 = S.reshape(g, -1, 2)[:, :, 1]
        fr = full.reshape(g, -1, 2)
        f0, f1 = fr[:, :, 0], fr[:, :, 1]
        do = f0 & (c1 > 0) & (c0 + c1 <= width)
        sft = tail
        for b in range(shift_bits):
            sh = 1 << b
            shifted = jnp.concatenate(
                [jnp.zeros_like(sft[..., :sh]), sft[..., :-sh]], axis=-1
            )
            sft = jnp.where((((c0 >> b) & 1) > 0)[..., None], shifted, sft)
        # Lanes beyond a row's count may hold garbage (the compact kernel
        # masks them; a merge must too).
        hm = jnp.where(lanes < c0[..., None], head, 0)
        sm = jnp.where(
            (lanes >= c0[..., None]) & (lanes < (c0 + c1)[..., None]), sft, 0
        )
        H = jnp.where(do[..., None], hm | sm, head)
        if collect_tails:
            tails.append(
                (jnp.where(do[..., None], 0, tail), s1, jnp.where(do, 0, c1))
            )
        Cn = jnp.where(do, c0 + c1, c0)
        S = S.reshape(g, -1, 2)[:, :, 0]
        full = f0 & f1 & (do | (c1 == 0))
    if not collect_tails:
        return H, S, Cn, full
    tok = jnp.concatenate([H] + [t[0] for t in reversed(tails)], axis=1)
    st = jnp.concatenate([S] + [t[1] for t in reversed(tails)], axis=1)
    ct = jnp.concatenate([Cn] + [t[2] for t in reversed(tails)], axis=1)
    return tok, st, ct, totals


def compact_stream(rows_tok, rows_cnt, cap, merge_levels=6):
    """rows_tok: [G, ROWS, 128] u32; rows_cnt: [G, ROWS] i32.

    Returns (stream [G, cap + 128] u32, totals [G] i32). Tokens of row r land
    at positions [start_r, start_r + cnt_r) of the group's stream; positions
    >= totals[g] are zero. Groups whose totals exceed `cap` are truncated
    (callers re-run at a larger cap — totals is exact either way).

    The scalar loop visits only non-empty rows, through a front-sorted index
    list (every continuation cell of a 2-block transform contributes an
    empty row — typically 30-50% of rows on photographic content; OR-placing
    rows is order-independent, so processing order is free). A log-merge
    preconditioner (merge_rows) first fuses runs of adjacent rows into one
    row each where they fit, further shrinking the visit list ~2-4x."""
    g = rows_tok.shape[0]
    if merge_levels:
        rows_tok, starts, cnt, totals = merge_rows(
            rows_tok, rows_cnt, merge_levels
        )
    else:
        cnt = rows_cnt.astype(jnp.int32)
        ends = jnp.cumsum(cnt, axis=1)
        starts = ends - cnt
        totals = ends[:, -1]
    nrows = rows_tok.shape[1]
    # Stable partition (non-empty row indices first, original order) via
    # log-shift left_pack on the [G, nrows] index map — replaces a
    # unique-index scatter (which itself replaced a stable argsort;
    # measured 2.7 ms isolated on [135, 3072]) with ~log2(nrows) cheap
    # vector passes over a 1.6 MB map. The kernel only reads the first
    # nb entries, so the zero-filled tail is never consumed.
    ne = cnt > 0
    r_idx = jnp.broadcast_to(jnp.arange(nrows, dtype=jnp.int32), cnt.shape)
    order = left_pack(r_idx, ne)
    nb = jnp.broadcast_to((cnt > 0).sum(axis=1)[:, None], (g, nrows)).astype(
        jnp.int32
    )
    meta = jnp.stack([starts, cnt, order, nb], axis=1)  # [G,4,nrows]
    stream = pl.pallas_call(
        functools.partial(_compact_kernel, cap=cap),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 4, nrows), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nrows, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cap + W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, cap + W), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, 1, cap + W), jnp.uint32)
            for _ in range(_compact_banks() - 1)
        ],
        interpret=_interpret(),
    )(meta, rows_tok)
    return stream[:, 0], totals


THIN_W = 32  # thin-row width of the hierarchical compaction


def _compact_hier_kernel(
    metaW_ref, meta2_ref, tokW_ref, thin_ref, orig_ref, out_ref, *banks_refs,
    cap,
):
    out_ref[...] = jnp.zeros_like(out_ref)
    for b in banks_refs:
        b[...] = jnp.zeros_like(b)
    refs = (out_ref,) + banks_refs
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * W), 1)

    def place(i, row256, s, c):
        a = s & (W - 1)
        w0 = jnp.minimum((s >> 7) * W, cap - W)
        w0 = pl.multiple_of(w0, W)
        rot = pltpu.roll(row256, a, axis=1)
        contrib = jnp.where((lanes >= a) & (lanes < a + c), rot, jnp.uint32(0))
        _bank_place(refs, i, w0, contrib)

    zero_half = jnp.zeros((1, W), jnp.uint32)
    zero_thin = jnp.zeros((1, 2 * W - THIN_W), jnp.uint32)

    def body_w(i, _):  # merged wide entries
        r = metaW_ref[0, 2, i]
        row = tokW_ref[0, r, :].reshape(1, W)
        place(
            i, jnp.concatenate([row, zero_half], axis=1),
            metaW_ref[0, 0, r], metaW_ref[0, 1, r],
        )
        return 0

    jax.lax.fori_loop(0, metaW_ref[0, 3, 0], body_w, 0)

    def body_s(i, _):  # unabsorbed thin rows (<= THIN_W tokens)
        r = meta2_ref[0, 2, i]
        row = thin_ref[0, r, :].reshape(1, THIN_W)
        place(
            i, jnp.concatenate([row, zero_thin], axis=1),
            meta2_ref[0, 0, r], meta2_ref[0, 1, r],
        )
        return 0

    jax.lax.fori_loop(0, meta2_ref[0, 4, 0], body_s, 0)

    def body_f(i, _):  # fat rows, from the original full-width array
        r = meta2_ref[0, 3, i]
        row = orig_ref[0, r, :].reshape(1, W)
        place(
            i, jnp.concatenate([row, zero_half], axis=1),
            meta2_ref[0, 0, r], meta2_ref[0, 1, r],
        )
        return 0

    jax.lax.fori_loop(0, meta2_ref[0, 5, 0], body_f, 0)
    _bank_fold(out_ref, banks_refs)


def compact_stream_hier(rows_tok, rows_cnt, cap, thin_levels=2, wide_levels=4):
    """Hierarchical compact_stream (same contract): merge the cheap levels
    at THIN_W lanes instead of 128.

    Content measurement (photo8mp crop, d=1.0): emission rows average ~4
    tokens, 96.7% hold <= 32 — so the classic merge's first levels push
    128-lane arrays around to combine handfuls of tokens. Here:

      1. rows with <= THIN_W tokens merge at THIN_W lanes for thin_levels
         levels (quarter the traffic, 5-bit shifts), WITHOUT collecting
         tails — a dropped tail's constituent rows are recovered by
         coverage: a level-k head always absorbs a contiguous prefix run
         of its 2^k-row block, so row r was absorbed iff its token range
         ends within its block head's range (ends[r] <= head_end[block]).
      2. surviving heads zero-pad to 128 lanes and continue through the
         classic tail-collecting merge at a quarter of the row count.
      3. the placement kernel runs three scalar loops: merged wide
         entries, unabsorbed thin rows (read at THIN_W lanes from the
         thin slice), and fat rows (> THIN_W tokens, 3.3% measured) read
         from the original full-width array.

    Byte-equal to compact_stream (tested); the split is position-explicit
    so OR-placement order stays free."""
    g, R, _ = rows_tok.shape
    assert R % (1 << thin_levels) == 0
    cnt = rows_cnt.astype(jnp.int32)
    ends = jnp.cumsum(cnt, axis=1)
    starts = ends - cnt
    totals = ends[:, -1]
    fat = cnt > THIN_W
    thin_cnt = jnp.where(fat, 0, cnt)
    thin_tok = rows_tok[:, :, :THIN_W]
    H, S, Cn, full = merge_rows(
        thin_tok, thin_cnt, thin_levels, starts=starts, full_init=~fat,
        collect_tails=False,
    )
    blk = 1 << thin_levels
    head_end = jnp.repeat(S + Cn, blk, axis=1)  # [G, R]
    solo = (cnt > 0) & ~fat & (ends > head_end)
    Hw = jnp.concatenate(
        [H, jnp.zeros(H.shape[:2] + (W - THIN_W,), jnp.uint32)], axis=-1
    )
    tokW, stW, ctW, _ = merge_rows(
        Hw, Cn, wide_levels, starts=S, full_init=full
    )
    rw = tokW.shape[1]
    idxW = jnp.broadcast_to(jnp.arange(rw, dtype=jnp.int32), (g, rw))
    idxR = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32), (g, R))
    orderW = left_pack(idxW, ctW > 0)
    nW = jnp.broadcast_to(
        (ctW > 0).sum(axis=1)[:, None], (g, rw)
    ).astype(jnp.int32)
    metaW = jnp.stack([stW, ctW, orderW, nW], axis=1)  # [G,4,rw]
    order_s = left_pack(idxR, solo)
    order_f = left_pack(idxR, fat)
    n_s = jnp.broadcast_to(solo.sum(axis=1)[:, None], (g, R)).astype(jnp.int32)
    n_f = jnp.broadcast_to(fat.sum(axis=1)[:, None], (g, R)).astype(jnp.int32)
    meta2 = jnp.stack(
        [starts, cnt, order_s, order_f, n_s, n_f], axis=1
    )  # [G,6,R]
    stream = pl.pallas_call(
        functools.partial(_compact_hier_kernel, cap=cap),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 4, rw), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6, R), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rw, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, THIN_W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cap + W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, cap + W), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, 1, cap + W), jnp.uint32)
            for _ in range(_compact_banks() - 1)
        ],
        interpret=_interpret(),
    )(metaW, meta2, tokW, thin_tok, rows_tok)
    return stream[:, 0], totals


# ---------------------------------------------------------------------------
# Histograms: [G, cap] stream -> [64, 64] counts (one-hot outer product)
# ---------------------------------------------------------------------------


def _uint_token_extra(value):
    """Hybrid-uint split (token.h:24-48), arithmetic. value: u32 < 2^16."""
    vi = value.astype(jnp.int32)
    vf = jnp.maximum(vi, 16).astype(jnp.float32)
    n = jnp.frexp(vf)[1] - 1  # floor(log2), exact for ints < 2^24
    tok_big = (n << 2) + ((vi >> jnp.maximum(n - 2, 0)) & 3)
    tok = jnp.where(vi < 16, vi, tok_big)
    nbits = jnp.where(vi < 16, 0, n - 2)
    extra = jnp.where(vi < 16, 0, vi & ((1 << nbits.astype(jnp.uint32)) - 1))
    return tok, nbits, extra


def hist_base64(stream, totals, chunk_tokens=1 << 23):
    """Integer-exact [64, 64] histogram via bf16 one-hot outer product on the
    MXU. Counts are exact in the f32 accumulator only below 2^24, so the
    contraction is split along the group axis into chunks of < 2^23 token
    slots and accumulated as uint32 — exact (and therefore shard-invariant)
    at any image size, including 64MP+ noisy content where a single
    (base_ctx, token) bucket exceeds 16.7M. Order-invariant integer sum
    => byte-identical entropy codes under any group sharding. (A round-4
    Pallas variant that kept the one-hots in VMEM measured ~4.3 vs ~0-2 ms
    in whole-program context — XLA already fuses the one-hot construction
    into the dot here — and was deleted; tools/artifacts/profile_r04.md.)"""
    g, cap = stream.shape
    valid = jnp.arange(cap)[None, :] < totals[:, None]
    base = (stream >> 16).astype(jnp.int32) & 63
    tok, _, _ = _uint_token_extra(stream & 0xFFFF)
    ar = jnp.arange(NUM_BASE_CTXS)
    gch = max(1, chunk_tokens // cap)
    hist = jnp.zeros((NUM_BASE_CTXS, NUM_BASE_CTXS), jnp.uint32)
    for i in range(0, g, gch):
        a = (
            (base[i : i + gch, :, None] == ar) & valid[i : i + gch, :, None]
        ).astype(jnp.bfloat16)
        b = (tok[i : i + gch, :, None] == ar).astype(jnp.bfloat16)
        part = jnp.einsum(
            "gtc,gtk->ck", a, b, preferred_element_type=jnp.float32
        )
        hist = hist + part.astype(jnp.uint32)
    return hist


# ---------------------------------------------------------------------------
# Per-token bit patterns via one-hot bilinear table lookup
# ---------------------------------------------------------------------------


def table_lookup_packed(base, tok, d_table):
    """Factored (base ctx, token) -> depth*65536 + code bits lookup.

    d_table: [9, 64] f32 (row 0: ctx->cluster map with values < 8; rows
    1..8: per-cluster entries, exact in f32 < 2^21) or [G, 9, 64] for
    per-group tables. base/tok: [G, T] i32. The cluster factoring keeps the
    big one-hot-matmul intermediate at [G, T, 8] instead of [G, T, 64] —
    an 8x smaller HBM footprint for the same exact result."""
    per_g = d_table.ndim == 3
    cmap = d_table[:, 0] if per_g else d_table[0]
    t8 = d_table[:, 1:] if per_g else d_table[1:]
    ar = jnp.arange(NUM_BASE_CTXS)
    a = (base[..., None] == ar).astype(jnp.bfloat16)  # [G, T, 64] (fused)
    # Cluster ids are < 8: exact at any matmul precision.
    cl = jnp.einsum(
        "gtc,gc->gt" if per_g else "gtc,c->gt", a,
        cmap.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    b = (tok[..., None] == ar).astype(jnp.bfloat16)
    # Entries reach 2^21 — beyond bf16's 8 mantissa bits (a single bf16x1
    # pass measurably malformed streams in round 1), so the table rides in
    # three 8-bit chunks: ints <= 255 are bf16-exact, each product has a
    # one-hot factor, and accumulation is f32. Full-rate MXU instead of
    # the 6-pass HIGHEST f32 path.
    t8i = t8.astype(jnp.int32)
    ad = jnp.zeros(base.shape + (t8.shape[-2],), jnp.int32)  # [G, T, 8]
    for sh8 in (0, 8, 16):
        chunk = ((t8i >> sh8) & 0xFF).astype(jnp.bfloat16)
        part = jnp.einsum(
            "gtk,gjk->gtj" if per_g else "gtk,jk->gtj", b, chunk,
            preferred_element_type=jnp.float32,
        )
        ad = ad | (part.astype(jnp.int32) << sh8)
    sel = cl[..., None] == jnp.arange(t8.shape[-2])
    return jnp.where(sel, ad, 0).sum(axis=-1)


def token_data_bits(stream, totals, d_table):
    """stream: [G, cap] u32 (base64<<16|value); d_table: factored [9, 64]
    f32 code table (see table_lookup_packed), or [G, 9, 64] for per-group
    tables (batched multi-image encodes).

    Returns (data [G, cap] u32, nbits [G, cap] i32): the LSB-first bit
    pattern and length of each token (code bits then hybrid-uint extra bits,
    enc_entropy_code.h:34-42)."""
    g, cap = stream.shape
    valid = jnp.arange(cap)[None, :] < totals[:, None]
    base = (stream >> 16).astype(jnp.int32) & 63
    tok, nb_extra, extra = _uint_token_extra(stream & 0xFFFF)
    packed = table_lookup_packed(base, tok, d_table)  # depth<<16 | code bits
    depth = (packed >> 16).astype(jnp.uint32)
    code = (packed & 0xFFFF).astype(jnp.uint32)
    data = code | (extra.astype(jnp.uint32) << depth)
    nbits = (depth.astype(jnp.int32) + nb_extra) * valid
    return jnp.where(valid, data, 0), nbits


# ---------------------------------------------------------------------------
# Bit packing: (data, pos) -> section words, scalar SMEM kernel
# ---------------------------------------------------------------------------


def _pair_entries(data, nbits):
    """Merge adjacent (data, nbits<=28) tokens into (lo, hi, n<=56) 64-bit
    entries (vectorized pre-pass of the oct entry merge)."""
    n0 = nbits[:, 0::2].astype(jnp.uint32)
    d0 = data[:, 0::2]
    d1 = data[:, 1::2]
    lo = d0 | jnp.where(n0 < 32, d1 << n0, 0)
    hi = jnp.where(n0 == 0, 0, d1 >> (jnp.uint32(32) - jnp.minimum(n0, 31)))
    hi = jnp.where(n0 == 0, 0, jnp.where(n0 < 32, hi, d1))
    return lo, hi, nbits[:, 0::2] + nbits[:, 1::2]


def _merge_pairs(lo_a, hi_a, n_a, lo_b, hi_b, n_b):
    """Concatenate two <=56-bit (lo, hi) entries into a <=112-bit 4-word
    entry: entry b's bits start at offset n_a of entry a."""
    s = (n_a & 31).astype(jnp.uint32)
    c = n_a >> 5  # word carry: 0 or 1 (n_a <= 56)
    ish = (jnp.uint32(32) - s) & 31
    b0 = lo_b << s
    b1 = jnp.where(s == 0, hi_b, (lo_b >> ish) | (hi_b << s))
    b2 = jnp.where(s == 0, 0, hi_b >> ish)
    w0 = lo_a | jnp.where(c == 0, b0, 0)
    w1 = hi_a | jnp.where(c == 0, b1, b0)
    w2 = jnp.where(c == 0, b2, b1)
    w3 = jnp.where(c == 0, jnp.uint32(0), b2)
    return w0, w1, w2, w3, n_a + n_b


def _merge_quads(a, n_a, b, n_b):
    """Concatenate two <=112-bit 4-word entries (lists of 4 u32 arrays) into
    a <=224-bit 8-word entry: b's bits start at offset n_a of a."""
    s = (n_a & 31).astype(jnp.uint32)
    c = n_a >> 5  # word carry: 0..3 (n_a <= 112)
    ish = (jnp.uint32(32) - s) & 31
    z = s == 0
    # b shifted left by s bits within its own 5-word frame.
    v = [b[0] << s]
    for k in range(1, 4):
        v.append(jnp.where(z, b[k], (b[k - 1] >> ish) | (b[k] << s)))
    v.append(jnp.where(z, jnp.uint32(0), b[3] >> ish))
    out = []
    for j in range(8):
        w = a[j] if j < 4 else jnp.zeros_like(a[0])
        for ci in range(4):
            k = j - ci
            if 0 <= k <= 4:
                w = w | jnp.where(c == ci, v[k], 0)
        out.append(w)
    return out, n_a + n_b


def _merge_wide(a, n_a, b, n_b):
    """Concatenate two nw-word entries (lists of nw u32 arrays, <=28 bits
    per underlying token) into one 2*nw-word entry: b's bits start at
    offset n_a of a."""
    nw = len(a)
    s = (n_a & 31).astype(jnp.uint32)
    c = n_a >> 5  # word carry: 0..nw-1
    ish = (jnp.uint32(32) - s) & 31
    z = s == 0
    # b shifted left by s bits within its own (nw+1)-word frame.
    v = [b[0] << s]
    for k in range(1, nw):
        v.append(jnp.where(z, b[k], (b[k - 1] >> ish) | (b[k] << s)))
    v.append(jnp.where(z, jnp.uint32(0), b[nw - 1] >> ish))
    out = []
    for j in range(2 * nw):
        w = a[j] if j < nw else jnp.zeros_like(a[0])
        for ci in range(nw):
            k = j - ci
            if 0 <= k <= nw:
                w = w | jnp.where(c == ci, v[k], 0)
        out.append(w)
    return out, n_a + n_b


def _oct_words(data, nbits):
    """[G, E*8] tokens -> (list of 8 interleaved word arrays, n8 [G, E])."""
    lo, hi, n2 = _pair_entries(data, nbits)
    w0, w1, w2, w3, n4 = _merge_pairs(
        lo[:, 0::2], hi[:, 0::2], n2[:, 0::2],
        lo[:, 1::2], hi[:, 1::2], n2[:, 1::2],
    )
    quads = [w0, w1, w2, w3]
    return _merge_quads(
        [q[:, 0::2] for q in quads], n4[:, 0::2],
        [q[:, 1::2] for q in quads], n4[:, 1::2],
    )


def _oct_entries(data, nbits):
    """[G, E*8] tokens -> interleaved <=224-bit oct entries.

    Returns (qall [G, E, 8] u32 entry words, n8 [G, E] i32 total bits)."""
    oct_, n8 = _oct_words(data, nbits)
    return jnp.stack(oct_, axis=-1), n8


def _wide_entries(data, nbits, fan):
    """[G, E*fan] tokens -> interleaved <=fan*28-bit fan-token entries
    (fan a power of two >= 8).

    Returns (qall [G, E, fan] u32 entry words, n [G, E] i32 total bits)."""
    words, n = _oct_words(data, nbits)
    f = 8
    while f < fan:
        words, n = _merge_wide(
            [w[:, 0::2] for w in words], n[:, 0::2],
            [w[:, 1::2] for w in words], n[:, 1::2],
        )
        f *= 2
    return jnp.stack(words, axis=-1), n


def _emit_entry(qall_ref, base, p, n8, out_ref, ow, fan=8):
    """Scalar helper: OR one entry (`fan` words at qall_ref[base..]) into
    out_ref at bit position p, touching only the ceil((sh+n8)/32) words the
    entry overlaps (avg ~2-4 for typical token widths, vs fan+1 for a
    fixed window)."""
    w = jnp.minimum(p >> 5, ow - (fan + 1))
    sh = (p & 31).astype(jnp.uint32)
    ish = (jnp.uint32(32) - sh) & 31
    z = sh == 0
    nw = jnp.where(n8 > 0, ((p & 31) + n8 + 31) >> 5, 0)

    def wbody(j, prev):
        qj = qall_ref[0, 0, base + j]
        m = jax.lax.select(z, qj, (prev >> ish) | (qj << sh))
        out_ref[0, 0, w + j] = out_ref[0, 0, w + j] | m
        return qj

    jax.lax.fori_loop(0, nw, wbody, jnp.uint32(0))


def _bitpack_var_kernel(
    zw_ref, bound_ref, order_ref, qall_ref, pos_ref, n8_ref, out_ref, *,
    ow, ch, fan
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        # Zero only the words this section can touch (its bit length is
        # known up front) — sections average ~1/10 of the ow capacity.
        # 8 stores per iteration amortize the scalar-loop overhead; a
        # scalar tail covers the remainder.
        zw = zw_ref[0, 0, 0]
        nb8 = zw >> 3

        def zbody(i, _):
            for j in range(8):
                out_ref[0, 0, i * 8 + j] = jnp.uint32(0)
            return 0

        jax.lax.fori_loop(0, nb8, zbody, 0)

        def ztail(i, _):
            out_ref[0, 0, i] = jnp.uint32(0)
            return 0

        jax.lax.fori_loop(nb8 * 8, zw, ztail, 0)

    n = bound_ref[0, 0, c]

    def body(i, _):
        t = order_ref[0, 0, i]  # nonzero entries, front-sorted per chunk
        _emit_entry(
            qall_ref, t * fan, pos_ref[0, 0, t], n8_ref[0, 0, t], out_ref,
            ow, fan,
        )
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _pick_chunk(nent, fan, budget_words=16384):
    """Largest 128-multiple divisor of `nent` whose qall SMEM block fits
    the budget — fewer chunks means fewer output-block HBM<->SMEM round
    trips (measured dominant: an empty 97-chunk DC pack cost 15 ms of pure
    block traffic). Lane-dim blocks must be 128-multiples (Mosaic tiling)
    unless they span the whole array (nent <= budget: one chunk)."""
    top = budget_words // fan
    if nent <= top:
        return nent
    for ch in range(top - top % 128, 0, -128):
        if nent % ch == 0:
            return ch
    raise ValueError(f"no 128-multiple chunk divides {nent}")


VAR_FAN = 32  # default entry fan of bitpack_groups_var


def var_safe_words(ow, fan=VAR_FAN):
    """Largest section word count bitpack_groups_var packs correctly at this
    ow. _emit_entry clamps entry start words to ow-(fan+1); an entry whose
    true start word exceeds that is silently mis-placed, so callers must
    compare ceil(bits/32) against THIS (not ow) and retry with a larger ow
    — `_next_bucket(buckets, ceil(bits/32) + fan + 1)` is strictly larger
    than the current ow whenever the check fails."""
    return ow - (fan + 1)


def bitpack_groups_var(data, nbits, pos, ow, ch=None, fan=VAR_FAN, sparse=True):
    """Variable-window entry packer: `fan` (power of two >= 8) adjacent
    tokens fuse into one <=fan*28-bit entry (vectorized log-merge tree);
    the scalar loop then writes only the words each entry actually
    overlaps. The loop-iteration floor (~30 ns) dominates per-entry cost,
    so wider entries nearly halve kernel time per doubling until the
    merge tree's select chains catch up (measured optimum: fan=32).

    data/nbits/pos: [G, cap] per-token bit patterns, widths (<=28), and
    absolute bit positions (width-0 entries are no-ops); cap % (fan*ch)
    == 0. Returns packed words [G, ow] u32.

    The scalar loop visits only nonzero-width entries, through per-chunk
    front-sorted index lists — sparse layouts (the DC sections' structural
    PAD runs, partial-image edges) skip their dead regions entirely."""
    g, cap = data.shape
    assert cap % fan == 0
    if ch is None:
        ch = _pick_chunk(cap // fan, fan)
    assert cap % (fan * ch) == 0
    # Build entries on a well-tiled 2D view (entries never straddle the
    # fan*ch chunk boundary, so re-rowing per chunk is bit-exact); long
    # [G, ~400k] rows waste most sublanes and slow every strided slice.
    nch_rows = cap // (fan * ch)
    d2 = data.reshape(g * nch_rows, fan * ch)
    n2 = nbits.reshape(g * nch_rows, fan * ch)
    qall, nent = _wide_entries(d2, n2, fan)
    qall = qall.reshape(g, cap // fan, fan)
    nent = nent.reshape(g, cap // fan)
    posf = pos[:, 0::fan]
    nch = (cap // fan) // ch
    nz = (nent > 0).reshape(g, nch, ch)
    slot = jnp.arange(ch, dtype=jnp.int32)[None, None, :]
    if sparse:
        # Front-sorted nonzero-entry index list: sparse layouts skip their
        # dead regions entirely.
        order = jnp.argsort(~nz, axis=2, stable=True).astype(jnp.int32)
        cnt = nz.sum(axis=2).astype(jnp.int32)
    else:
        # Dense streams: iterate [0, last-nonzero] directly.
        order = jnp.broadcast_to(slot, (g, nch, ch))
        cnt = (nz * (slot + 1)).max(axis=2).astype(jnp.int32)
    bits = (pos[:, -1] + nbits[:, -1]).astype(jnp.int32)
    zw = jnp.minimum(((bits + 31) >> 5) + 1, ow)
    out = pl.pallas_call(
        functools.partial(_bitpack_var_kernel, ow=ow, ch=ch, fan=fan),
        grid=(g, nch),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nch), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ch), lambda i, c: (i, 0, c), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ch * fan), lambda i, c: (i, 0, c), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ch), lambda i, c: (i, 0, c), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ch), lambda i, c: (i, 0, c), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ow), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, ow), jnp.uint32),
        interpret=_interpret(),
    )(
        zw[:, None, None],
        cnt[:, None, :],
        order.reshape(g, 1, -1),
        qall.reshape(g, 1, -1),
        posf[:, None, :].astype(jnp.int32),
        nent[:, None, :].astype(jnp.int32),
    )
    return out[:, 0]




# ---------------------------------------------------------------------------
# Section word-compaction: [G, ow] -> one aligned buffer
# ---------------------------------------------------------------------------


def _sections_kernel(meta_ref, packed_ref, out_ref, *, ow, wcap):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    off = meta_ref[0, 0, 0]  # 128-aligned destination word offset
    nblk = meta_ref[0, 0, 1]  # number of 128-word blocks to copy

    def body(i, _):
        src = packed_ref[0, 0, pl.ds(i * W, W)]
        dst = jnp.minimum(off + i * W, wcap - W)
        dst = pl.multiple_of(dst, W)
        out_ref[0, pl.ds(dst, W)] = src
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)


def compact_sections(packed, bits, wcap):
    """packed: [G, ow] u32; bits: [G] i32 section bit lengths.

    Lays each group's ceil(bits/32) words at a 128-word-aligned offset in one
    [wcap] buffer. Returns (buffer [wcap] u32, word_offsets [G] i32)."""
    g, ow = packed.shape
    nblk = (bits + (32 * W - 1)) // (32 * W)  # 128-word blocks per group
    ends = jnp.cumsum(nblk * W)
    offs = (ends - nblk * W).astype(jnp.int32)
    meta = jnp.stack([offs, nblk.astype(jnp.int32)], axis=1)[:, None, :]  # [G,1,2]
    buf = pl.pallas_call(
        functools.partial(_sections_kernel, ow=ow, wcap=wcap),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ow), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wcap), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, wcap), jnp.uint32),
        interpret=_interpret(),
    )(meta, packed[:, None, :])
    return buf[0], offs


# ---------------------------------------------------------------------------
# Word-parallel bit packing: segmented OR-scan over words
# ---------------------------------------------------------------------------


def bitpack_groups_words(data, nbits, pos, ow, prefix_valid=True):
    """Vector bit packer: data/nbits/pos [G, cap] per-token LSB-first bit
    patterns (nbits <= 28 < 32), widths, absolute bit positions (invalid
    tokens: nbits 0). Returns packed words [G, ow] u32 (zero beyond the
    section's words).

    prefix_valid=True: valid tokens form a contiguous prefix per group
    (AC streams) — zero-width tokens take a sentinel key and the OR-scan
    runs 6 doubling passes (word segments are <= 32 contiguous tokens).
    prefix_valid=False: zero-width tokens may interleave anywhere (the DC
    layout's structural PAD runs) — they share the following word's key
    (their position equals the next token's) and the scan doubles to the
    full token axis, ceil(log2(cap)) passes.

    Replaces the scalar entry loop of bitpack_groups_var for dense token
    streams with O(log) vector passes. Because every token is narrower
    than a word, every output word contains at least one token *start*,
    so per-word values emerge from a segmented OR-scan keyed by start
    word (segments are <= 32 contiguous tokens):

      lo[t]  = token bits within its start word; hi[t] = spill into the
               next word (tokens span <= 2 words at nbits <= 28)
      inc[t] = hi of the previous token, at each first-token-of-word
      v      = seg-OR-scan(lo | inc)  -- 6 doubling passes
      word w = v at the last token of w's segment

    The per-word values are then left-packed within each 128-token row by
    log-shift stable compaction (each survivor moves left by its count of
    preceding holes, decomposed over the bits of that distance — 7
    select/shift passes) and placed into the dense per-group word stream
    by compact_stream — the same merge+place machinery as the token
    stream, at ~1/6 the element count (one word per ~6 tokens)."""
    g, cap = data.shape
    assert cap % 128 == 0
    nbits = nbits.astype(jnp.int32)
    valid = nbits > 0
    pos = pos.astype(jnp.int32)
    sh = (pos & 31).astype(jnp.uint32)
    lo = jnp.where(valid, data << sh, jnp.uint32(0))
    hi = jnp.where(
        valid & (sh > 0),
        data >> ((jnp.uint32(32) - sh) & 31),
        jnp.uint32(0),
    )
    if prefix_valid:
        # Invalid (tail) tokens take a sentinel key so the last real
        # word's segment stays <= 32 contiguous tokens long.
        w0 = jnp.where(valid, pos >> 5, jnp.int32(1 << 30))
        doublings = (1, 2, 4, 8, 16, 32)
    else:
        # Interleaved zero-width tokens share the following token's word
        # (their pos does not advance); segments stay index-contiguous
        # but can be arbitrarily long — double across the whole axis.
        w0 = pos >> 5
        doublings = tuple(
            1 << b for b in range(int(np.ceil(np.log2(max(cap, 2)))))
        )

    def sh_r(a, d, fill):  # bring index t-d to t along the token axis
        return jnp.concatenate(
            [jnp.full_like(a[:, :d], fill), a[:, :-d]], axis=1
        )

    first = w0 != sh_r(w0, 1, -1)
    v = lo | jnp.where(first, sh_r(hi, 1, 0), jnp.uint32(0))
    for d in doublings:
        same = w0 == sh_r(w0, d, -7)
        v = jnp.where(same, v | sh_r(v, d, 0), v)
    # Last-token-of-word mask (zero-width tokens never qualify: with a
    # prefix they hold the sentinel key; interleaved they share the key
    # of the FOLLOWING token, so the inequality fires only at real ends
    # or at trailing pads whose zero value is harmless).
    nxt = jnp.concatenate(
        [w0[:, 1:], jnp.full_like(w0[:, :1], -9)], axis=1
    )
    e = (valid & (w0 != nxt)) if prefix_valid else (w0 != nxt)
    # The stream's very last token may spill into a word that contains no
    # token start (mid-stream the next start always covers the spill
    # word); it is patched onto the placed stream at the end.
    idxs = jnp.arange(cap, dtype=jnp.int32)[None, :]
    last_idx = jnp.max(jnp.where(valid, idxs, -1), axis=1)
    islast = valid & (idxs == last_idx[:, None])
    spills = islast & (((pos & 31) + nbits) > 32)
    spill_v = jnp.where(spills, hi, jnp.uint32(0)).max(axis=1)  # <=1 hot

    rows = cap // 128
    er = e.reshape(g, rows, 128)
    vr = jnp.where(e, v, jnp.uint32(0)).reshape(g, rows, 128)
    # Left-pack the emitted words within each 128-lane row (log-shift
    # stable compaction, see left_pack). Replaces a [G, rows, 128, 128]
    # one-hot matmul whose operand alone was ~1.1 GB of HBM traffic per
    # byte plane on the 8MP image (~5 of program B's ~7 ms, round-4
    # profile_b trace).
    words_rows = left_pack(vr, er)
    counts = er.sum(axis=-1).astype(jnp.int32)
    # Pad the row axis to a multiple of 16 (zero-count rows are no-ops).
    # This caps merge_rows at 4 of its default 6 levels for this caller —
    # intentional: word rows carry ~21 words each, so pair-merges stop
    # fitting W=128 by level 3-4 and deeper levels would merge nothing.
    padr = (-rows) % 16
    if padr:
        words_rows = jnp.concatenate(
            [words_rows, jnp.zeros((g, padr, 128), jnp.uint32)], axis=1
        )
        counts = jnp.concatenate(
            [counts, jnp.zeros((g, padr), jnp.int32)], axis=1
        )
    words, wtotals = compact_stream(words_rows, counts, ow)
    words = words[:, :ow]
    # OR the final spill into the stream's last word (it is the word right
    # after the last start word, at index wtotals).
    gi = jnp.arange(g)
    wi = jnp.minimum(wtotals, ow - 1)
    patched = words[gi, wi] | spill_v
    return words.at[gi, wi].set(jnp.where(spill_v > 0, patched, words[gi, wi]))


# ---------------------------------------------------------------------------
# Program B: stream + code tables -> section bytes
# ---------------------------------------------------------------------------


def _pack_ac_impl(stream, totals, d_table, ow, wcap, compact=True):
    data, nbits = token_data_bits(stream, totals, d_table)
    ends = jnp.cumsum(nbits, axis=1)
    pos = ends - nbits
    bits = ends[:, -1].astype(jnp.int32)
    packed = bitpack_groups_words(data, nbits, pos, ow)
    if not compact:
        # Overflow fallback: total section words exceed the single [wcap]
        # compaction buffer (VMEM-bounded). Return the padded per-group
        # rows instead; the host slices each row (capacity-safe at any
        # image size, at the cost of a padded download).
        return dict(words=packed, bits=bits, word_offs=jnp.zeros_like(bits))
    words, offs = compact_sections(packed, bits, wcap)
    return dict(words=words, bits=bits, word_offs=offs)


@functools.partial(jax.jit, static_argnames=("ow", "wcap", "compact"))
def pack_ac_sections(stream, totals, d_table, ow, wcap, compact=True):
    """Device program B. stream: [G, cap(+128)] u32 resident tokens;
    d_table: [64, 64] f32 (depth<<16|bits, composed with final clustering).

    Returns dict(words [wcap] u32 (or [G, ow] when compact=False),
    bits [G] i32, word_offs [G] i32)."""
    return _pack_ac_impl(stream, totals, d_table, ow, wcap, compact)


def rows_from_tokens(tokens_full, count_full):
    """[G,3,32,32,128] (channel-major) -> emission rows [G, ROWS, 128].

    Emission order (enc_group.cc:340,448): raster over cells, channels
    Y, X, B within a cell."""
    g = tokens_full.shape[0]
    chan = jnp.array([1, 0, 2])
    rows_tok = tokens_full[:, chan].transpose(0, 2, 3, 1, 4).reshape(g, ROWS, W)
    rows_cnt = count_full[:, chan].transpose(0, 2, 3, 1).reshape(g, ROWS)
    return rows_tok, rows_cnt
