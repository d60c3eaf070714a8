"""Device-side DC-group section building (DC tokens + AC metadata).

Mirrors WriteDCGroup (enc_frame.cc:536-570): per DC group, the section is
  header bits | DC tokens (clamped-gradient-predicted, channels Y,X,B)
  | nonzero-count bits | ytox/ytob gradient tokens | AC-strategy tokens
  | quant-field delta tokens | EPF tokens
The reference emits these serially on the host; here the whole section is a
*fixed flat layout* of u32 entries per DC group — real tokens, raw-bit
entries, and zero-width padding — so no compaction pass is needed: the
word-parallel bit packer (pack_kernels.bitpack_groups_words) skips nbits=0
slots by construction, and raw header bits are just literal (data, nbits)
entries.
Prediction contexts are computed vectorized: the reference's sequential
raster scans depend only on *original* neighbor values (enc_frame.cc:296-303,
340-408), so gradients are shifted-neighbor arithmetic and the
"previous first cell" contexts are an exclusive running-max + gather.

Entry encoding in the layout word (u32 = tag<<16 | value):
  tag < 45          token: DC/meta context id, value = token value
  tag = 0x8000|n    raw bits: emit value as n literal bits
  tag = 0xFFFF      padding: zero width
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C

PD = 256  # DC-group plane dim in blocks (2048 px / 8)
RAW = 0x8000
PAD = 0xFFFF

# Fixed layout offsets (in u32 entries) per DC group.
_HDR = 2
_DC0 = _HDR
_DCN = 3 * PD * PD
_MID = _DC0 + _DCN
_CMAP0 = _MID + 2
_CMAPN = 2 * 32 * 32
_STRAT0 = _CMAP0 + _CMAPN
_QF0 = _STRAT0 + PD * PD
_EPF0 = _QF0 + PD * PD
LAYOUT = _EPF0 + PD * PD
DC_CAP = -(-LAYOUT // 4096) * 4096  # bitpack chunk multiple (fan*ch = 8*512)


def _grad_step_tables():
    """GRADIENT_CTX_LUT (enc_frame.cc:224-285) as two step functions of the
    clamped gradient distance — arbitrary piecewise-constant LUTs evaluate as
    a base value plus threshold-gated deltas (gather-free on TPU)."""
    lut = C.GRADIENT_CTX_LUT.astype(np.int64)

    def steps(side):  # side=+1: lut[512+d], side=-1: lut[512-d]
        vals = [int(lut[512 + side * d]) for d in range(0, 512)]
        ths, dls = [], []
        for d in range(1, 512):
            if vals[d] != vals[d - 1]:
                ths.append(d)
                dls.append(vals[d] - vals[d - 1])
        return np.array(ths, np.int32), np.array(dls, np.int32), vals[0]

    return steps(+1), steps(-1)


(_POS_T, _POS_D, _BASE0), (_NEG_T, _NEG_D, _) = _grad_step_tables()


def gradient_ctx(grad):
    """grad: int array -> DC gradient context ids (no gathers)."""
    d = jnp.clip(grad, -512, 511)
    pos = jnp.maximum(d, 0)
    neg = jnp.maximum(-d, 0)
    ctx = jnp.full(d.shape, _BASE0, jnp.int32)
    for t, dl in zip(_POS_T.tolist(), _POS_D.tolist()):
        ctx = ctx + jnp.where(pos >= t, dl, 0)
    for t, dl in zip(_NEG_T.tolist(), _NEG_D.tolist()):
        ctx = ctx + jnp.where(neg >= t, dl, 0)
    return ctx


def _pack_signed(v):
    v = v.astype(jnp.int32)
    return jnp.where(v >= 0, 2 * v, -2 * v - 1).astype(jnp.uint32)


def _shift0(a, d, axis):
    z = jnp.zeros_like(a)
    take = [slice(None)] * a.ndim
    zs = [slice(None)] * a.ndim
    if d > 0:
        take[axis] = slice(d, None)
        zs[axis] = slice(0, d)
        return jnp.concatenate([a[tuple(take)], z[tuple(zs)]], axis=axis)
    take[axis] = slice(None, d)
    zs[axis] = slice(0, -d)
    return jnp.concatenate([z[tuple(zs)], a[tuple(take)]], axis=axis)


def gradient_tokens(plane, valid):
    """Vectorized _gradient_tokens (enc_frame.cc:287-316) on [Gd, H, W]
    planes. Returns (ctx, value) at every position; only `valid` positions
    are meaningful. Boundary rules: left of col 0 is the end of the previous
    row's col 0 chain (p[r-1, 0]); row 0 uses left as top/topleft."""
    p = plane.astype(jnp.int32)
    # Row/column-0 overrides via concatenate — .at[...].set on a border
    # lowers to stablehlo.scatter, which serializes on TPU (these five
    # gradient_tokens calls were 35 of build_dc_layout's 40 scatters and
    # most of its 3.2 ms in the round-4 trace).
    left = _shift0(p, -1, -1)
    col0 = _shift0(p[:, :, 0], -1, -1)
    left = jnp.concatenate([col0[:, :, None], left[:, :, 1:]], axis=2)
    top = _shift0(p, -1, -2)
    top = jnp.concatenate([left[:, :1, :], top[:, 1:, :]], axis=1)
    topleft = _shift0(left, -1, -2)
    topleft = jnp.concatenate([left[:, :1, :], topleft[:, 1:, :]], axis=1)
    topleft = jnp.concatenate([left[:, :, :1], topleft[:, :, 1:]], axis=2)
    grad = top + left - topleft
    mn = jnp.minimum(top, left)
    mx = jnp.maximum(top, left)
    guess = jnp.where(topleft < mn, mx, jnp.where(topleft > mx, mn, grad))
    ctx = gradient_ctx(grad)
    return ctx, _pack_signed(p - guess)


def regroup_dc(arr, ygr, xgr, trailing):
    """[G, (C,) t, t] per-group maps -> [Gd, (C,) 8t, 8t] DC-group planes.

    G = ygr*xgr groups in raster order with ygr/xgr multiples of 8 (callers
    pad with zero groups); t = 32 for block maps, 4 for cmap tile maps."""
    gy8, gx8 = ygr // 8, xgr // 8
    t = arr.shape[-1]
    if trailing:  # [G, C, t, t]
        c = arr.shape[1]
        a = arr.reshape(gy8, 8, gx8, 8, c, t, t)
        a = a.transpose(0, 2, 4, 1, 5, 3, 6)
        return a.reshape(gy8 * gx8, c, 8 * t, 8 * t)
    a = arr.reshape(gy8, 8, gx8, 8, t, t)
    a = a.transpose(0, 2, 1, 4, 3, 5)
    return a.reshape(gy8 * gx8, 8 * t, 8 * t)


def _prev_first_scan(first_flat, values_flat, init):
    """prev[i] = values at the last first-cell strictly before i (raster);
    init where none. first_flat: [Gd, N] bool; values_flat: [Gd, N].

    Select-doubling propagation — XLA:TPU gathers (take_along_axis) run
    near one element/cycle and cost ~ms at this size; log2(N) masked
    shifts are bandwidth-bound instead."""
    n = first_flat.shape[1]
    v = jnp.where(first_flat, values_flat, 0)
    f = first_flat
    # Exclusive: start from the previous position.
    v = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
    f = jnp.concatenate([jnp.zeros_like(f[:, :1]), f[:, :-1]], axis=1)
    d = 1
    while d < n:
        vs = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
        fs = jnp.concatenate([jnp.zeros_like(f[:, :d]), f[:, :-d]], axis=1)
        v = jnp.where(f, v, vs)
        f = f | fs
        d <<= 1
    return jnp.where(f, v, init)


def build_dc_layout(quant_dc, raw_qf, strategy, is_first, ytox, ytob,
                    ydb, xdb, ty, tx, nb_blocks):
    """Per-DC-group section entry layout [Gd, DC_CAP] u32.

    quant_dc: [Gd,3,PD,PD] i32 (X,Y,B); raw_qf/strategy/is_first: [Gd,PD,PD];
    ytox/ytob: [Gd,32,32] i32; ydb/xdb: [Gd] valid block dims; ty/tx: [Gd]
    valid cmap tile dims; nb_blocks: [Gd] ceil_log2(ydb*xdb) bit width."""
    gd = quant_dc.shape[0]
    by = jnp.arange(PD)[None, :, None]
    bx = jnp.arange(PD)[None, None, :]
    valid = (by < ydb[:, None, None]) & (bx < xdb[:, None, None])

    def entries(ctx, val, ok):
        w = (ctx.astype(jnp.uint32) << 16) | (val & 0xFFFF)
        return jnp.where(ok, w, jnp.uint32(PAD) << 16).reshape(gd, -1)

    parts = []
    hdr = jnp.tile(
        jnp.array(
            [((RAW | 2) << 16) | 0, ((RAW | 4) << 16) | 3], jnp.uint32
        )[None],
        (gd, 1),
    )
    parts.append(hdr)
    # DC tokens, channel order Y, X, B (enc_frame.cc:292).
    for ch in (1, 0, 2):
        ctx, val = gradient_tokens(quant_dc[:, ch], valid)
        parts.append(entries(ctx, val, valid))
    # Mid header: num_ac_blocks-1 in nb_blocks bits, then (4,3).
    num_ac = (is_first & valid).sum(axis=(1, 2)).astype(jnp.uint32)
    mid0 = (((RAW | nb_blocks).astype(jnp.uint32)) << 16) | (
        (num_ac - 1) & 0xFFFF
    )
    mid0 = jnp.where(nb_blocks > 0, mid0, jnp.uint32(PAD) << 16)
    mid1 = jnp.full((gd,), ((RAW | 4) << 16) | 3, jnp.uint32)
    parts.append(jnp.stack([mid0, mid1], axis=1))
    # Cmap maps: ytox (ctx 2), ytob (ctx 1), gradient predicted.
    tyv = jnp.arange(32)[None, :, None]
    txv = jnp.arange(32)[None, None, :]
    cvalid = (tyv < ty[:, None, None]) & (txv < tx[:, None, None])
    for cm, cc in ((ytox, 2), (ytob, 1)):
        _, val = gradient_tokens(cm, cvalid)
        parts.append(entries(jnp.full_like(val, cc, jnp.int32), val, cvalid))
    # AC strategy tokens at first cells; ctx from previous first cell's code.
    # STRATEGY_CODE = [0, 6, 7]; a where-chain avoids the LUT gather.
    codes = jnp.where(
        strategy == 0, 0, jnp.where(strategy == 1, 6, 7)
    )  # [Gd,PD,PD]
    firstv = (is_first & valid).reshape(gd, -1)
    codes_f = codes.reshape(gd, -1)
    prev = _prev_first_scan(firstv, codes_f, 0)
    sctx = jnp.where(prev > 11, 7, jnp.where(prev > 5, 8, jnp.where(prev > 3, 9, 10)))
    parts.append(entries(sctx.reshape(gd, PD, PD), _pack_signed(codes), firstv.reshape(gd, PD, PD)))
    # Quant field tokens: delta vs previous first cell's value, ctx from it.
    cur = raw_qf.astype(jnp.int32) - 1
    left0 = codes_f[:, :1]  # enc_frame.cc:392: prev seeds from strategy code
    prevq = _prev_first_scan(firstv, cur.reshape(gd, -1), 0)
    isf_before = jnp.cumsum(firstv.astype(jnp.int32), axis=1) - firstv
    prevq = jnp.where(isf_before > 0, prevq, left0)
    qctx = jnp.where(prevq > 11, 3, jnp.where(prevq > 5, 4, jnp.where(prevq > 3, 5, 6)))
    qval = _pack_signed(cur.reshape(gd, -1) - prevq)
    parts.append(entries(qctx.reshape(gd, PD, PD), qval.reshape(gd, PD, PD), firstv.reshape(gd, PD, PD)))
    # EPF: one token per valid block, ctx 0, PackSigned(4) == 8.
    parts.append(
        entries(jnp.zeros((gd, PD, PD), jnp.int32), jnp.full((gd, PD, PD), 8, jnp.uint32), valid)
    )
    layout = jnp.concatenate(parts, axis=1)
    pad = DC_CAP - layout.shape[1]
    layout = jnp.pad(layout, ((0, 0), (0, pad)), constant_values=np.uint32(PAD) << 16)
    return layout


def dc_hist(layout):
    """[Gd, DC_CAP] layout -> [64, 64] histogram over DC contexts (rows >= 45
    stay zero; raw/pad entries excluded)."""
    from .pack_kernels import _uint_token_extra

    # Histograms are shape-invariant; [Gd, ~400k] tiles poorly (few used
    # sublanes, huge lane dim) and ran 10x slower per token than the AC
    # stream's — reshape to a well-tiled 2D form first.
    layout = layout.reshape(-1, 4096)
    tag = (layout >> 16).astype(jnp.int32)
    is_tok = tag < 45
    tok, _, _ = _uint_token_extra(layout & 0xFFFF)
    ar = jnp.arange(64)
    # Chunked u32 accumulation: f32 counts are exact only below 2^24 (see
    # pack_kernels.hist_base64); each chunk covers < 2^23 entries.
    rows = layout.shape[0]
    rch = max(1, (1 << 23) // 4096)
    h = jnp.zeros((64, 64), jnp.uint32)
    for i in range(0, rows, rch):
        a = (
            (tag[i : i + rch, :, None] == ar) & is_tok[i : i + rch, :, None]
        ).astype(jnp.bfloat16)
        b = (tok[i : i + rch, :, None] == ar).astype(jnp.bfloat16)
        part = jnp.einsum(
            "gtc,gtk->ck", a, b, preferred_element_type=jnp.float32
        )
        h = h + part.astype(jnp.uint32)
    return h


def dc_token_data_bits(layout, d_table):
    """Layout entries -> (data, nbits) for the bit-pack kernel.

    d_table: factored [9, 64] f32 DC code table (context-map row + 8
    per-cluster depth*65536+bits rows; see pack_kernels.table_lookup_packed;
    contexts >= 45 unused)."""
    from .pack_kernels import _uint_token_extra, table_lookup_packed

    tag = (layout >> 16).astype(jnp.int32)
    value = layout & 0xFFFF
    is_raw = (tag & RAW) != 0
    is_pad = tag == PAD
    tok, nb_extra, extra = _uint_token_extra(value)
    base = jnp.clip(tag, 0, 63)
    packed = table_lookup_packed(base, tok, d_table)
    depth = (packed >> 16).astype(jnp.uint32)
    code = (packed & 0xFFFF).astype(jnp.uint32)
    data = code | (extra.astype(jnp.uint32) << depth)
    nbits = depth.astype(jnp.int32) + nb_extra
    data = jnp.where(is_raw, value, data)
    nbits = jnp.where(is_raw, tag & 0xFF, nbits)
    data = jnp.where(is_pad, 0, data)
    nbits = jnp.where(is_pad, 0, nbits)
    return data, nbits


def _pack_dc_impl(layout, d_table, ow, wcap, compact=True):
    from .pack_kernels import bitpack_groups_words, compact_sections

    g, cap = layout.shape
    # Token bit patterns on a well-tiled 2D view, and a two-level cumsum
    # (intra-row + row offsets) — both shape-exact; a direct op on the
    # [Gd, ~400k] layout wastes most sublanes (see dc_hist). Per-group
    # tables (batched multi-image encodes) key the lookup by the group
    # axis, so only the shared-table case may re-row.
    lay2 = layout if d_table.ndim == 3 else layout.reshape(-1, 4096)
    data, nbits = dc_token_data_bits(lay2, d_table)
    data = data.reshape(g, cap)
    nbits3 = nbits.reshape(g, cap // 4096, 4096)
    intra = jnp.cumsum(nbits3, axis=2)
    rowtot = intra[:, :, -1]
    offs_r = jnp.cumsum(rowtot, axis=1) - rowtot
    ends = (intra + offs_r[:, :, None]).reshape(g, cap)
    nbits = nbits.reshape(g, cap)
    pos = ends - nbits
    bits = ends[:, -1].astype(jnp.int32)
    packed = bitpack_groups_words(data, nbits, pos, ow, prefix_valid=False)
    if not compact:
        # Overflow fallback — see pack_kernels._pack_ac_impl.
        return dict(words=packed, bits=bits, word_offs=jnp.zeros_like(bits))
    words, offs = compact_sections(packed, bits, wcap)
    return dict(words=words, bits=bits, word_offs=offs)


@functools.partial(jax.jit, static_argnames=("ow", "wcap", "compact"))
def pack_dc_sections(layout, d_table, ow, wcap, compact=True):
    """Device program B for DC sections: layout + code table -> section
    words (same bitpack + word-compaction kernels as the AC path)."""
    return _pack_dc_impl(layout, d_table, ow, wcap, compact)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ow_ac", "wcap_ac", "ow_dc", "wcap_dc", "compact_ac", "compact_dc"
    ),
)
def pack_all_sections(
    stream, totals, d_ac, layout, d_dc, ow_ac, wcap_ac, ow_dc, wcap_dc,
    compact_ac=True, compact_dc=True,
):
    """Single program B: AC + DC section packing in one dispatch (one
    device roundtrip on high-latency links)."""
    from .pack_kernels import _pack_ac_impl

    ac = _pack_ac_impl(stream, totals, d_ac, ow_ac, wcap_ac, compact_ac)
    dc = _pack_dc_impl(layout, d_dc, ow_dc, wcap_dc, compact_dc)
    return dict(
        ac_words=ac["words"], ac_bits=ac["bits"], ac_offs=ac["word_offs"],
        dc_words=dc["words"], dc_bits=dc["bits"], dc_offs=dc["word_offs"],
        # One-transfer form of the four small vectors (links with per-
        # transfer latency fetch this instead of four arrays).
        small=jnp.concatenate(
            [ac["bits"], ac["word_offs"], dc["bits"], dc["word_offs"]]
        ),
    )


def select_code_table(hist64, depths_k):
    """Pick the cheapest candidate code table on device (compute-all-select).

    hist64: [64, 64] u32 token histogram; depths_k: [K, 64, 64] i32
    per-candidate (ctx, token) -> emission depth grids. Exact integer
    arithmetic, so the argmin is deterministic and identical on every shard
    of a mesh. The cost is split into (hist>>4) and (hist&15) partial sums
    — shifted in the u32 domain, so single bins up to 2^32-1 stay exact —
    and i32 never overflows up to ~2.2e9 total tokens (depths <= 15; the
    low partial is bounded by bins, 15*15*4096 < 2^20, and the argmin of
    16*(hi - hi.min()) + lo equals the argmin of the true cost)."""
    h = hist64.astype(jnp.uint32)
    hi = ((h >> 4).astype(jnp.int32)[None] * depths_k).sum(axis=(1, 2))
    lo = ((h & 15).astype(jnp.int32)[None] * depths_k).sum(axis=(1, 2))
    # Saturate the relative hi part at 2^30: exact whenever a candidate is
    # within ~67M tokens-of-depth above the best (always, in practice);
    # beyond that both contenders are far from the argmin anyway.
    rel = jnp.minimum(hi - hi.min(), (1 << 30) // 16)
    return jnp.argmin(16 * rel + lo).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance",
        "inv_scale",
        "scale",
        "scale_dc",
        "x_qm_mul",
        "cap",
        "cfl",
        "blocks",
        "ow_ac",
        "wcap_ac",
        "ow_dc",
        "wcap_dc",
        "compact_ac",
        "compact_dc",
    ),
)
def analyze_pack_static(
    image,
    yb_valid,
    xb_valid,
    d_ac,
    d_dc,
    ac_depths,
    dc_depths,
    distance,
    inv_scale,
    scale,
    scale_dc,
    x_qm_mul,
    cap,
    cfl,
    blocks,
    ow_ac,
    wcap_ac,
    ow_dc,
    wcap_dc,
    compact_ac=True,
    compact_dc=True,
):
    """One-pass tier: the whole encode (analysis + section packing with
    static code tables) as a single device program and roundtrip — the
    reference's OPTIMIZE_CODE=0 design (no histogram pass to the host,
    static_entropy_codes.h role). d_ac / d_dc hold K candidate tables
    [K, 9, 64] each; the device picks the cheapest per image from the
    histograms it already computes (select_code_table) and reports the
    picks as the last two elements of `small` ([..., totals, k_ac, k_dc])
    so the host serializes the same tables into ACGlobal / DCGlobal."""
    from .pipeline_jax import analyze_image_packed

    a = analyze_image_packed(
        image, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc,
        x_qm_mul, cap, cfl, blocks,
    )
    k_ac = select_code_table(a["hists"][0], ac_depths)
    k_dc = select_code_table(a["hists"][1], dc_depths)
    b = pack_all_sections(
        a["stream"][:, :cap], a["totals"], jnp.take(d_ac, k_ac, axis=0),
        a["dc_layout"], jnp.take(d_dc, k_dc, axis=0),
        ow_ac=ow_ac, wcap_ac=wcap_ac, ow_dc=ow_dc, wcap_dc=wcap_dc,
        compact_ac=compact_ac, compact_dc=compact_dc,
    )
    b["totals"] = a["totals"]
    b["small"] = jnp.concatenate(
        [b["small"], a["totals"].astype(jnp.int32), k_ac[None], k_dc[None]]
    )
    return b


@functools.partial(
    jax.jit,
    static_argnames=(
        "ow_ac", "wcap_ac", "ow_dc", "wcap_dc", "compact_ac", "compact_dc"
    ),
)
def pack_batch_sections(
    stream, totals, d_ac, layout, d_dc, ow_ac, wcap_ac, ow_dc, wcap_dc,
    compact_ac=True, compact_dc=True,
):
    """Batched program B: N images' sections in one dispatch. d_ac/d_dc are
    per-image factored tables [N, 9, 64]; stream holds N*G groups and layout N*Gd
    DC groups. All sections land in the two shared word buffers."""
    from .pack_kernels import _pack_ac_impl

    n = d_ac.shape[0]
    g_per = stream.shape[0] // n
    gd_per = layout.shape[0] // n
    d_ac_pg = jnp.repeat(d_ac, g_per, axis=0)
    d_dc_pg = jnp.repeat(d_dc, gd_per, axis=0)
    ac = _pack_ac_impl(stream, totals, d_ac_pg, ow_ac, wcap_ac, compact_ac)
    dc = _pack_dc_impl(layout, d_dc_pg, ow_dc, wcap_dc, compact_dc)
    return dict(
        ac_words=ac["words"], ac_bits=ac["bits"], ac_offs=ac["word_offs"],
        dc_words=dc["words"], dc_bits=dc["bits"], dc_offs=dc["word_offs"],
        small=jnp.concatenate(
            [ac["bits"], ac["word_offs"], dc["bits"], dc["word_offs"]]
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance",
        "inv_scale",
        "scale",
        "scale_dc",
        "x_qm_mul",
        "cap",
        "cfl",
        "blocks",
        "ow_ac",
        "wcap_ac",
        "ow_dc",
        "wcap_dc",
        "compact_ac",
        "compact_dc",
    ),
)
def analyze_pack_batch_static(
    images,
    yb_valid,
    xb_valid,
    d_ac,
    d_dc,
    ac_depths,
    dc_depths,
    distance,
    inv_scale,
    scale,
    scale_dc,
    x_qm_mul,
    cap,
    cfl,
    blocks,
    ow_ac,
    wcap_ac,
    ow_dc,
    wcap_dc,
    compact_ac=True,
    compact_dc=True,
):
    """One-pass tier for a batch: N same-sized images analyzed, candidate-
    selected, and section-packed in ONE device dispatch (the batch twin of
    analyze_pack_static). Each image picks its own cheapest AC/DC candidate
    tables from its per-image histograms (select_code_table vmapped over
    the image axis). `small` layout:
    [ac_bits, ac_offs, dc_bits, dc_offs, totals, k_ac[N], k_dc[N]]."""
    from .pipeline_jax import analyze_batch_packed

    a = analyze_batch_packed(
        images, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc,
        x_qm_mul, cap, cfl, blocks,
    )
    k_ac = jax.vmap(lambda h: select_code_table(h, ac_depths))(a["hists"][:, 0])
    k_dc = jax.vmap(lambda h: select_code_table(h, dc_depths))(a["hists"][:, 1])
    b = pack_batch_sections(
        a["stream"][:, :cap], a["totals"], jnp.take(d_ac, k_ac, axis=0),
        a["dc_layout"], jnp.take(d_dc, k_dc, axis=0),
        ow_ac=ow_ac, wcap_ac=wcap_ac, ow_dc=ow_dc, wcap_dc=wcap_dc,
        compact_ac=compact_ac, compact_dc=compact_dc,
    )
    b["totals"] = a["totals"]
    b["small"] = jnp.concatenate(
        [b["small"], a["totals"].astype(jnp.int32), k_ac, k_dc]
    )
    return b
