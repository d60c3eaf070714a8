"""Device-side AC entropy packing (ops.pack_kernels): unit + e2e tests.

Pallas kernels run in interpret mode on the CPU test mesh."""
import numpy as np
import jax.numpy as jnp
import pytest

from jxl_tiny_tpu.ops import pack_kernels as PK


def test_base64_map_twin():
    """Numpy ac_base64_map must match the device formulas exactly."""
    import jxl_tiny_tpu.constants as C

    m = PK.ac_base64_map()
    assert m.shape == (C.NUM_AC_CONTEXTS,)
    assert m.max() < 64
    n_nz = C.NUM_BLOCK_CTXS * C.NONZERO_BUCKETS
    # nzero contexts
    nz_bucket = np.arange(n_nz) // C.NUM_BLOCK_CTXS
    block = np.arange(n_nz) % C.NUM_BLOCK_CTXS
    dev = np.asarray(PK.base64_nz(jnp.asarray(nz_bucket), jnp.asarray(block)))
    assert np.array_equal(dev, m[:n_nz])
    # zero-density contexts
    rest = np.arange(C.NUM_AC_CONTEXTS - n_nz)
    block = rest // C.ZERO_DENSITY_CONTEXT_COUNT
    zd = rest % C.ZERO_DENSITY_CONTEXT_COUNT
    dev = np.asarray(
        PK.base64_zd(jnp.asarray(zd >> 1), jnp.asarray(zd & 1), jnp.asarray(block))
    )
    assert np.array_equal(dev, m[n_nz:])


def test_compact_stream():
    rng = np.random.RandomState(0)
    g = 2
    cnt = rng.poisson(4.0, size=(g, PK.ROWS)).clip(0, 128).astype(np.int32)
    cnt[1, :10] = 128
    tok = rng.randint(1, 1 << 27, size=(g, PK.ROWS, PK.W)).astype(np.uint32)
    cap = 16384
    stream, totals = PK.compact_stream(jnp.asarray(tok), jnp.asarray(cnt), cap)
    stream = np.asarray(stream)
    totals = np.asarray(totals)
    assert np.array_equal(totals, cnt.sum(axis=1))
    for k in range(g):
        ref = np.concatenate([tok[k, r, : cnt[k, r]] for r in range(PK.ROWS)])
        assert np.array_equal(stream[k, : len(ref)], ref)
        assert (stream[k, len(ref) : cap] == 0).all()


def test_compact_stream_banked_matches():
    """K-bank OR-placement (JXL_COMPACT_BANKS) must be byte-equal to the
    single-chain kernels — placement is order-free, banks OR together."""
    import os

    rng = np.random.RandomState(11)
    g = 2
    cnt = rng.poisson(4.0, size=(g, PK.ROWS)).clip(0, 128).astype(np.int32)
    cnt[rng.rand(g, PK.ROWS) < 0.4] = 0
    cnt[1, 7] = 128
    tok = rng.randint(1, 1 << 27, size=(g, PK.ROWS, PK.W)).astype(np.uint32)
    cap = 16384
    s1, t1 = PK.compact_stream(jnp.asarray(tok), jnp.asarray(cnt), cap)
    h1, u1 = PK.compact_stream_hier(jnp.asarray(tok), jnp.asarray(cnt), cap)
    os.environ["JXL_COMPACT_BANKS"] = "2"
    try:
        s2, t2 = PK.compact_stream(jnp.asarray(tok), jnp.asarray(cnt), cap)
        h2, u2 = PK.compact_stream_hier(
            jnp.asarray(tok), jnp.asarray(cnt), cap
        )
    finally:
        del os.environ["JXL_COMPACT_BANKS"]
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(u1), np.asarray(u2))
    assert np.array_equal(np.asarray(h1), np.asarray(h2))


def test_left_pack_property():
    """left_pack == stable partition of survivors (front, original order,
    zero tail) for random keep masks and non-power-of-two axis lengths."""
    rng = np.random.RandomState(5)
    for n in (7, 128, 300, 3072):
        val = rng.randint(1, 1 << 30, size=(3, n)).astype(np.int32)
        keep = rng.rand(3, n) < rng.rand(3, 1)  # varied densities
        got = np.asarray(PK.left_pack(jnp.asarray(val), jnp.asarray(keep)))
        for k in range(3):
            ref = val[k][keep[k]]
            assert np.array_equal(got[k, : len(ref)], ref), (n, k)
            assert (got[k, len(ref) :] == 0).all(), (n, k)


def test_compact_stream_hier_matches_classic():
    """The hierarchical (thin-first, coverage-recovered) compaction must be
    byte-equal to the classic path on mixed content: empty rows, typical
    thin rows, fat rows (> THIN_W tokens) sprinkled anywhere, and a group
    of all-max rows."""
    rng = np.random.RandomState(3)
    g = 3
    cnt = rng.poisson(4.0, size=(g, PK.ROWS)).clip(0, 128).astype(np.int32)
    cnt[rng.rand(g, PK.ROWS) < 0.5] = 0
    fat_at = rng.rand(g, PK.ROWS) < 0.03
    cnt[fat_at] = rng.randint(33, 129, size=int(fat_at.sum()))
    cnt[2, :200] = 128  # heavy prefix: exercises fat runs + big positions
    tok = rng.randint(1, 1 << 27, size=(g, PK.ROWS, PK.W)).astype(np.uint32)
    cap = 32768
    s_ref, t_ref = PK.compact_stream(jnp.asarray(tok), jnp.asarray(cnt), cap)
    s_hier, t_hier = PK.compact_stream_hier(
        jnp.asarray(tok), jnp.asarray(cnt), cap
    )
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_hier))
    s_ref = np.asarray(s_ref)
    s_hier = np.asarray(s_hier)
    for k in range(g):
        t = int(np.asarray(t_ref)[k])
        if t > cap:
            # Over-cap groups are re-run by callers (totals is the
            # signal); both kernels clamp trailing entries into the last
            # 128-lane window, so only positions below it are specified.
            assert np.array_equal(s_ref[k, : cap - 128], s_hier[k, : cap - 128]), k
        else:
            assert np.array_equal(s_ref[k, :t], s_hier[k, :t]), k
            assert (s_hier[k, t:cap] == 0).all()


def test_merge_rows_preserves_stream():
    """The log-merge preconditioner must keep every token at its stream
    position (explicit starts; totals identical) while shrinking the
    non-empty row count. Rows may carry garbage beyond their count."""
    rng = np.random.RandomState(7)
    g = 2
    cnt = rng.poisson(8.0, size=(g, PK.ROWS)).clip(0, 127).astype(np.int32)
    cnt[rng.rand(g, PK.ROWS) < 0.4] = 0
    tok = rng.randint(1, 1 << 27, size=(g, PK.ROWS, PK.W)).astype(np.uint32)
    mtok, mst, mcnt, mtot = PK.merge_rows(jnp.asarray(tok), jnp.asarray(cnt))
    mtok, mst, mcnt = np.asarray(mtok), np.asarray(mst), np.asarray(mcnt)
    assert np.array_equal(np.asarray(mtot), cnt.sum(axis=1))
    assert np.array_equal(mcnt.sum(axis=1), cnt.sum(axis=1))
    assert (mcnt > 0).sum() < 0.5 * (cnt > 0).sum()
    for k in range(g):
        ref = np.concatenate(
            [tok[k, r, : cnt[k, r]] for r in range(PK.ROWS)]
        )
        got = np.zeros_like(ref)
        for r in range(mtok.shape[1]):
            c = mcnt[k, r]
            got[mst[k, r] : mst[k, r] + c] = mtok[k, r, :c]
        assert np.array_equal(got, ref)


def _ref_bitpack(data, nbits, total, ow):
    out = np.zeros(ow, np.uint32)
    p = 0
    for t in range(total):
        d, nb = int(data[t]), int(nbits[t])
        out[p >> 5] |= (d << (p & 31)) & 0xFFFFFFFF
        if (p & 31) and (p & 31) + nb > 32:
            out[(p >> 5) + 1] |= d >> (32 - (p & 31))
        p += nb
    return out, p


def test_bitpack_var_fills_safe_capacity():
    """A section filling right up to var_safe_words(ow) must pack
    bit-exactly — entries near the end start within 33 words of ow, the
    zone the entry clamp makes unsafe past the safe capacity."""
    rng = np.random.RandomState(1)
    g, cap, ow = 1, 4096, 512
    safe_bits = 32 * PK.var_safe_words(ow)
    nbits = rng.randint(10, 28, size=(g, cap)).astype(np.int32)
    cum = np.cumsum(nbits[0])
    nbits[0, cum > safe_bits] = 0  # truncate to the safe capacity
    data = (
        rng.randint(0, 1 << 30, size=(g, cap))
        & ((1 << np.maximum(nbits, 1)) - 1)
    ).astype(np.uint32)
    data[nbits == 0] = 0
    pos = (np.cumsum(nbits, axis=1) - nbits).astype(np.int32)
    total_bits = int(nbits[0].sum())
    assert total_bits > safe_bits - 28 * 8  # actually exercises the tail
    out = np.asarray(
        PK.bitpack_groups_var(
            jnp.asarray(data), jnp.asarray(nbits), jnp.asarray(pos), ow
        )
    )
    ref, _ = _ref_bitpack(data[0], nbits[0], cap, ow)
    assert np.array_equal(out[0], ref)


def test_bitpack_var_retry_predicate():
    """Regression (round-1 advisor, high): a section whose word count lands
    in (ow - fan - 1, ow] is representable by the OLD `bits > ow*32 - 32`
    check but NOT by the packer (entry clamp mis-places its tail entries).
    The var_safe_words predicate must flag it, and the bumped bucket must be
    strictly larger than the current ow (the old formula could re-pick the
    same ow and loop forever)."""
    from jxl_tiny_tpu.encoder import _next_bucket

    ow = 8192
    for words in (ow - PK.VAR_FAN, ow - 1, ow):
        bits = words * 32
        assert bits <= ow * 32 - 32 or words == ow  # old check mostly passes
        assert words > PK.var_safe_words(ow)  # new check flags it
        new_ow = _next_bucket((8192, 32768, 131072), words + PK.VAR_FAN + 1)
        assert new_ow > ow
    # And a comfortably-fitting section is not flagged.
    assert PK.var_safe_words(ow) >= ow - 33
    assert (ow - 34) <= PK.var_safe_words(ow)


def _rand_token_fields(rng, g, cap):
    nbits = rng.randint(0, 29, size=(g, cap)).astype(np.int32)
    nbits[0, ::3] = 0  # interleaved zero-width entries (DC layout shape)
    nbits[0, 64:192] = 0  # whole zero octs (bounds skipping)
    nbits[1, :64] = 28  # maximal widths: n_oct=224
    nbits[:, -11:] = 0
    data = (rng.randint(0, 1 << 30, size=(g, cap)) & ((1 << np.maximum(nbits, 1)) - 1)).astype(
        np.uint32
    )
    data[nbits == 0] = 0
    pos = (np.cumsum(nbits, axis=1) - nbits).astype(np.int32)
    return data, nbits, pos


def test_bitpack_groups_var_matches():
    """Variable-window oct packer must produce bit-identical words to the
    scalar reference, including zero-width entries, maximal widths, and
    word-carry offsets in both merge levels."""
    rng = np.random.RandomState(12)
    g, cap, ow = 2, 4096, 4096
    data, nbits, pos = _rand_token_fields(rng, g, cap)
    out = np.asarray(
        PK.bitpack_groups_var(
            jnp.asarray(data), jnp.asarray(nbits), jnp.asarray(pos), ow
        )
    )
    for k in range(g):
        ref, _ = _ref_bitpack(data[k], nbits[k], cap, ow)
        assert np.array_equal(out[k], ref), f"group {k}"


def test_bitpack_groups_words_matches():
    """The word-parallel packer (segmented OR-scan + log-shift left-pack +
    compact placement) must be bit-identical to the scalar reference on
    AC-shaped streams: a contiguous valid prefix of 1..28-bit tokens
    (zero-width tokens occur only in the tail padding), including empty,
    full, and spilling-final-token groups."""
    rng = np.random.RandomState(5)
    g, cap, ow = 6, 2048, 2048
    totals = np.array([0, 1, cap, 700, 1333, 37])
    nbits = rng.randint(1, 29, size=(g, cap)).astype(np.int32)
    # Force a final-token spill case: last token crosses a word boundary.
    nbits[3, 699] = 28
    nbits = nbits * (np.arange(cap)[None] < totals[:, None])
    data = (
        rng.randint(0, 1 << 30, size=(g, cap))
        & ((1 << np.maximum(nbits, 1)) - 1)
    ).astype(np.uint32)
    data = data * (nbits > 0)
    ends = np.cumsum(nbits, axis=1)
    pos = (ends - nbits).astype(np.int32)
    out = np.asarray(
        PK.bitpack_groups_words(
            jnp.asarray(data), jnp.asarray(nbits), jnp.asarray(pos), ow
        )
    )
    for k in range(g):
        ref, bits = _ref_bitpack(data[k], nbits[k], cap, ow)
        nw = (bits + 31) >> 5
        assert np.array_equal(out[k], ref), f"group {k}"
        assert not out[k, nw:].any(), f"group {k} tail"


def test_token_data_bits_and_hist():
    rng = np.random.RandomState(2)
    g, cap = 2, 512
    base = rng.randint(0, 64, size=(g, cap))
    value = rng.randint(0, 1 << 16, size=(g, cap))
    stream = ((base.astype(np.uint32) << 16) | value).astype(np.uint32)
    totals = np.array([512, 300], np.int32)
    cmap = rng.randint(0, 8, size=64).astype(np.int64)
    d8 = rng.randint(0, 16, size=(8, 64)).astype(np.uint32)
    bits8 = rng.randint(0, 1 << 15, size=(8, 64)).astype(np.uint32)
    d_table = np.zeros((9, 64), np.float32)
    d_table[0] = cmap
    d_table[1:] = (d8 << 16) | bits8
    d_np = d8[cmap]  # composed [64, 64] twin for the expectation
    bits_np = bits8[cmap]

    data, nbits = PK.token_data_bits(
        jnp.asarray(stream), jnp.asarray(totals), jnp.asarray(d_table)
    )
    data, nbits = np.asarray(data), np.asarray(nbits)

    from jxl_tiny_tpu.entropy.uint_coder import uint_encode

    tok, nb_e, _ = uint_encode(value.ravel().astype(np.uint32))
    tok = tok.reshape(g, cap)
    nb_e = nb_e.reshape(g, cap).astype(np.int64)
    extra = (value & ((1 << nb_e) - 1)).astype(np.uint32)
    depth = d_np[base, tok]
    exp_data = bits_np[base, tok] | (extra << depth)
    exp_nbits = depth.astype(np.int64) + nb_e
    valid = np.arange(cap)[None, :] < totals[:, None]
    assert np.array_equal(data, np.where(valid, exp_data, 0))
    assert np.array_equal(nbits, np.where(valid, exp_nbits, 0))

    hist = np.asarray(PK.hist_base64(jnp.asarray(stream), jnp.asarray(totals)))
    exp_hist = np.zeros((64, 64), np.uint32)
    np.add.at(exp_hist, (base[valid], tok[valid]), 1)
    assert np.array_equal(hist, exp_hist)


def test_device_dc_sections_byte_equal_host():
    """Device-built DC sections (ops.dc_kernels) must be byte-identical to
    the host serializer given the same entropy code — gradient contexts,
    prev-cell scans, raw header bits, packing, everything."""
    from jxl_tiny_tpu.encoder import DeviceEncodeJob, GroupResult, _build_dc_group
    from jxl_tiny_tpu.common import div_ceil
    from jxl_tiny_tpu.ops.pipeline_jax import unpack_meta_u8
    import jxl_tiny_tpu.bitstream.sections as S

    rng = np.random.RandomState(9)
    h, w = 200, 330  # partial blocks + multiple groups
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.1),
            0.5 + 0.3 * np.cos(yy * 0.08),
            0.4 + 0.2 * np.sin((xx + yy) * 0.05),
        ]
    ).astype(np.float32)
    img = np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.03, 0, 1)

    job = DeviceEncodeJob(img, 1.0, upload_dtype=None)
    job.pack()
    dev = job._dc_writers()[0]
    meta = unpack_meta_u8(np.asarray(job.out_a["meta"]))
    dim = job.dim
    groups = {}
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            yb, xb = int(job.yb_arr[i]), int(job.xb_arr[i])
            ty, tx = div_ceil(yb, 8), div_ceil(xb, 8)
            gr = GroupResult(
                None, meta["strategy"][i], meta["is_first"][i],
                meta["raw_qf"][i], meta["ytox"][i, :ty, :tx],
                meta["ytob"][i, :ty, :tx], yb, xb,
            )
            gr.quant_dc = meta["quant_dc"][i][:, :yb, :xb]
            groups[(gy, gx)] = gr
            i += 1
    host = S.serialize_section(_build_dc_group(groups, dim, 0, 0), job.dc_code)
    assert dev.bits_written == host.bits_written
    assert dev.to_bytes() == host.to_bytes()


@pytest.mark.slow  # 260s; single-DC-group byte equality runs by default
def test_device_dc_multi_dc_group_byte_equal():
    """Two DC-group columns (image wider than 2048): the vmapped regrouping
    and per-DC-group dims must still match the host serializer bytes."""
    from jxl_tiny_tpu.encoder import DeviceEncodeJob, GroupResult, _build_dc_group
    from jxl_tiny_tpu.common import div_ceil
    from jxl_tiny_tpu.ops.pipeline_jax import unpack_meta_u8
    import jxl_tiny_tpu.bitstream.sections as S

    rng = np.random.RandomState(13)
    h, w = 96, 2100
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.01),
            0.5 + 0.3 * np.cos((yy + xx) * 0.008),
            0.4 + 0.2 * np.sin(yy * 0.05),
        ]
    ).astype(np.float32)
    img = np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.02, 0, 1)

    job = DeviceEncodeJob(img, 1.0, upload_dtype=None)
    job.pack()
    dev = job._dc_writers()
    assert len(dev) == 2
    meta = unpack_meta_u8(np.asarray(job.out_a["meta"]))
    dim = job.dim
    groups = {}
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            yb, xb = int(job.yb_arr[i]), int(job.xb_arr[i])
            ty, tx = div_ceil(yb, 8), div_ceil(xb, 8)
            gr = GroupResult(
                None, meta["strategy"][i], meta["is_first"][i],
                meta["raw_qf"][i], meta["ytox"][i, :ty, :tx],
                meta["ytob"][i, :ty, :tx], yb, xb,
            )
            gr.quant_dc = meta["quant_dc"][i][:, :yb, :xb]
            groups[(gy, gx)] = gr
            i += 1
    for dgx in range(2):
        host = S.serialize_section(
            _build_dc_group(groups, dim, 0, dgx), job.dc_code
        )
        assert dev[dgx].to_bytes() == host.to_bytes(), f"dc group {dgx}"


def test_device_pack_e2e_matches_host_path():
    """Full encode via the device-packed path: decoded pixels must be
    bit-identical to the host-packed path (same quantization decisions,
    different entropy-code clustering only) and sizes within 5%."""
    from jxl_tiny_tpu.encoder import encode_image_jax, encode_image_device
    from jxl_tiny_tpu.decode.decoder import decode_jxl

    rng = np.random.RandomState(3)
    h, w = 176, 272
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.05) * np.cos(yy * 0.03),
            0.5 + 0.3 * np.sin((xx + yy) * 0.02),
            0.4 + 0.2 * np.cos(xx * 0.01),
        ]
    ).astype(np.float32)
    img = np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.02, 0, 1)

    d_host = encode_image_jax(img, 1.0, fast=True)
    d_dev = encode_image_device(img, 1.0, upload_dtype=None)
    assert abs(len(d_dev) - len(d_host)) / len(d_host) < 0.05
    ph = decode_jxl(d_host)
    pd = decode_jxl(d_dev)
    assert np.array_equal(np.asarray(ph), np.asarray(pd))
