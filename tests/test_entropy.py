import numpy as np
import pytest

from jxl_tiny_tpu.bitstream import BitWriter, BitReader
from jxl_tiny_tpu.entropy import (
    uint_encode,
    create_huffman_depths,
    depths_to_bits,
    cluster_histograms,
    build_entropy_code,
    write_tokens,
)
from jxl_tiny_tpu.entropy.entropy_write import (
    write_prefix_codes,
    write_context_map,
    write_entropy_code,
)
from jxl_tiny_tpu.decode.huffman_read import (
    read_prefix_code_bundle,
    read_context_map,
    TokenReader,
)


def test_uint_coder_golden():
    # Golden values from the reference (encoder/token.h:24-31).
    cases = [
        (0, 0, 0, 0),
        (15, 15, 0, 0),
        (16, 16, 2, 0b00),
        (17, 16, 2, 0b01),
        (20, 17, 2, 0b00),
        (24, 18, 2, 0b00),
        (28, 19, 2, 0b00),
        (32, 20, 3, 0b000),
        (65535, 63, 13, 0b1111111111111),
    ]
    vals = np.array([c[0] for c in cases], np.uint32)
    tok, nbits, bits = uint_encode(vals)
    for i, (v, t, n, b) in enumerate(cases):
        assert tok[i] == t, v
        assert nbits[i] == n, v
        assert bits[i] == b, v


def test_huffman_kraft_and_limit():
    rng = np.random.RandomState(2)
    for _ in range(50):
        counts = rng.randint(0, 1000, size=64).astype(np.uint32)
        counts[rng.rand(64) < 0.5] = 0
        if counts.sum() == 0:
            continue
        depths = create_huffman_depths(counts, 15)
        nz = depths[counts > 0]
        assert (depths[counts == 0] == 0).all()
        assert depths.max() <= 15
        if (counts > 0).sum() > 1:
            assert np.isclose(np.sum(0.5 ** nz.astype(float)), 1.0)


def test_huffman_limit_forcing():
    # Exponential counts force deep trees; limit must clamp to 15.
    counts = (2 ** np.arange(30)).astype(np.uint32)
    depths = create_huffman_depths(counts, 15)
    assert depths.max() <= 15
    assert np.isclose(np.sum(0.5 ** depths[depths > 0].astype(float)), 1.0)


@pytest.mark.parametrize("seed", range(8))
def test_prefix_code_serialization_roundtrip(seed):
    rng = np.random.RandomState(seed)
    shapes = [
        rng.randint(0, 100, size=64),  # general
        np.eye(64)[rng.randint(64)] * 50,  # single symbol
        (rng.rand(64) < 0.05) * rng.randint(1, 10, size=64),  # sparse
        np.ones(64) * 7,  # uniform (RLE path)
    ]
    histos = np.stack([s.astype(np.uint32) for s in shapes])
    histos[histos.sum(axis=1) == 0, 0] = 1
    code = build_entropy_code(histos)  # may cluster
    w = BitWriter()
    write_prefix_codes(code.depths, code.bits, w)
    r = BitReader(w.to_bytes())
    decs = read_prefix_code_bundle(r, code.num_clusters)
    for i, d in enumerate(decs):
        if d.single is not None:
            used = np.nonzero(code.depths[i])[0]
            assert len(used) <= 1
            if len(used):
                assert d.single == used[0]
        else:
            assert (d.depths[: len(code.depths[i])] == code.depths[i]).all()


def test_token_stream_roundtrip():
    rng = np.random.RandomState(3)
    num_ctx = 45
    ctx = rng.randint(0, num_ctx, size=5000).astype(np.int64)
    val = (rng.zipf(1.5, size=5000) - 1).clip(0, 60000).astype(np.uint32)
    histo = np.zeros((num_ctx, 64), np.uint32)
    tok, _, _ = uint_encode(val)
    np.add.at(histo, (ctx, tok), 1)
    code = build_entropy_code(histo)
    w = BitWriter()
    write_entropy_code(code, w)
    write_tokens(ctx, val, code, w)
    r = BitReader(w.to_bytes())
    cm, ncl = read_context_map(r, num_ctx)
    assert (cm == code.context_map).all()
    decs = read_prefix_code_bundle(r, ncl)
    tr = TokenReader(r, cm, decs)
    for c, v in zip(ctx, val):
        assert tr.read(int(c)) == int(v)


def test_cluster_limit():
    rng = np.random.RandomState(4)
    histos = rng.randint(0, 1000, size=(100, 64)).astype(np.uint32)
    clustered, cmap = cluster_histograms(histos)
    assert clustered.shape[0] <= 8
    assert cmap.shape == (100,)
    assert cmap.max() == clustered.shape[0] - 1
    # Canonical: first appearance order is increasing.
    seen = []
    for c in cmap:
        if c not in seen:
            assert all(c > s for s in seen) or not seen
            seen.append(c)
    # Cluster totals preserve token mass.
    assert clustered.sum() == histos.sum()
