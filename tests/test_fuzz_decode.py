"""Adversarial conformance: mutated bitstreams must never be silently
accepted (VERDICT r1, missing item 1 / next-round item 4).

Every mutation of a valid stream must either raise errors.DecodeError (the
decoder's single typed failure surface — over-reads, nonzero padding,
TOC/size mismatches, incomplete prefix codes, fixed-tree deviations) or
decode to *different* pixels (a flip inside a coefficient's value bits
produces a different-but-valid stream — undetectable in any format, djxl
included). What must never happen: another exception type, a hang, or —
except for re-encodings of identical symbols (e.g. permuting unused
prefix-code depths), which are rare — identical pixels.
"""
import numpy as np
import pytest

from jxl_tiny_tpu.decode.decoder import decode_jxl
from jxl_tiny_tpu.errors import DecodeError


def _fuzz(data, n, seed):
    base = decode_jxl(data, crop=False)
    rng = np.random.RandomState(seed)
    nbits = len(data) * 8
    err = diff = same = 0
    # Stratified positions: every 1/16th of the file gets hits, so every
    # section (headers, TOC, DC global/groups, AC global/groups) is covered.
    strata = np.linspace(0, nbits, 17).astype(int)
    for i in range(n):
        s = i % 16
        pos = int(rng.randint(strata[s], max(strata[s + 1], strata[s] + 1)))
        m = bytearray(data)
        m[pos // 8] ^= 1 << (pos % 8)
        try:
            out = decode_jxl(bytes(m), crop=False)
        except DecodeError:
            err += 1
            continue
        # Any non-DecodeError exception propagates and fails the test.
        if out.shape == base.shape and np.array_equal(out, base):
            same += 1
        else:
            diff += 1
    return err, diff, same


@pytest.mark.parametrize(
    "name,n,max_same",
    [("tiny64", 400, 0.02), ("odd131x77", 300, 0.30)],
)
def test_bitflip_fuzz_golden(testdata, name, n, max_same):
    import os

    data = open(os.path.join(testdata, "golden", f"{name}.jxl"), "rb").read()
    err, diff, same = _fuzz(data, n, seed=1234)
    assert err + diff + same == n
    # Strictness is active: a solid fraction of flips is *detected*, not
    # just divergent.
    assert err >= 0.3 * n, (err, diff, same)
    # Silent identity is limited to benign re-encodings of *unused* table
    # entries (depths of never-coded symbols, cluster ids of never-queried
    # contexts in the AC-global histogram serialization). Those mutants are
    # different-but-valid streams that djxl decodes identically too. Small
    # images with few used contexts (odd131x77) have proportionally large
    # inert serialization regions; tiny64's bound shows the tight case.
    assert same <= max_same * n, (err, diff, same)


def test_bitflip_fuzz_multisection():
    """Same property on a multi-group stream (real per-section TOC, DC +
    AC group sections all present as separate byte ranges)."""
    from jxl_tiny_tpu.encoder import encode_image

    rng = np.random.RandomState(3)
    h, w = 300, 320  # 2x2 groups -> 7 TOC sections
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.clip(
        np.stack(
            [
                0.5 + 0.4 * np.sin(xx * 0.05) * np.cos(yy * 0.04),
                0.5 + 0.3 * np.sin((xx + yy) * 0.02),
                0.4 + 0.2 * np.cos(xx * 0.013),
            ]
        )
        + rng.randn(3, h, w).astype(np.float32) * 0.03,
        0,
        1,
    ).astype(np.float32)
    data = encode_image(img, 1.0)
    err, diff, same = _fuzz(data, 300, seed=99)
    assert err + diff + same == 300
    assert err >= 0.3 * 300, (err, diff, same)
    assert same <= 0.30 * 300, (err, diff, same)


def test_structural_mutations(testdata):
    """Truncations, extensions, and emptied files all fail typed."""
    import os

    data = open(os.path.join(testdata, "golden", "gradient512.jxl"), "rb").read()
    for mutant in (
        data[:-1],
        data[:-37],
        data[: len(data) // 2],
        data[:20],
        data[:2],
        b"",
        data + b"\x00",
        data + b"trailing",
        data[:100] + data[150:],  # 50 bytes cut from the middle
    ):
        with pytest.raises(DecodeError):
            decode_jxl(bytes(mutant))
