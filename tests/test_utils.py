"""Aux subsystems: profiling harness, debug mode, batch pipeline + retry."""
import numpy as np

from jxl_tiny_tpu.decode.decoder import decode_jxl


def _img(seed=9, h=96, w=128):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.1),
            0.5 + 0.3 * np.cos(yy * 0.08),
            0.4 + 0.2 * np.sin((xx + yy) * 0.05),
        ]
    ).astype(np.float32)
    return np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.02, 0, 1)


def test_stage_timer():
    from jxl_tiny_tpu.utils import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert set(rep["stages_ms"]) == {"a", "b"}


def test_encode_report():
    from jxl_tiny_tpu.utils import encode_report

    data, rep = encode_report(_img(), 1.0, repeats=1, upload_dtype=None)
    assert rep["bytes"] == len(data) > 0
    assert rep["mps_best"] > 0
    assert decode_jxl(data).shape == (3, 96, 128)


def test_debug_mode_roundtrip():
    from jxl_tiny_tpu.utils import debug_mode
    from jxl_tiny_tpu.encoder import encode_image_device

    with debug_mode():
        d = encode_image_device(_img(), 1.0, upload_dtype=None)
    assert decode_jxl(d).shape == (3, 96, 128)


def test_batch_pipeline_order_and_retry():
    from jxl_tiny_tpu.encoder import encode_images_device, encode_image_device

    imgs = [_img(s) for s in (1, 2, 3)]
    outs = list(encode_images_device(imgs, 1.0, upload_dtype=None))
    assert len(outs) == 3
    for im, d in zip(imgs, outs):
        assert d == encode_image_device(im, 1.0, upload_dtype=None)


def test_batched_program_matches_per_image():
    """encode_batch_device (N images in one device program, per-image codes)
    must produce bytes identical to per-image encodes."""
    from jxl_tiny_tpu.encoder import encode_batch_device, encode_image_device

    imgs = [_img(s) for s in (4, 5)]
    outs = encode_batch_device(imgs, 1.0, upload_dtype=None)
    for im, d in zip(imgs, outs):
        assert d == encode_image_device(im, 1.0, upload_dtype=None)


def test_native_packer_not_stale():
    """The committed cpp/libjxlpack.so must behave identically to a fresh
    build of cpp/pack.cc. Guards against editing pack.cc without rebuilding:
    a fresh checkout gives source and binary the same mtime, so build.py's
    mtime check alone would silently load the stale binary."""
    import ctypes
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    from jxl_tiny_tpu import cpp

    if not cpp.have_native():
        import pytest

        pytest.skip("no native packer (no compiler?)")
    if shutil.which("g++") is None:
        import pytest

        pytest.skip("g++ unavailable")

    from jxl_tiny_tpu.cpp import build as B

    rng = np.random.RandomState(0)
    nbits = rng.randint(0, 57, size=4096).astype(np.uint8)
    bits = (
        rng.randint(0, 1 << 62, size=4096, dtype=np.int64).astype(np.uint64)
        & ((np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1))
    )
    committed = B.pack_bits_native(nbits, bits)

    with tempfile.TemporaryDirectory() as td:
        so = f"{td}/libjxlpack_fresh.so"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-o", so,
             B._SRC],
            check=True,
            capture_output=True,
        )
        lib = ctypes.CDLL(so)
        lib.pack_bits.restype = ctypes.c_int64
        lib.pack_bits.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_void_p]
        total = int(nbits.sum(dtype=np.int64))
        out = np.zeros(total // 8 + 16, np.uint8)
        got = lib.pack_bits(nbits.ctypes.data, bits.ctypes.data, len(nbits),
                            out.ctypes.data)
        assert got == total
        fresh = (out[: (total + 7) // 8].tobytes(), total)
    assert committed == fresh
