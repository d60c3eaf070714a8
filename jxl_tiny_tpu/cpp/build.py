"""Build + load the native packer (ctypes). Compiled on first use, cached next
to the source; falls back to pure numpy if no compiler is available."""
import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "pack.cc")
_SO = os.path.join(os.path.dirname(__file__), "libjxlpack.so")


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.pack_bits.restype = ctypes.c_int64
            lib.pack_bits.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.pack_tokens.restype = ctypes.c_int64
            lib.pack_tokens.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.histogram_tokens.restype = None
            lib.histogram_tokens.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def have_native() -> bool:
    return get_lib() is not None


def pack_bits_native(nbits: np.ndarray, bits: np.ndarray) -> tuple:
    """Returns (buffer bytes, total_bits). Arrays must be u8 / u64."""
    lib = get_lib()
    assert lib is not None
    total = int(nbits.sum(dtype=np.int64))
    out = np.zeros(total // 8 + 16, np.uint8)
    nbits = np.ascontiguousarray(nbits, np.uint8)
    bits = np.ascontiguousarray(bits, np.uint64)
    got = lib.pack_bits(
        nbits.ctypes.data, bits.ctypes.data, len(nbits), out.ctypes.data
    )
    assert got == total
    return out[: (total + 7) // 8].tobytes(), total
