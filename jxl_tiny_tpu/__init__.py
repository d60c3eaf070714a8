"""jxl_tiny_tpu: a TPU-native JPEG XL (VarDCT, encode-only) framework with the
capabilities of libjxl-tiny.

Compute path: JAX/XLA/Pallas over 256x256 groups batched and sharded across a
device mesh (jxl_tiny_tpu.ops, jxl_tiny_tpu.parallel). Host path: entropy-code
optimization and bitstream packing (jxl_tiny_tpu.entropy / .bitstream, with a
C++ fast path in jxl_tiny_tpu.cpp). A numpy golden model (jxl_tiny_tpu.ref)
specifies per-stage semantics, and jxl_tiny_tpu.decode is a verification
decoder for the emitted subset of the format.
"""
import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: encode programs are compiled per
    image shape (10-160s on TPU); cached binaries make repeat CLI runs and
    production restarts instant. Opt out with JXL_TPU_NO_CACHE=1."""
    if _os.environ.get("JXL_TPU_NO_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "jxl_tiny_tpu_xla"),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .encoder import encode_image, encode_file  # noqa: F401

__version__ = "0.1.0"
