"""Debug/sanitizer mode — the TPU equivalents of the reference's asan/msan
builds (base/sanitizer_definitions.h, ci.sh:587-669): NaN checking inside
jitted programs and interpreter-mode Pallas kernels with bounds semantics.
"""
import contextlib
import os


@contextlib.contextmanager
def debug_mode(nan_checks=True, interpret_pallas=True):
    """Run encodes with jax_debug_nans and interpreted Pallas kernels.

    Interpreted kernels evaluate with XLA ops (no Mosaic), which both checks
    the kernel logic on any backend and surfaces out-of-bounds indexing that
    compiled mode may mask.
    """
    import jax

    prev_nan = jax.config.jax_debug_nans
    prev_env = os.environ.get("JXL_TPU_PALLAS_INTERPRET")
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    if interpret_pallas:
        # The interpret flag is read at trace time, but jitted encode
        # programs cache compiled executables keyed only on shapes/static
        # args — entering debug mode after a prior same-shape encode would
        # silently reuse the compiled (non-interpreted) kernels, and kernels
        # traced here would stay interpreted afterwards. Drop the caches at
        # both edges so the flag always takes effect.
        os.environ["JXL_TPU_PALLAS_INTERPRET"] = "1"
        jax.clear_caches()
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        if prev_env is None:
            os.environ.pop("JXL_TPU_PALLAS_INTERPRET", None)
        else:
            os.environ["JXL_TPU_PALLAS_INTERPRET"] = prev_env
        if interpret_pallas:
            jax.clear_caches()
