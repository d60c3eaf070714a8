"""jxl_tiny_tpu: a TPU-native JPEG XL (VarDCT, encode-only) framework with the
capabilities of libjxl-tiny.

Compute path: JAX/XLA/Pallas over 256x256 groups batched and sharded across a
device mesh (jxl_tiny_tpu.ops, jxl_tiny_tpu.parallel). Host path: entropy-code
optimization and bitstream packing (jxl_tiny_tpu.entropy / .bitstream, with a
C++ fast path in jxl_tiny_tpu.cpp). A numpy golden model (jxl_tiny_tpu.ref)
specifies per-stage semantics, and jxl_tiny_tpu.decode is a verification
decoder for the emitted subset of the format.
"""
from .encoder import encode_image, encode_file  # noqa: F401

__version__ = "0.1.0"
