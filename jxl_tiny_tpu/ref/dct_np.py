"""Scaled DCT-II used by JPEG XL, as dense matrix products (numpy golden model).

Convention (matches the reference's recursive implementation,
encoder/enc_transforms-inl.h:289-546, verified by round-trip against its
ComputeScaledDCT):

  C[k] = (1/N) * a_k * sum_i x[i] * cos(pi*k*(2i+1)/(2N)),  a_0=1, a_k=sqrt(2)
  x[i] = sum_k a_k * C[k] * cos(pi*k*(2i+1)/(2N))

2-D coefficient storage layout (enc_transforms-inl.h:527-546):
  - DCT8   (8x8 px):   out[xfreq, yfreq]           (8x8)
  - DCT16X8 (8w x 16h): out[xfreq, yfreq]           (8x16, LLF at [0,0],[0,1])
  - DCT8X16 (16w x 8h): out[yfreq, xfreq]           (8x16, LLF at [0,0],[0,1])
i.e. always [short-axis freq, long-axis freq] with the DC/LLF first in raster.
"""
import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """Forward scaled-DCT matrix D: C = D @ x."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) / n
    d[1:] *= np.sqrt(2.0)
    return d.astype(np.float32)


@functools.lru_cache(maxsize=None)
def idct_matrix(n: int) -> np.ndarray:
    """Inverse: x = IDCT @ C, IDCT = (n * D)^T."""
    return (dct_matrix(n).T * n).astype(np.float32)


def dct2d_blocks(pixels: np.ndarray) -> np.ndarray:
    """Batched 2-D scaled DCT with reference layout.

    pixels: [..., R, C] -> coefficients [..., min(R,C), max(R,C)].
    """
    r, c = pixels.shape[-2], pixels.shape[-1]
    dr = dct_matrix(r)
    dc = dct_matrix(c)
    # [yfreq, xfreq] = Dr @ P @ Dc^T
    coef = np.einsum("ky,...yx,lx->...kl", dr, pixels, dc, optimize=True)
    if r >= c:
        # layout [xfreq, yfreq]
        coef = np.swapaxes(coef, -2, -1)
    return np.ascontiguousarray(coef)


def idct2d_blocks(coef: np.ndarray, r: int, c: int) -> np.ndarray:
    """Inverse of dct2d_blocks: coefficients [..., min, max] -> pixels [..., R, C]."""
    if r >= c:
        coef = np.swapaxes(coef, -2, -1)
    ir = idct_matrix(r)
    ic = idct_matrix(c)
    return np.einsum("yk,...kl,xl->...yx", ir, coef, ic, optimize=True)
