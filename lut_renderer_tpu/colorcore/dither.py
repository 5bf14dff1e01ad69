"""Dither patterns for bit-depth reduction.

The reference exposes `zscale=dither=error_diffusion` (src/lut_renderer/
ffmpeg.py:304-307; param default "none" at models.py:46). True error diffusion
is a row-recurrent serial algorithm — hostile to TPU vectorization — so the TPU
build substitutes spatially-stationary dithers applied inside the fused kernel:

  * "none":    round-to-nearest quantization;
  * "ordered": 16x16 Bayer threshold matrix (tiled), zero-mean;
  * "random":  per-pixel uniform noise from the TPU PRNG (stochastic rounding).

The deviation from zscale's error diffusion is deliberate and documented; the
acceptance budget is the same dE76 < 0.5 bound as the LUT itself.
"""

from __future__ import annotations

import numpy as np

DITHER_MODES = ("none", "ordered", "random", "error_diffusion")


def bayer_matrix(order: int) -> np.ndarray:
    """Recursive Bayer matrix of side 2**order, values 0..4**order-1."""
    m = np.array([[0]], dtype=np.int64)
    for _ in range(order):
        n = m.shape[0]
        m = np.block(
            [
                [4 * m + 0, 4 * m + 2],
                [4 * m + 3, 4 * m + 1],
            ]
        )
        assert m.shape[0] == 2 * n
    return m


def bayer_offsets(order: int = 4) -> np.ndarray:
    """Zero-mean dither offsets in units of one output LSB, shape (2^o, 2^o).

    offset = (bayer + 0.5)/4^o - 0.5  in (-0.5, 0.5), so adding the offset
    before round-to-nearest yields an unbiased ordered dither.
    """
    m = bayer_matrix(order).astype(np.float32)
    size = float(4**order)
    return ((m + 0.5) / size - 0.5).astype(np.float32)


def quantize_with_ordered_dither(x: np.ndarray, depth: int, dither: np.ndarray) -> np.ndarray:
    """Quantize float code values x (H, W) to integers at `depth` bits with a
    tiled ordered-dither offset (NumPy reference for the kernel's dither path)."""
    h, w = x.shape[-2], x.shape[-1]
    th, tw = dither.shape
    tiled = np.tile(dither, (h // th + 1, w // tw + 1))[:h, :w]
    maxv = (1 << depth) - 1
    return np.clip(np.floor(x + 0.5 + tiled), 0, maxv).astype(
        np.uint16 if depth > 8 else np.uint8
    )
