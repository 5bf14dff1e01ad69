"""ops — TPU kernels for the fused pixel pipeline.

The hot op replaces FFmpeg's `lut3d` filter (the reference's per-frame pixel
engine, invoked via src/lut_renderer/ffmpeg.py:242-247). Design rationale and
measured hardware data live in experiments/FINDINGS.md: XLA gather is
scalar-speed on TPU, so interpolation runs on the MXU as factorized one-hot
matmuls — nearest/trilinear are one pass, tetrahedral is two exact rank-1
passes. All pixel data is planar (minor-dim-128 friendly).
"""

from .prepare import PreparedLut, prepare_lut
from .lut3d import apply_lut_planes, lut3d_tpu_available
from .pixel import (
    chroma_downsample_420,
    chroma_upsample_420,
    quantize_plane,
    yuv_planes_to_rgb,
    rgb_to_yuv_planes_tpu,
)
from .render import RenderConfig, render_yuv_frame, make_render_fn

__all__ = [
    "PreparedLut",
    "prepare_lut",
    "apply_lut_planes",
    "lut3d_tpu_available",
    "chroma_downsample_420",
    "chroma_upsample_420",
    "quantize_plane",
    "yuv_planes_to_rgb",
    "rgb_to_yuv_planes_tpu",
    "RenderConfig",
    "render_yuv_frame",
    "make_render_fn",
]
