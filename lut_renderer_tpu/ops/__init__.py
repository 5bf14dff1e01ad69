"""ops — TPU kernels for the fused pixel pipeline.

The hot op replaces FFmpeg's `lut3d` filter (the reference's per-frame pixel
engine, invoked via src/lut_renderer/ffmpeg.py:179-414). Design rationale and
measured hardware data live in experiments/FINDINGS.md: XLA gather is
scalar-speed on TPU, so interpolation runs on the MXU as factorized one-hot
matmuls — nearest/trilinear are one pass, tetrahedral is two exact rank-1
passes. All pixel data is planar (minor-dim-128 friendly).

Exports resolve LAZILY (PEP 562): importing this package does NOT import
jax. That matters operationally — `import jax` hangs in every process when
the axon tunnel is wedged (CLAUDE.md), and pure-NumPy paths (the per-LUT
precision gate behind `lut-tpu luts gate`, .cube parsing) must stay usable
regardless. `from lut_renderer_tpu.ops.prepare import prepare_lut` is
jax-free; the kernel/render symbols pull jax only on first access.
"""

import importlib

_LAZY = {
    "PreparedLut": ".prepare",
    "prepare_lut": ".prepare",
    "apply_lut_planes": ".lut3d",
    "lut3d_tpu_available": ".lut3d",
    "chroma_downsample_420": ".pixel",
    "chroma_upsample_420": ".pixel",
    "quantize_plane": ".pixel",
    "yuv_planes_to_rgb": ".pixel",
    "rgb_to_yuv_planes_tpu": ".pixel",
    "RenderConfig": ".render",
    "render_yuv_frame": ".render",
    "make_render_fn": ".render",
    "swscale_bicubic_weights": ".resample",
    "resample_weights": ".resample",
    "resample_plane": ".resample",
}

__all__ = list(_LAZY)


def __getattr__(name):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    value = getattr(importlib.import_module(target, __name__), name)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
