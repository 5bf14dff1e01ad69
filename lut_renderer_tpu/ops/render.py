"""Fused per-frame render op: planar YUV in -> planar YUV out on TPU.

Assembles the full pixel pipeline the reference expresses as an FFmpeg filter
chain (scale range/matrix -> format -> lut3d -> [dither] -> format, assembled
at src/lut_renderer/ffmpeg.py:195-247,304-310 and executed inside the FFmpeg
process): here it is one jit-compiled function — XLA fuses the elementwise
stages, and the LUT core runs the Pallas MXU kernel (ops.lut3d).

The whole function is vmappable over a leading frame-batch axis and shardable
over a device mesh (parallel.sharding wires that up).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .lut3d import apply_lut_planes
from .pixel import (
    chroma_downsample_420,
    chroma_downsample_422,
    chroma_resample_422_to_444,
    chroma_upsample_420,
    quantize_plane,
    range_normalize,
    yuv_planes_to_rgb,
    rgb_to_yuv_planes_tpu,
)
from .prepare import PreparedLut
from .resample import resample_plane, resample_weights


@dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) pixel-pipeline configuration for one render stage.

    Derived from a plan.RenderSpec + probe info by engine.executor; kept
    independent here so the op layer has no upward dependencies.
    """

    in_depth: int = 8
    out_depth: int = 8
    in_subsampling: str = "420"   # "420" | "422" | "444"
    out_subsampling: str = "420"
    in_full_range: bool = False
    # Range the pipeline normalizes to before the LUT (policy: pc sources ->
    # tv unless tags say otherwise; ffmpeg.py:212-233).
    work_full_range: bool = False
    out_full_range: bool = False
    matrix_in: str = "bt709"
    matrix_out: str = "bt709"
    interp: str = "tetrahedral"
    dither: str = "none"          # "none" | "ordered"
    chroma_up: str = "nearest"    # "nearest" | "bilinear"
    apply_lut: bool = True
    # LUT kernel strategy: "mxu" (Pallas, production) or "gather" (XLA
    # gather — slow on TPU but exact and CPU-friendly for tests).
    lut_strategy: str = "mxu"
    # Kernel numeric tier: "auto" resolves per LUT to the fastest of
    # int8/fast/exact whose simulated dE76 clears the budget
    # (ops.prepare.resolve_precision); "exact" opts out of the reduction.
    lut_precision: str = "auto"
    # Requantize after range normalization to mimic the reference's 8-bit
    # intermediate `format=yuv420p` step (ffmpeg.py:233); parity knob.
    requantize_intermediate: bool = True
    # Output resolution (w, h) when the policy carries `-s WxH`
    # (ffmpeg.py:312-313); None keeps source size. swscale-matched bicubic
    # (SWS_BICUBIC B=0 C=0.6 — FFmpeg's `-s` default scaler) on the RGB
    # planes after the LUT, applied as MXU matmuls (ops.resample).
    resize: Optional[Tuple[int, int]] = None
    # Pixel-pipeline layout. "auto" picks the fastest applicable:
    #   1. "fused"    — the fully-fused YUV->YUV Pallas kernel (pre/post glue
    #      in-kernel; 4K fused frame 19.9 -> 16.5 ms, 8K 81.3 -> 66.6 on
    #      v5e — ops.fused420); covers every nearest-sited {420,422,444}
    #      in/out geometry incl. the 422p10le mastering stages and padded
    #      DCI widths. Bit-exact vs "plain" under interpret; on the
    #      chip max |d| = 1 code value at ~1e-5 pixel rate (Mosaic float
    #      lowering), far inside every tier's dE budget. Forcing "fused"
    #      where it cannot apply raises (no silent fallback).
    #   2. "rowphase" — the ROW-PHASE half-height XLA layout (bit-identical
    #      to plain everywhere — FINDINGS "Phase-decomposed 420 pipeline").
    #   3. "plain"    — the straight full-res XLA layout.
    # Each name also forces that layout (for tests/measurement/bit-exact
    # requirements).
    phase_layout: str = "auto"


def _upsample(u, v, subsampling: str, mode: str):
    if subsampling == "420":
        return chroma_upsample_420(u, mode), chroma_upsample_420(v, mode)
    if subsampling == "422":
        return chroma_resample_422_to_444(u), chroma_resample_422_to_444(v)
    return u, v


def _downsample(u, v, subsampling: str):
    if subsampling == "420":
        return chroma_downsample_420(u), chroma_downsample_420(v)
    if subsampling == "422":
        return chroma_downsample_422(u), chroma_downsample_422(v)
    return u, v


_PHASE_LAYOUTS = ("auto", "plain", "rowphase", "fused")


def _fused420_applicable(y, u, cfg: RenderConfig, prep) -> bool:
    """True when the frame takes the fully-fused YUV->YUV kernel
    (ops.fused420): any nearest-sited {420,422,444} in/out geometry with an
    MXU LUT actually in play (non-128-multiple widths are padded inside).

    An EXPLICITLY forced "fused" layout that does not apply raises instead
    of silently degrading, so tests and measurements can never time the
    wrong path."""
    if cfg.phase_layout not in _PHASE_LAYOUTS:
        raise ValueError(f"unknown phase_layout {cfg.phase_layout!r}")
    if cfg.phase_layout not in ("auto", "fused"):
        return False
    from .fused420 import fused420_applicable

    ok = fused420_applicable(y, u, cfg, prep)
    if not ok and cfg.phase_layout == "fused":
        raise ValueError(
            "phase_layout='fused' was forced but the fused YUV->YUV kernel "
            "does not apply to this config (it needs an MXU-strategy LUT, "
            "nearest chroma siting, no resize, a non-error-diffusion "
            "dither, even dimensions, and matching chroma plane geometry); "
            f"cfg={cfg}, y={tuple(y.shape)}, u={tuple(u.shape)}")
    return ok


def _rowphase_applicable(y, u, cfg: RenderConfig) -> bool:
    """True when the frame can take the row-phase 420 layout: 420 in and out
    with nearest chroma siting, no resize, and geometry that factors exactly
    (full-res H, W = 2x the chroma plane). Error-diffusion output is float
    full-res planes, so that path stays plain too."""
    if cfg.phase_layout not in _PHASE_LAYOUTS:
        raise ValueError(f"unknown phase_layout {cfg.phase_layout!r}")
    return (
        cfg.phase_layout in ("auto", "rowphase")
        and cfg.in_subsampling == "420"
        and cfg.out_subsampling == "420"
        and cfg.chroma_up == "nearest"
        and cfg.resize is None
        and cfg.dither != "error_diffusion_host"
        and y.ndim >= 2
        and y.shape[-2] == 2 * u.shape[-2]
        and y.shape[-1] == 2 * u.shape[-1]
    )


def _render_rowphase_420(y, u, v, prep, cfg, interpret, lut_operands):
    """Row-phase twin of the plain pipeline for 420->420 nearest: y splits
    into two half-height row phases (sublane-strided reads — cheap; the
    lane-strided 4-phase variant measured 590 ms/plane at 8K and is dead,
    FINDINGS "Phase-decomposed 420 pipeline"), both pair elementwise with a
    single lane-dupped chroma plane (== exact nearest upsample), the 2x2 box
    downsample becomes lane adds per phase + a phase add in the production
    grouping, and only the final quantized y pays one row interleave
    (stack(-2)+reshape — the cheapest measured route). Bit-identical to the
    plain path per-pixel: same scalar ops on the same values, dither offsets
    phase-mapped (quantize_plane row_stride/row_offset)."""
    yp = jnp.stack([y[..., 0::2, :], y[..., 1::2, :]], axis=-3)
    ud = jnp.repeat(u, 2, axis=-1)[..., None, :, :]
    vd = jnp.repeat(v, 2, axis=-1)[..., None, :, :]

    yf = yp.astype(jnp.float32)
    uf = ud.astype(jnp.float32)
    vf = vd.astype(jnp.float32)
    yf, uf, vf = range_normalize(
        yf, uf, vf, cfg.in_depth, cfg.in_full_range, cfg.work_full_range
    )
    if cfg.requantize_intermediate and cfg.in_full_range != cfg.work_full_range:
        maxv = float((1 << cfg.in_depth) - 1)
        yf = jnp.clip(jnp.floor(yf + 0.5), 0, maxv)
        uf = jnp.clip(jnp.floor(uf + 0.5), 0, maxv)
        vf = jnp.clip(jnp.floor(vf + 0.5), 0, maxv)

    # every output of yuv_planes_to_rgb contains the luma term, so r/g/b
    # are already broadcast to the full (.., 2, Hc, W) phase shape
    r, g, b = yuv_planes_to_rgb(
        yf, uf, vf, cfg.matrix_in, cfg.in_depth, cfg.work_full_range
    )
    if cfg.apply_lut and prep is not None:
        r, g, b = apply_lut_planes(
            r, g, b, prep, cfg.interp, strategy=cfg.lut_strategy,
            precision=cfg.lut_precision, interpret=interpret,
            operands=lut_operands,
        )
    yo, uo, vo = rgb_to_yuv_planes_tpu(
        r, g, b, cfg.matrix_out, cfg.out_depth, cfg.out_full_range
    )

    # 2x2 box downsample == lane adds per phase, then the phase add — the
    # exact add grouping of chroma_downsample_420 on the full-res plane.
    def _down(c):
        a = c[..., :, 0::2] + c[..., :, 1::2]
        return (a[..., 0, :, :] + a[..., 1, :, :]) * 0.25

    uo, vo = _down(uo), _down(vo)

    def _ilv(e, o):
        hc, w = e.shape[-2], e.shape[-1]
        return jnp.stack([e, o], axis=-2).reshape(e.shape[:-2] + (2 * hc, w))

    ye, yod = yo[..., 0, :, :], yo[..., 1, :, :]
    yq_e = quantize_plane(ye, cfg.out_depth, cfg.dither, plane_seed=1,
                          row_stride=2, row_offset=0)
    yq_o = quantize_plane(yod, cfg.out_depth, cfg.dither, plane_seed=1,
                          row_stride=2, row_offset=1)
    uq = quantize_plane(uo, cfg.out_depth, cfg.dither, plane_seed=2)
    vq = quantize_plane(vo, cfg.out_depth, cfg.dither, plane_seed=3)
    return _ilv(yq_e, yq_o), uq, vq


def render_yuv_frame(
    y, u, v,
    prep: Optional[PreparedLut],
    cfg: RenderConfig,
    interpret: bool = False,
    lut_operands=None,
    resize_weights=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One frame through the fused pipeline. Inputs are integer code-value
    planes (uint8/uint16) at cfg.in_depth with cfg.in_subsampling chroma.
    lut_operands: optional table-operand dict (lut3d.kernel_operands) so the
    jitted program stays LUT-agnostic — see make_render_fn.
    resize_weights: optional (Wv, Wh) pair for cfg.resize passed as jit
    arguments (make_render_fn); when None they trace as constants."""
    if _fused420_applicable(y, u, cfg, prep):
        from .fused420 import render_fused420

        return render_fused420(y, u, v, prep, cfg, interpret, lut_operands)
    if _rowphase_applicable(y, u, cfg):
        return _render_rowphase_420(y, u, v, prep, cfg, interpret,
                                    lut_operands)
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # 1. range normalization in YUV space (pc -> work range), matching the
    #    reference's scale=in_range:out_range step placement before the LUT.
    yf, uf, vf = range_normalize(
        yf, uf, vf, cfg.in_depth, cfg.in_full_range, cfg.work_full_range
    )
    if cfg.requantize_intermediate and cfg.in_full_range != cfg.work_full_range:
        maxv = float((1 << cfg.in_depth) - 1)
        yf = jnp.clip(jnp.floor(yf + 0.5), 0, maxv)
        uf = jnp.clip(jnp.floor(uf + 0.5), 0, maxv)
        vf = jnp.clip(jnp.floor(vf + 0.5), 0, maxv)

    # 2. chroma to 4:4:4
    uf, vf = _upsample(uf, vf, cfg.in_subsampling, cfg.chroma_up)

    # 3. YUV -> RGB [0,1]
    r, g, b = yuv_planes_to_rgb(
        yf, uf, vf, cfg.matrix_in, cfg.in_depth, cfg.work_full_range
    )

    # 4. 3D LUT on the MXU
    if cfg.apply_lut and prep is not None:
        r, g, b = apply_lut_planes(
            r, g, b, prep, cfg.interp, strategy=cfg.lut_strategy,
            precision=cfg.lut_precision, interpret=interpret,
            operands=lut_operands,
        )

    # 4b. optional resolution change (policy `-s`): swscale-matched bicubic
    # as two MXU matmuls per plane (ops.resample; parity-tested against the
    # bundled libswscale in tests/test_resample.py)
    if cfg.resize is not None:
        rw, rh = cfg.resize
        wv, wh = (resize_weights if resize_weights is not None
                  else resample_weights(r.shape[-2:], (rh, rw)))
        r = resample_plane(r, wv, wh)
        g = resample_plane(g, wv, wh)
        b = resample_plane(b, wv, wh)

    # 5. RGB -> YUV at output depth/range/matrix
    yo, uo, vo = rgb_to_yuv_planes_tpu(
        r, g, b, cfg.matrix_out, cfg.out_depth, cfg.out_full_range
    )

    # 6. chroma subsample (on float values, pre-quantization)
    uo, vo = _downsample(uo, vo, cfg.out_subsampling)

    # 7. quantize (+ ordered dither if requested). "error_diffusion_host"
    # defers quantization: float planes return to the host where the native
    # Floyd-Steinberg pass (serial, CPU) finishes the job — see
    # engine.executor and native_ext.error_diffusion_quantize.
    if cfg.dither == "error_diffusion_host":
        return yo, uo, vo
    # distinct plane seeds decorrelate the "random" dither across Y/U/V
    yq = quantize_plane(yo, cfg.out_depth, cfg.dither, plane_seed=1)
    uq = quantize_plane(uo, cfg.out_depth, cfg.dither, plane_seed=2)
    vq = quantize_plane(vo, cfg.out_depth, cfg.dither, plane_seed=3)
    return yq, uq, vq


def lut_operands_for(prep: Optional[PreparedLut], cfg: RenderConfig):
    """The LUT table operands for this (prep, cfg) as numpy arrays, or None
    when no LUT applies. Passing these as jit arguments (device_put once)
    keeps compiled programs LUT-AGNOSTIC: any .cube of the same size/tier
    reuses the program, so a warmed persistent cache serves never-seen LUTs
    with zero compiles (the serving story; engine.warmup)."""
    if prep is None or not cfg.apply_lut:
        return None
    if cfg.lut_strategy == "gather":
        return {"table": prep.table}
    from .lut3d import kernel_operands

    return kernel_operands(prep, cfg.interp, cfg.lut_precision)


def prep_static_key(prep: Optional[PreparedLut], cfg: RenderConfig):
    """Everything about a PreparedLut that a traced render program depends
    on BESIDES the table values (which ride as runtime operands): size,
    padded geometry, the per-LUT resolved tier, and the domain mapping
    (baked as scalars). Two LUTs agreeing on this key share one jitted
    function and one compiled program."""
    if prep is None or not cfg.apply_lut:
        return None
    tier = (prep.resolve_precision(cfg.interp, cfg.lut_precision)
            if cfg.lut_strategy == "mxu" else "gather")
    return (
        prep.size,
        prep.rows_pad,
        tier,
        prep.quad_widths,
        prep.resid_quad_widths,
        None if prep.coarse is None else (prep.coarse.size,
                                          prep.coarse.rows_pad,
                                          prep.coarse.quad_widths),
        tuple(float(v) for v in prep.domain_min),
        tuple(float(v) for v in prep.domain_max),
    )


# jitted render fns keyed by (cfg, interpret, prep_static_key): a new LUT of
# an already-seen size/tier reuses the jitted fn outright — no retrace, no
# compile, only a device_put of its table operands (the serving fast path).
# Bounded FIFO: each entry's closure pins one PreparedLut (tens of MB at
# 65^3), so a long-lived daemon over many size/tier/cfg combos must not
# grow without limit; evicted fns fall back to the persistent XLA cache.
_RENDER_FN_CACHE: dict = {}
_RENDER_FN_CACHE_MAX = 32
# concurrent TaskRunners (daemon concurrency > 1) and parallel warmup
# threads all reach this cache; the FIFO eviction loop is not atomic
import threading as _threading

_RENDER_FN_CACHE_LOCK = _threading.Lock()


def make_render_fn(prep: Optional[PreparedLut], cfg: RenderConfig,
                   batched: bool = True, interpret: bool = False):
    """Build a jitted render function.

    The pipeline is batch-polymorphic by construction (all planar ops work on
    trailing (H, W) axes and the LUT kernel flattens pixels), so batched
    (B, H, W) / (B, Hc, Wc) inputs flow through the SAME code path as single
    frames — no vmap-over-pallas_call needed (which also sidesteps a Mosaic
    batching lowering failure observed on the chip).

    The LUT table operands ride as a jit ARGUMENT (device_put once here),
    not as baked constants, so the compiled program depends only on shapes,
    LUT size, tier, interp, and domain — not the table values — and the
    jitted function itself is cached across LUTs (prep_static_key)."""
    del batched  # retained for API compatibility; shape-polymorphic anyway
    ops_np = lut_operands_for(prep, cfg)
    if ops_np is None and cfg.resize is None:
        fn = functools.partial(render_yuv_frame, prep=prep, cfg=cfg,
                               interpret=interpret)
        return jax.jit(lambda y, u, v: fn(y, u, v))
    key = (cfg, interpret, prep_static_key(prep, cfg))
    with _RENDER_FN_CACHE_LOCK:
        jitted = _RENDER_FN_CACHE.get(key)
        if jitted is None:
            fn = functools.partial(render_yuv_frame, prep=prep, cfg=cfg,
                                   interpret=interpret)
            jitted = jax.jit(
                lambda y, u, v, ops, rsw: fn(y, u, v, lut_operands=ops,
                                             resize_weights=rsw))
            while len(_RENDER_FN_CACHE) >= _RENDER_FN_CACHE_MAX:
                _RENDER_FN_CACHE.pop(next(iter(_RENDER_FN_CACHE)))
            _RENDER_FN_CACHE[key] = jitted
    ops_dev = None if ops_np is None else jax.device_put(ops_np)
    if cfg.resize is None:
        return lambda y, u, v: jitted(y, u, v, ops_dev, None)

    # Resize weight matrices depend on the INPUT luma shape (known only at
    # call time); ride as jit args — device_put once per shape — so resize
    # programs stay free of multi-MB weight constants (118 MB at 8K).
    rsw_cache: dict = {}

    def call(y, u, v):
        hw = (int(y.shape[-2]), int(y.shape[-1]))
        rsw = rsw_cache.get(hw)
        if rsw is None:
            rw, rh = cfg.resize
            rsw = jax.device_put(resample_weights(hw, (rh, rw)))
            rsw_cache[hw] = rsw
        return jitted(y, u, v, ops_dev, rsw)

    return call
