"""Fully-fused 420->420 render kernel: planar YUV in -> planar YUV out in ONE
Pallas call (pre/post pixel glue folded into the LUT kernel).

The row-phase layout (render._render_rowphase_420) made the 420 glue cheap at
the XLA level; this folds it into the MXU kernel itself and removes the
remaining full-res HBM round trips (the f32 RGB planes in and the (8, P) f32
kernel output) plus the XLA-side y interleave:

  * grid = (batch, H/2): one y phase-row PAIR per step. y rides as a
    (B, H/2, 2, W) layout-identity reshape so the block shape satisfies
    Mosaic's tiling constraint with only static in-kernel indices.
  * chroma is pre-dupped in XLA on the INTEGER plane (u8/u16 lane repeat —
    the one interleave XLA must still do) and read at (1, W).
  * per phase row: integer->f32 convert, range normalization (+ the
    reference's 8-bit intermediate requantize), YUV->RGB matrix, the
    UNCHANGED hoisted-dot quad bodies (every tier: int8_lite/int8_fast/
    fast/exact/coarse2*) at bm = a lane chunk of W, RGB->YUV, ordered/
    random dither and quantization — all in VMEM.
  * the QUANTIZED INTERLEAVED y plane is written directly at its absolute
    row (uint16 always; XLA casts to uint8 for 8-bit outputs).
  * output chroma leaves as 4 full-width f32 phase planes; XLA finishes the
    2x2 box with the production add grouping (per-phase lane pair adds,
    then the phase add) — lane-STRIDED reads are Mosaic poison but XLA runs
    them at noise level.

Measured on v5e (experiments/r5_fused_yuv.py): 4K 33^3 int8_lite fused frame
19.94 -> 16.50 ms (-17%), 8K 81.3 -> 66.6 ms (-18%) — within sync noise of
the kernel-only chain, i.e. the glue cost is ~gone. Parity vs the XLA path:
the same scalar ops on the same values, but compiled as one unit, so FMA
contraction (--xla_allow_excess_precision=true is pinned in this
environment) may differ from the op-by-op path — max |d| = 1 output code
value at ~1e-5 pixel rate on the chip (~1e-4 under interpret), far inside
every tier's dE76 budget. tests/test_render_fused420.py asserts the bound
across tiers/depths/ranges/dithers/interps; phase_layout="rowphase" forces
the bit-exact-vs-plain XLA layout where exactness is required.

Reference scope: this is the fused-execution twin of the FFmpeg filter chain
scale/format -> lut3d -> format (src/lut_renderer/ffmpeg.py:195-247,304-310)
for the 4:2:0 nearest-sited fast path; other geometries take the XLA paths
in ops.render.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..colorcore import matrices as cm
from ..colorcore.dither import bayer_offsets
from .lut3d import (
    _COARSE2_BM,
    _block_pixels,
    _bf16_quad_body,
    _fine_taps_remapped,
    _int8_quad_body,
    _resid_quad_body,
    kernel_operands,
)
from .pixel import quantize_plane, range_normalize

# murmur3-finalizer constants of pixel.hash_noise_offsets_jnp, as wrapped
# int32 (Mosaic i32 mul/xor wrap like u32; logical right shifts keep the
# bit pattern identical to the uint32 reference)
_H1 = np.uint32(0x9E3779B1).astype(np.int32)
_H2 = np.uint32(0x85EBCA77).astype(np.int32)
_H3 = np.uint32(0xC2B2AE3D).astype(np.int32)
_M1 = np.uint32(0x7FEB352D).astype(np.int32)
_M2 = np.uint32(0x846CA68B).astype(np.int32)


def _hash_offsets_row(abs_row, width: int, col0: int, plane_seed: int):
    """(1, width) dither offsets for absolute row `abs_row` (traced i32
    scalar), columns col0..col0+width — bit-identical to
    pixel.hash_noise_offsets_jnp (verified in tests/test_render_fused420)."""
    shr = jax.lax.shift_right_logical
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) + col0
    x = (abs_row * _H1) ^ (cols * _H2) ^ (np.int32(plane_seed) * _H3)
    x = x ^ shr(x, 16)
    x = x * _M1
    x = x ^ shr(x, 15)
    x = x * _M2
    x = x ^ shr(x, 16)
    return (shr(x, 8).astype(jnp.float32) * jnp.float32(2.0**-24)
            - jnp.float32(0.5))


def _lane_chunk(width: int, target: int) -> int:
    """Largest divisor of `width` that is a multiple of 128 and <= target
    (bm for the in-kernel quad-body calls). Falls back to `width` itself
    when no such divisor exists (callers gate on width % 128 == 0)."""
    if width <= target:
        return width
    best = width
    c = (target // 128) * 128
    while c >= 128:
        if width % c == 0:
            return c
        c -= 128
    return best


def _acc_from_rgb(tier, interp, n, m, widths, cwidths, rwidths,
                  dmin, dmax, rgb3, tabs):
    """rgb rows (3, bm) -> acc [3 x (bm,)] via the tier's unchanged hoisted-
    dot bodies (ops.lut3d). `tabs` = the tier's table refs in launch order."""
    if tier.startswith("coarse"):
        resid_interp = ("trilinear"
                        if tier.endswith("_tri") and interp != "trilinear"
                        else interp)
        coarse_mode = ("exact" if tier.startswith("coarse2x")
                       else "fast" if tier.startswith("coarse2f")
                       else "int8_fast")
        lr, sr, lc, sc = tabs
        idxf, wallf, np_f = _fine_taps_remapped(rgb3, n, n, resid_interp,
                                                dmin, dmax)
        acc = _resid_quad_body(n, np_f, rwidths, idxf, wallf, lr, sr)
        idxc, wallc, np_c = _fine_taps_remapped(rgb3, n, m, interp,
                                                dmin, dmax)
        if coarse_mode == "int8_fast":
            return _int8_quad_body(m, np_c, cwidths, idxc, wallc, lc, sc,
                                   acc)
        return _bf16_quad_body(m, np_c, coarse_mode == "exact", cwidths,
                               idxc, wallc, lc, acc)
    idx, wall, np_ = _fine_taps_remapped(rgb3, n, n, interp, dmin, dmax)
    if tier in ("int8", "int8_fast", "int8_lite"):
        lq, sv = tabs
        return _int8_quad_body(n, np_, widths, idx, wall, lq, sv,
                               pair=tier != "int8_lite")
    (la,) = tabs
    return _bf16_quad_body(n, np_, tier != "fast", widths, idx, wall, la)


def _make_kernel(tier, interp, n, m, widths, cwidths, rwidths, dmin, dmax,
                 in_depth, out_depth, in_full, work_full, out_full,
                 requant, dither, matrix_in, matrix_out, W, chunk, n_tabs):
    n_chunks = W // chunk
    maxv_out = float((1 << out_depth) - 1)
    maxv_in = float((1 << in_depth) - 1)

    def kernel(*refs):
        y_ref, u_ref, v_ref = refs[:3]
        tabs = refs[3:3 + n_tabs]
        pos = 3 + n_tabs
        pat_ref = refs[pos] if dither == "ordered" else None
        pos += 1 if dither == "ordered" else 0
        yq_ref, u0_ref, u1_ref, v0_ref, v1_ref = refs[pos:pos + 5]

        j = pl.program_id(1)
        uf_all = (u_ref[0, 0, 0, :].reshape(1, W)
                  .astype(jnp.int32).astype(jnp.float32))
        vf_all = (v_ref[0, 0, 0, :].reshape(1, W)
                  .astype(jnp.int32).astype(jnp.float32))
        for p in range(2):
            yf_all = (y_ref[0, 0, p, :].reshape(1, W)
                      .astype(jnp.int32).astype(jnp.float32))
            for k in range(n_chunks):
                sl = slice(k * chunk, (k + 1) * chunk)
                yf, uf, vf = yf_all[:, sl], uf_all[:, sl], vf_all[:, sl]
                if in_full != work_full:
                    yf, uf, vf = range_normalize(yf, uf, vf, in_depth,
                                                 in_full, work_full)
                    if requant:
                        yf = jnp.clip(jnp.floor(yf + 0.5), 0, maxv_in)
                        uf = jnp.clip(jnp.floor(uf + 0.5), 0, maxv_in)
                        vf = jnp.clip(jnp.floor(vf + 0.5), 0, maxv_in)
                rr, gg, bb = cm.yuv_to_rgb_planes(
                    yf, uf, vf, matrix_in, in_depth, work_full, xp=jnp)
                rgb3 = jnp.concatenate([rr, gg, bb], axis=0)
                acc = _acc_from_rgb(tier, interp, n, m, widths, cwidths,
                                    rwidths, dmin, dmax, rgb3, tabs)
                yo, uo, vo = cm.rgb_to_yuv_planes(
                    acc[0], acc[1], acc[2], matrix_out, out_depth,
                    out_full, xp=jnp)
                yo = yo.reshape(1, chunk)
                if dither == "ordered":
                    yo = yo + pat_ref[0, p, sl].reshape(1, chunk)
                elif dither == "random":
                    yo = yo + _hash_offsets_row(2 * j + p, chunk, k * chunk,
                                                plane_seed=1)
                yq = jnp.clip(jnp.floor(yo + 0.5), 0, maxv_out)
                yq_ref[0, 0, p, sl] = (
                    yq.reshape(chunk).astype(jnp.int32).astype(jnp.uint16))
                up_ref = u0_ref if p == 0 else u1_ref
                vp_ref = v0_ref if p == 0 else v1_ref
                up_ref[0, 0, 0, sl] = uo.reshape(chunk)
                vp_ref[0, 0, 0, sl] = vo.reshape(chunk)

    return kernel


def _tier_tables(prep, tier, ops):
    """Table operand jnp arrays + their (rows, cols) for the launch specs,
    matching lut3d._run_fused / _run_coarse2_fused exactly."""
    if tier.startswith("coarse"):
        coarse_mode = ("exact" if tier.startswith("coarse2x")
                       else "fast" if tier.startswith("coarse2f")
                       else "int8_fast")
        lc_dt = jnp.int8 if coarse_mode == "int8_fast" else jnp.bfloat16
        tabs = [jnp.asarray(ops["lr"], jnp.int8),
                jnp.asarray(ops["sr"], jnp.float32),
                jnp.asarray(ops["lc"], lc_dt),
                jnp.asarray(ops["sc"], jnp.float32)]
    elif tier in ("int8", "int8_fast", "int8_lite"):
        tabs = [jnp.asarray(ops["lq"], jnp.int8),
                jnp.asarray(ops["sv"], jnp.float32)]
    else:
        tabs = [jnp.asarray(ops["la"], jnp.bfloat16)]
    return tabs


def fused420_applicable(y, u, cfg, prep) -> bool:
    """The fused YUV->YUV kernel covers the 420->420 nearest-sited class
    (the rowphase gate) when an MXU-strategy LUT is actually in play and
    the width is lane-tileable."""
    return (
        cfg.in_subsampling == "420"
        and cfg.out_subsampling == "420"
        and cfg.chroma_up == "nearest"
        and cfg.resize is None
        and cfg.dither != "error_diffusion_host"
        and cfg.apply_lut
        and prep is not None
        and cfg.lut_strategy == "mxu"
        and y.ndim >= 2
        and y.shape[-2] == 2 * u.shape[-2]
        and y.shape[-1] == 2 * u.shape[-1]
        and y.shape[-2] % 2 == 0
        and y.shape[-1] % 128 == 0
    )


def render_fused420(y, u, v, prep, cfg, interpret=False, lut_operands=None):
    """One fused-kernel render of a (batched) 420 frame. Same contract as
    render._render_rowphase_420; operands ride as jit arguments so compiled
    programs stay LUT-agnostic."""
    lead = y.shape[:-2]
    H, W = int(y.shape[-2]), int(y.shape[-1])
    Hc, Wc = H // 2, W // 2
    B = 1
    for d in lead:
        B *= int(d)

    tier = prep.resolve_precision(cfg.interp, cfg.lut_precision)
    ops = (lut_operands if lut_operands is not None
           else kernel_operands(prep, cfg.interp, cfg.lut_precision))
    tabs = _tier_tables(prep, tier, ops)
    n = prep.size
    m = prep.coarse.size if (tier.startswith("coarse")
                             and prep.coarse is not None) else 0
    cwidths = prep.coarse.quad_widths if m else ()
    dmin = tuple(float(x) for x in prep.domain_min)
    dmax = tuple(float(x) for x in prep.domain_max)

    n_passes = 1 if cfg.interp in ("nearest", "trilinear") else 2
    target = (_COARSE2_BM if tier.startswith("coarse")
              else _block_pixels(n, tier, n_passes))
    chunk = _lane_chunk(W, target)

    kernel = _make_kernel(
        tier, cfg.interp, n, m, prep.quad_widths, cwidths,
        prep.resid_quad_widths, dmin, dmax,
        cfg.in_depth, cfg.out_depth, cfg.in_full_range, cfg.work_full_range,
        cfg.out_full_range, cfg.requantize_intermediate, cfg.dither,
        cfg.matrix_in, cfg.matrix_out, W, chunk, len(tabs))

    tab_specs = [
        pl.BlockSpec(t.shape, (lambda bb, jj, nd=t.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for t in tabs
    ]
    in_specs = [
        pl.BlockSpec((1, 1, 2, W), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, W), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, W), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + tab_specs
    extra = []
    if cfg.dither == "ordered":
        pat16 = bayer_offsets(4)
        reps = -(-W // pat16.shape[1])
        pat_w = np.tile(pat16, (1, reps))[:, :W]  # (16, W) f32
        extra = [jnp.asarray(pat_w.reshape(8, 2, W))]
        # block (1, 2, W) selecting the (2j, 2j+1) % 16 pattern row pair
        in_specs.append(
            pl.BlockSpec((1, 2, W), lambda bb, jj: (jj % 8, 0, 0),
                         memory_space=pltpu.VMEM))

    out_specs = [
        pl.BlockSpec((1, 1, 2, W), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, 1, 1, W), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_shape = [jax.ShapeDtypeStruct((B, H // 2, 2, W), jnp.uint16)] + [
        jax.ShapeDtypeStruct((B, Hc, 1, W), jnp.float32) for _ in range(4)
    ]

    call = pl.pallas_call(
        kernel,
        grid=(B, H // 2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    y4 = y.reshape(B, H // 2, 2, W)
    ud = jnp.repeat(u.reshape(B, Hc, Wc), 2, axis=-1).reshape(B, Hc, 1, W)
    vd = jnp.repeat(v.reshape(B, Hc, Wc), 2, axis=-1).reshape(B, Hc, 1, W)
    yq16, u0, u1, v0, v1 = call(y4, ud, vd, *tabs, *extra)

    yq = yq16.reshape(B, H, W)
    if cfg.out_depth <= 8:
        yq = yq.astype(jnp.uint8)
    u0, u1 = u0.reshape(B, Hc, W), u1.reshape(B, Hc, W)
    v0, v1 = v0.reshape(B, Hc, W), v1.reshape(B, Hc, W)

    def down(c0, c1):
        # production grouping (pixel.chroma_downsample_420 on the full-res
        # plane == per-phase lane pair adds, then the phase add)
        a0 = c0[..., 0::2] + c0[..., 1::2]
        a1 = c1[..., 0::2] + c1[..., 1::2]
        return (a0 + a1) * 0.25

    uq = quantize_plane(down(u0, u1), cfg.out_depth, cfg.dither,
                        plane_seed=2)
    vq = quantize_plane(down(v0, v1), cfg.out_depth, cfg.dither,
                        plane_seed=3)
    shape_y = lead + (H, W)
    shape_c = lead + (Hc, Wc)
    return (yq.reshape(shape_y), uq.reshape(shape_c),
            vq.reshape(shape_c))
