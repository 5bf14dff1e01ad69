"""Fully-fused YUV->YUV render kernel: planar YUV in -> planar YUV out in ONE
Pallas call (pre/post pixel glue folded into the LUT kernel), covering every
nearest-sited {420,422,444}-in -> {420,422,444}-out geometry — including the
reference's pro-mastering 422p10le stages (ffmpeg.py:417-472).

The row-phase layout (render._render_rowphase_420) made the 420 glue cheap at
the XLA level; this folds it into the MXU kernel itself and removes the
remaining full-res HBM round trips (the f32 RGB planes in and the (8, P) f32
kernel output) plus the XLA-side y interleave:

  * grid = (batch, H/2): one y phase-row PAIR per step. y rides as a
    (B, H/2, 2, W) layout-identity reshape so the block shape satisfies
    Mosaic's tiling constraint with only static in-kernel indices.
  * chroma is pre-dupped in XLA on the INTEGER plane (u8/u16 lane repeat —
    the one interleave XLA must still do) and read at (1, W) for 420
    sources (one chroma row per y row pair) or (2, W) for 422/444 sources
    (one per y row).
  * per phase row: integer->f32 convert, range normalization (+ the
    reference's 8-bit intermediate requantize), YUV->RGB matrix, the
    UNCHANGED hoisted-dot quad bodies (every tier: int8_lite/int8_fast/
    fast/exact/coarse2*) at bm = a lane chunk of W, RGB->YUV, ordered/
    random dither and quantization — all in VMEM.
  * the QUANTIZED INTERLEAVED y plane is written directly at its absolute
    row (uint16 always; XLA casts to uint8 for 8-bit outputs).
  * output chroma leaves as 4 full-width f32 phase planes; XLA finishes
    the downsample with the production add grouping — the 2x2 box for 420
    out (per-phase lane pair adds, then the phase add), the lane-pair
    0.5-mean + row interleave for 422 out, a straight row interleave for
    444 out. Lane-STRIDED reads are Mosaic poison but XLA runs them at
    noise level.
  * widths that are not a multiple of 128 lanes (DCI 3996/1998) are edge-
    padded to the next multiple and cropped after the kernel; all math is
    columnwise so real outputs never read padded columns.

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
for the nearest-sited subsampling family, including both pro-mastering
stages (LUT -> yuv422p10le master, master -> distribution 420); resized /
bilinear-sited / error-diffusion outputs take the XLA paths in ops.render.
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
    _coarse2_bm,
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
    when no such divisor exists (render_fused420 pads width to a multiple
    of 128 before calling)."""
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
                 requant, dither, matrix_in, matrix_out, W, chunk, n_tabs,
                 in_pair=False):
    """in_pair: chroma input carries one row per y row (422/444 sources,
    block (1,1,2,W)) instead of one shared row per y row PAIR (420)."""
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
        if not in_pair:
            uf_all = (u_ref[0, 0, 0, :].reshape(1, W)
                      .astype(jnp.int32).astype(jnp.float32))
            vf_all = (v_ref[0, 0, 0, :].reshape(1, W)
                      .astype(jnp.int32).astype(jnp.float32))
        for p in range(2):
            if in_pair:
                uf_all = (u_ref[0, 0, p, :].reshape(1, W)
                          .astype(jnp.int32).astype(jnp.float32))
                vf_all = (v_ref[0, 0, p, :].reshape(1, W)
                          .astype(jnp.int32).astype(jnp.float32))
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
    """The fused YUV->YUV kernel covers every {420,422,444}-in ->
    {420,422,444}-out nearest-sited geometry (chroma_up only matters for
    420 sources; 422->444 up is always the lane repeat, ops.pixel) when an
    MXU-strategy LUT is actually in play. Non-128-multiple widths
    (DCI 3996/1998 class) are handled by edge pad + crop inside
    render_fused420, so width is no longer a gate."""
    if not (
        cfg.resize is None
        and cfg.dither != "error_diffusion_host"
        and cfg.apply_lut
        and prep is not None
        and cfg.lut_strategy == "mxu"
        and y.ndim >= 2
    ):
        return False
    # N >= 97 class: a LUT whose every kernel tier exceeds VMEM resolves
    # to the XLA gather path (prepare.resolve_precision) — no fused kernel
    if prep.resolve_precision(cfg.interp, cfg.lut_precision) == "gather":
        return False
    # N > 97: the fused kernel's in-kernel glue on top of the table
    # operand kills the Mosaic compile at 129 even at the smallest chunk
    # (measured round 5, experiments/r8_bigcube.py: the PLAIN-layout LUT
    # kernel compiles at bm=256, every fused variant dies in the compile
    # helper) — big cubes take the rowphase/plain layout instead
    if prep.size > 97:
        return False
    in_sub, out_sub = cfg.in_subsampling, cfg.out_subsampling
    if in_sub not in ("420", "422", "444") or out_sub not in ("420", "422",
                                                              "444"):
        return False
    if in_sub == "420" and cfg.chroma_up != "nearest":
        return False
    H, W = int(y.shape[-2]), int(y.shape[-1])
    if H % 2:  # grid walks y row PAIRS
        return False
    if W % 2 and (in_sub != "444" or out_sub != "444"):
        return False
    eh = H // 2 if in_sub == "420" else H
    ew = W // 2 if in_sub in ("420", "422") else W
    return int(u.shape[-2]) == eh and int(u.shape[-1]) == ew


def render_fused420(y, u, v, prep, cfg, interpret=False, lut_operands=None):
    """One fused-kernel render of a (batched) frame in any nearest-sited
    {420,422,444} -> {420,422,444} geometry. Same value contract as the
    plain XLA pipeline (render.render_yuv_frame); operands ride as jit
    arguments so compiled programs stay LUT-agnostic.

    Widths that are not a multiple of 128 lanes (DCI 3996/1998 class) are
    edge-padded to the next multiple before the kernel and cropped after —
    every real output column is computed from real input columns only (all
    per-pixel math is columnwise; the chroma lane-pair adds align to even
    columns and W is even whenever chroma is subsampled)."""
    lead = y.shape[:-2]
    H, W = int(y.shape[-2]), int(y.shape[-1])
    in_sub, out_sub = cfg.in_subsampling, cfg.out_subsampling
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
    target = (_coarse2_bm(n) if tier.startswith("coarse")
              else _block_pixels(n, tier, n_passes))
    Wp = -(-W // 128) * 128  # lane-padded kernel width
    chunk = _lane_chunk(Wp, target)
    in_pair = in_sub != "420"

    kernel = _make_kernel(
        tier, cfg.interp, n, m, prep.quad_widths, cwidths,
        prep.resid_quad_widths, dmin, dmax,
        cfg.in_depth, cfg.out_depth, cfg.in_full_range, cfg.work_full_range,
        cfg.out_full_range, cfg.requantize_intermediate, cfg.dither,
        cfg.matrix_in, cfg.matrix_out, Wp, chunk, len(tabs),
        in_pair=in_pair)

    tab_specs = [
        pl.BlockSpec(t.shape, (lambda bb, jj, nd=t.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for t in tabs
    ]
    cin = 2 if in_pair else 1
    in_specs = [
        pl.BlockSpec((1, 1, 2, Wp), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin, Wp), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin, Wp), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + tab_specs
    extra = []
    if cfg.dither == "ordered":
        pat16 = bayer_offsets(4)
        reps = -(-Wp // pat16.shape[1])
        pat_w = np.tile(pat16, (1, reps))[:, :Wp]  # (16, Wp) f32
        extra = [jnp.asarray(pat_w.reshape(8, 2, Wp))]
        # block (1, 2, Wp) selecting the (2j, 2j+1) % 16 pattern row pair
        in_specs.append(
            pl.BlockSpec((1, 2, Wp), lambda bb, jj: (jj % 8, 0, 0),
                         memory_space=pltpu.VMEM))

    out_specs = [
        pl.BlockSpec((1, 1, 2, Wp), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, 1, 1, Wp), lambda bb, jj: (bb, jj, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_shape = [jax.ShapeDtypeStruct((B, H // 2, 2, Wp), jnp.uint16)] + [
        jax.ShapeDtypeStruct((B, H // 2, 1, Wp), jnp.float32)
        for _ in range(4)
    ]

    call = pl.pallas_call(
        kernel,
        grid=(B, H // 2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    def _pad_lanes(x):
        if x.shape[-1] == Wp:
            return x
        pad = [(0, 0)] * (x.ndim - 1) + [(0, Wp - x.shape[-1])]
        return jnp.pad(x, pad, mode="edge")

    # y rides as (B, H/2, 2, Wp) — a layout identity when unpadded
    y3 = y.reshape(B, H, W)
    y4 = _pad_lanes(y3).reshape(B, H // 2, 2, Wp)
    Hc_in = H // 2 if in_sub == "420" else H
    Wc_in = W // 2 if in_sub in ("420", "422") else W
    u2, v2 = u.reshape(B, Hc_in, Wc_in), v.reshape(B, Hc_in, Wc_in)
    if in_sub in ("420", "422"):
        # the one interleave XLA must do: lane-dup on the INTEGER plane
        u2 = jnp.repeat(u2, 2, axis=-1)
        v2 = jnp.repeat(v2, 2, axis=-1)
    ud = _pad_lanes(u2).reshape(B, H // 2, cin, Wp)
    vd = _pad_lanes(v2).reshape(B, H // 2, cin, Wp)
    yq16, u0, u1, v0, v1 = call(y4, ud, vd, *tabs, *extra)

    yq = yq16.reshape(B, H, Wp)[..., :W]
    if cfg.out_depth <= 8:
        yq = yq.astype(jnp.uint8)
    u0, u1 = u0.reshape(B, H // 2, Wp), u1.reshape(B, H // 2, Wp)
    v0, v1 = v0.reshape(B, H // 2, Wp), v1.reshape(B, H // 2, Wp)

    def _ilv(e, o):
        # row-interleave two (B, H/2, w) phase planes -> (B, H, w)
        return jnp.stack([e, o], axis=-2).reshape(B, H, e.shape[-1])

    if out_sub == "420":
        def down(c0, c1):
            # production grouping (pixel.chroma_downsample_420 on the
            # full-res plane == per-phase lane pair adds, then the phase add)
            a0 = c0[..., :W][..., 0::2] + c0[..., :W][..., 1::2]
            a1 = c1[..., :W][..., 0::2] + c1[..., :W][..., 1::2]
            return (a0 + a1) * 0.25

        uq = quantize_plane(down(u0, u1), cfg.out_depth, cfg.dither,
                            plane_seed=2)
        vq = quantize_plane(down(v0, v1), cfg.out_depth, cfg.dither,
                            plane_seed=3)
        shape_c = lead + (H // 2, W // 2)
    else:
        if out_sub == "422":
            # pixel.chroma_downsample_422's exact lane grouping, per phase
            def hdown(c):
                c = c[..., :W]
                return (c[..., 0::2] + c[..., 1::2]) * 0.5
        else:  # 444: the f32 phase planes ARE the output chroma rows
            def hdown(c):
                return c[..., :W]
        wq = W // 2 if out_sub == "422" else W

        def q2(c0, c1, seed):
            # per-phase quantize with row-mapped dither offsets (plane row
            # r of phase p == absolute chroma row 2r+p) -> bit-identical
            # to quantizing the interleaved full-height plane
            q0 = quantize_plane(hdown(c0), cfg.out_depth, cfg.dither,
                                plane_seed=seed, row_stride=2, row_offset=0)
            q1 = quantize_plane(hdown(c1), cfg.out_depth, cfg.dither,
                                plane_seed=seed, row_stride=2, row_offset=1)
            return _ilv(q0, q1)

        uq = q2(u0, u1, 2)
        vq = q2(v0, v1, 3)
        shape_c = lead + (H, wq)
    shape_y = lead + (H, W)
    return (yq.reshape(shape_y), uq.reshape(shape_c),
            vq.reshape(shape_c))
