"""TPU 3D-LUT application: factorized one-hot MXU matmul kernel (Pallas).

Replaces FFmpeg's `lut3d` filter (the reference's pixel engine, argv-injected
at src/lut_renderer/ffmpeg.py:242-247) with a TPU-native formulation.

Why a matmul: on TPU, native gathers run at scalar-unit speed (~100M idx/s
measured — experiments/FINDINGS.md), so per-pixel table lookups are expressed
as dense contractions on the MXU instead. Interpolation weights fold into
per-axis "tap vectors" (<=2 nonzeros each); the (g, b) axes contract jointly
as an outer product against the prebaked LUT matrix; the r axis contracts on
the VPU. Exact decomposition per interp mode:

  nearest     1 pass, all axes one-hot at NEAR(x) = trunc(x + 0.5)
  trilinear   1 pass, each axis tapped (1-d) at prev, d at next
  tetrahedral 2 passes (exact rank-2 split of FFmpeg's 6-case scheme):
              pass 1 covers corner pair {c000, c_step1}: the MAX-delta axis
              taps (1-dmax) at prev and (dmax-dmid) at next, the other axes
              are one-hot at prev; pass 2 covers {c_step2, c111}: the MIN
              axis taps (dmid-dmin) at prev and dmin at next, the others are
              one-hot at next
  pyramid     2 passes: bilinear over two axes on the small-delta axis's
              prev plane; then X-taps (-dX, +dX) with the others one-hot next
  prism       2 passes: triangle over (r, b) split per r tap, linear g

Numerics: every tier rides the HOISTED-DOT structure (_int8_quad_body /
_bf16_quad_body): the W operand is a pass-independent 0/1 one-hot quadrant
mask, the dots run once per block, and exact f32 weights apply post-dot.
The production int8 tier is near-exact (table-pair quantization only,
~rowmax*1.6e-5; dE76 vs FFmpeg lut3d ~3e-4); "exact" (bf16 hi/lo pair,
~2^-17 table) lands at ~1e-4 dE76 vs lut3d; "fast" (bf16 hi only) at
2^-9-relative table error. Validated by tests/test_lut3d_op.py +
tests/test_oracle_parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import colorcore
from .prepare import PreparedLut

# Block of pixels processed per grid step; sized so the hoisted one-hot
# masks (K', BM), the quadrant dot outputs and their temporaries stay under
# VMEM (~16 MB/core). Values swept on a v5e chip (experiments/
# int8_dot_bench.py + hoisted_block_sweep.py): N=33 sits at 1024 (2048 for
# 1-pass int8) within noise of best; N>=49 shrinks blocks.
def _block_pixels(n: int, mode: str = "exact", n_passes: int = 2) -> int:
    if n <= 33:
        if mode == "fast":
            # single bf16 plane: small VMEM footprint; swept 4096 best
            # (18.2 -> 16.1 ms/4K tetra vs 1024 — experiments/
            # fast_bm_sweep.py)
            return 4096
        if mode == "int8_lite":
            # single int8 plane, i32-select masks: swept 15.9 ms tetra /
            # 14.0 tri at 4096 (r3_33_lite_opt.py) — the fastest 33-cube
            # tier, now the auto default when its per-LUT gate clears
            return 4096
        if mode in ("int8", "int8_fast"):
            # pair: 21.1 ms at 1024 -> 20.0 at 2048 post-i32-masks
            return 2048
        return 1024
    if n <= 49:
        return 512
    if n <= 65:
        if mode in ("int8", "int8_fast", "int8_lite"):
            # direct int8 tiers at N=65 swept on v5e (experiments/
            # r3_65cube_ablate*.py + r3_33_lite_opt.py, i32-select masks):
            # tetra int8_lite 72.0 ms at 256 -> 62.8 at 512 -> 47.9 at
            # 1024 -> 45.8 at 2048 -> 45.2 at 4096 (Mosaic streams the
            # per-quadrant masks, so the K ~ N^2/4 block never
            # materializes whole)
            return 4096
        return 256
    # N >= 97 (the 97/129 class, round 5): the table operand alone is
    # 3-14 MB of the ~16 MB VMEM, so blocks shrink to keep the quadrant
    # masks/dot temporaries inside the remainder. Sizes are EMPIRICAL
    # (experiments/r8_bigcube.py + the bm probe): every N=97 tier
    # compiles at these blocks; at N=129 the Mosaic compile fails for
    # int8 blocks above 256 (bm 512 est ~10 MB still dies in the
    # compiler; 256 compiles and runs) — the analytic tier_fits_vmem
    # model gates which TIERS can exist, the block table encodes what
    # the compiler actually accepts.
    if mode in ("int8", "int8_fast", "int8_lite"):
        return 2048 if n <= 97 else 256
    return 256


def _coarse2_bm(n: int) -> int:
    """Merged coarse+residual kernel block size: the resid masks
    (K ~ N^2/4 per quadrant x BM) are the VMEM heavyweight; swept on v5e
    round 3 at N=65 (experiments/r3_65cube_ablate.py): 4K 65-cube tetra
    80.1 ms at 512 / 76.2 at 1024 / 71.3 at 2048. N >= 97 shrinks with the
    growing resid table operand (round 5, experiments/r8_bigcube.py)."""
    if n <= 65:
        return 2048
    return 1024 if n <= 97 else 256


# Usable VMEM budget for the fit gate: ~16 MB/core minus headroom for
# Mosaic's own double-buffering of the io blocks and compiler spill slack.
_VMEM_BUDGET = 14 << 20


def tier_vmem_bytes(prep, interp: str, mode: str) -> int:
    """Conservative per-grid-step VMEM estimate for `mode` on this LUT:
    the resident table operand(s) (BlockSpec'd whole into VMEM) plus the
    per-block scratch the kernel body materializes (largest quadrant
    one-hot mask, quadrant dot output, accumulator, io blocks).

    Exists for the N >= 97 LUT class (round-5): at N=129 the int8 pair /
    bf16 tiers alone are 14-28 MB, so prepare.resolve_precision walks only
    FITTING tiers and apply_lut_planes raises on an explicit tier that
    cannot launch (reference accepts any N via FFmpeg's interpreter,
    ffmpeg.py:243-244 — here the fitting-tier subset plus the gather
    strategy carries the envelope)."""
    n = prep.size
    n_passes = 1 if interp in ("nearest", "trilinear") else 2
    coarse2 = mode.startswith("coarse2")
    bm = _coarse2_bm(n) if coarse2 else _block_pixels(n, mode, n_passes)
    rows = prep.rows_pad

    def scratch(rows_dot, maxw, opbytes):
        return (maxw * bm * opbytes      # hoisted one-hot quadrant mask
                + rows_dot * bm * 4      # quadrant dot output (f32)
                + 8 * bm * 4 + 3 * bm * 4)  # out + rgb io blocks

    if coarse2:
        if prep.coarse is None:
            return 1 << 62  # not buildable at all
        total = rows * sum(prep.resid_quad_widths)  # resid int8 plane
        total += scratch(rows, max(prep.resid_quad_widths), 1)
        cp = prep.coarse
        cmode = ("exact" if mode.startswith("coarse2x")
                 else "fast" if mode.startswith("coarse2f")
                 else "int8_fast")
        crows = cp.rows_pad if cmode == "fast" else 2 * cp.rows_pad
        opb = 1 if cmode == "int8_fast" else 2
        total += crows * sum(cp.quad_widths) * opb
        total += scratch(cp.rows_pad, max(cp.quad_widths), opb)
        return int(total)

    k = sum(prep.quad_widths)
    if mode in ("int8", "int8_fast", "int8_lite"):
        lrows = rows if mode == "int8_lite" else 2 * rows
        return int(lrows * k + scratch(rows, max(prep.quad_widths), 1))
    arows = rows if mode == "fast" else 2 * rows
    return int(arows * k * 2 + scratch(rows, max(prep.quad_widths), 2))


def tier_fits_vmem(prep, interp: str, mode: str) -> bool:
    return tier_vmem_bytes(prep, interp, mode) <= _VMEM_BUDGET


def lut3d_tpu_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# XLA side: coordinates and compact per-pass tap weights
# ---------------------------------------------------------------------------

def _scaled_coords(x: jnp.ndarray, n: int, dmin, dmax):
    x = jnp.clip(x, 0.0, 1.0)
    span = dmax - dmin
    x = jnp.clip((x - dmin) / span, 0.0, 1.0)
    s = x * (n - 1)
    p = jnp.floor(s).astype(jnp.int32)
    nx = jnp.minimum(p + 1, n - 1)
    d = s - p.astype(s.dtype)
    return p, nx, d


def _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n):
    """Return a list of per-pass tap-weight stacks, each (6, P) f32 laid out
    [wr_prev, wr_next, wg_prev, wg_next, wb_prev, wb_next].

    The (N, P) tap VECTORS are built inside the kernel from these compact
    weights + the (3, P) index stack — materializing them at XLA level costs
    ~400 B/pixel of HBM temps and OOMs on 4K batches (measured)."""
    ones = jnp.ones_like(dr)
    zeros = jnp.zeros_like(dr)

    if interp == "nearest":
        # NEAR(x) = trunc(x + 0.5): prev tap when d < 0.5, next tap otherwise
        def near(d):
            hit_n = (d >= 0.5).astype(dr.dtype)
            return 1.0 - hit_n, hit_n

        wrp, wrn = near(dr)
        wgp, wgn = near(dg)
        wbp, wbn = near(db)
        return [jnp.stack([wrp, wrn, wgp, wgn, wbp, wbn])]

    if interp == "trilinear":
        return [jnp.stack([1.0 - dr, dr, 1.0 - dg, dg, 1.0 - db, db])]

    if interp == "tetrahedral":
        # FFmpeg's strict-comparison case masks (colorcore.interp semantics).
        rg = dr > dg
        gb = dg > db
        rb = dr > db
        bg = db > dg
        br = db > dr
        m1 = rg & gb
        m2 = rg & ~gb & rb
        m3 = rg & ~gb & ~rb
        m4 = ~rg & bg
        m5 = ~rg & ~bg & br
        # m6 = ~rg & ~bg & ~br  (implicit)
        is_max_r = m1 | m2
        is_max_g = m5 | (~rg & ~bg & ~br)
        is_max_b = m3 | m4
        is_min_r = m4 | m5
        is_min_g = m2 | m3
        is_min_b = m1 | (~rg & ~bg & ~br)

        dmax = jnp.where(is_max_r, dr, jnp.where(is_max_g, dg, db))
        dmin = jnp.where(is_min_r, dr, jnp.where(is_min_g, dg, db))
        dmid = dr + dg + db - dmax - dmin

        def pass1_axis(is_max):
            wp = jnp.where(is_max, 1.0 - dmax, 1.0)
            wn = jnp.where(is_max, dmax - dmid, 0.0)
            return wp, wn

        def pass2_axis(is_min):
            wp = jnp.where(is_min, dmid - dmin, 0.0)
            wn = jnp.where(is_min, dmin, 1.0)
            return wp, wn

        p1 = [w for is_m in (is_max_r, is_max_g, is_max_b) for w in pass1_axis(is_m)]
        p2 = [w for is_m in (is_min_r, is_min_g, is_min_b) for w in pass2_axis(is_m)]
        return [jnp.stack(p1), jnp.stack(p2)]

    if interp == "pyramid":
        # FFmpeg interp_pyramid: X = the smallest-delta ("linear") axis;
        # pass 1 = bilinear over the other two axes on X's prev plane
        # (X one-hot prev); pass 2 = dX * (c111 - c[X=prev, others=next])
        # expressed as X-taps (-dX, +dX) with the other axes one-hot next.
        m1 = (dg > dr) & (db > dr)   # X = r
        m2 = (dr > dg) & (db > dg)   # X = g (elif)
        is_x_r = m1
        is_x_g = m2 & ~m1
        is_x_b = ~m1 & ~m2

        def p1_axis(is_x, d):
            wp = jnp.where(is_x, 1.0, 1.0 - d)
            wn = jnp.where(is_x, 0.0, d)
            return wp, wn

        def p2_axis(is_x, d):
            wp = jnp.where(is_x, -d, 0.0)
            wn = jnp.where(is_x, d, 1.0)
            return wp, wn

        p1 = [w for is_x, d in ((is_x_r, dr), (is_x_g, dg), (is_x_b, db))
              for w in p1_axis(is_x, d)]
        p2 = [w for is_x, d in ((is_x_r, dr), (is_x_g, dg), (is_x_b, db))
              for w in p2_axis(is_x, d)]
        return [jnp.stack(p1), jnp.stack(p2)]

    if interp == "prism":
        # FFmpeg interp_prism: triangle over (r, b), linear along g. The
        # triangle splits into one rank-1 term per r tap.
        m = db > dr
        ones = jnp.ones_like(dr)
        zeros = jnp.zeros_like(dr)
        p1 = [
            ones, zeros,                                  # r one-hot prev
            1.0 - dg, dg,                                 # g linear
            jnp.where(m, 1.0 - db, 1.0 - dr),             # b prev tap
            jnp.where(m, db - dr, 0.0),                   # b next tap
        ]
        p2 = [
            zeros, ones,                                  # r one-hot next
            1.0 - dg, dg,
            jnp.where(m, 0.0, dr - db),
            jnp.where(m, dr, db),
        ]
        return [jnp.stack(p1), jnp.stack(p2)]

    raise ValueError(f"unknown interp {interp!r}")


# ---------------------------------------------------------------------------
# Pallas kernel: one factorized pass
# ---------------------------------------------------------------------------

def _fused_kernel_int8(n: int, interp: str, pair: bool,
                       widths, dmin, dmax, rgb_ref, lq_ref, s_ref,
                       out_ref, mdt=jnp.int8):
    """Fused-taps int8/int4 kernel: raw RGB f32 rows in, coordinates and
    per-pass tap weights computed IN-kernel (the math is shape-agnostic,
    running on (1, BM) rows), which drops the per-pixel HBM round trip from
    15 rows (idx3 + weight stack) to 3 and removes the XLA-side tap fusion
    cluster. mdt = the mask/LUT operand dtype (jnp.int4 for the int4-pair
    tier on the chip; int8 containers under interpret)."""
    rgb = rgb_ref[:]                    # (3, BM) f32 in [0, 1]
    bm = rgb.shape[1]
    pr, nr, dr = _scaled_coords(rgb[0:1, :], n, dmin[0], dmax[0])
    pg, ng, dg = _scaled_coords(rgb[1:2, :], n, dmin[1], dmax[1])
    pb, nb, db = _scaled_coords(rgb[2:3, :], n, dmin[2], dmax[2])
    idx = jnp.concatenate([pr, pg, pb], axis=0)
    passes = _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n)
    # each pass stacks (1, BM) rows -> (6, 1, BM); flatten the unit axis
    wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
    _write_out(out_ref, _int8_quad_body(n, len(passes),
                                        widths, idx, wall, lq_ref, s_ref,
                                        pair=pair, mdt=mdt))


def _parity_split(p, n):
    """Per-pixel parity decomposition of a 2-tap axis at prev index p: the
    taps (p, p+1) hit exactly one even and one odd grid line (except the
    clamped edge p == n-1, n odd, where both fold onto the last even line).
    Returns (parity, clamp, even_line_index, odd_line_index).

    EVEN n: p == n-1 is an ODD line and the computed even_line_index
    (p+1)//2 is out of quadrant range — harmless, because p == n-1 implies
    d == 0 for that axis, and every interp's effective tap weight there is
    zero (next-weights are 0 at d=0, or the whole pass is zero because a
    zero-delta axis is the min/smallest axis); the out-of-range one-hot
    target simply never fires. Pinned by tests/test_lut3d_op.py::
    test_even_sized_luts."""
    par = p % 2
    clamp = p == (n - 1)
    return par, clamp, (p + par) // 2, p // 2


def _parity_weights(par, clamp, wp, wn):
    """Tap weights landing on the even / odd line of _parity_split."""
    even = par == 0
    we = jnp.where(even, wp + jnp.where(clamp, wn, 0.0), wn)
    wo = jnp.where(even, jnp.where(clamp, 0.0, wn), wp)
    return we, wo


def _write_out(out_ref, acc):
    for c in range(3):
        out_ref[c, :] = acc[c]


def _quad_setup(n, widths, idx, bm):
    """Shared parity-quadrant geometry: per-quadrant column offsets and the
    one-hot target masks. Quadrant order matches prepare.quad_permute:
    (b,g) = ee, eo, oe, oo; columns b-major/g-minor, per-quadrant zero
    padding at the block end. Targets depend only on the cell indices, so
    the masks are pass-independent — which is what lets the quadrant DOTS
    hoist out of the pass loop entirely (see _int8_quad_body)."""
    ne = (n + 1) // 2
    no = n // 2
    parb, clampb, be, bo = _parity_split(idx[2:3, :], n)
    parg, clampg, ge, go = _parity_split(idx[1:2, :], n)
    bsel = (be, be, bo, bo)
    gsel = (ge, go, ge, go)
    gwidth = (ne, no, ne, no)
    offs = []
    o = 0
    for w in widths:
        offs.append(o)
        o += w
    masks = [
        jax.lax.broadcasted_iota(jnp.int32, (widths[q], bm), 0)
        == (bsel[q] * gwidth[q] + gsel[q])
        for q in range(4)
    ]
    return offs, masks, (parb, clampb), (parg, clampg)


def _quad_pass_factors(n, n_passes, idx, wall, par_b, par_g, iota):
    """Per-pass r-axis tap vectors and per-quadrant (g,b) corner weights.

    Within a parity quadrant every pixel is ONE-tap in both g and b, so the
    (g,b) weight of pass ps collapses to a per-pixel SCALAR per quadrant
    (web*weg etc.) — a column-constant factor of the weight tile. Column
    constants commute with the matmul, so they apply AFTER the dot, in f32,
    EXACTLY: the int8 tiers carry no weight quantization at all (and
    negative weights — pyramid's difference pass — are fine)."""
    parb, clampb = par_b
    parg, clampg = par_g
    # NOTE (r4): rebuilding these taps via i32-select one-hot rows + convert
    # + (1, bm) multiplies (the r3 quadrant-mask trick) measured NEUTRAL
    # here — a one-off 11.9 ms reading did not reproduce (16.1/15.7 on
    # re-runs); see experiments/r6_33_vpu_attack.py + r6_taps_ab.py and
    # FINDINGS negative #8. The f32 selects stay.
    rvs, scals = [], []
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]

        def tap(axis):
            p = idx[axis:axis + 1, :]
            nx = jnp.minimum(p + 1, n - 1)
            wp = wts[2 * axis:2 * axis + 1, :]
            wn = wts[2 * axis + 1:2 * axis + 2, :]
            return jnp.where(iota == p, wp, 0.0) + jnp.where(iota == nx, wn, 0.0)

        rvs.append(tap(0))              # f32 r-axis taps (VPU side)
        wgp, wgn = wts[2:3, :], wts[3:4, :]
        wbp, wbn = wts[4:5, :], wts[5:6, :]
        web, wob = _parity_weights(parb, clampb, wbp, wbn)
        weg, wog = _parity_weights(parg, clampg, wgp, wgn)
        scals.append((web * weg, web * wog, wob * weg, wob * wog))
    return rvs, scals


def _int8_quad_body(n, n_passes, widths, idx, wall, lq_ref, s_ref,
                    acc=None, pair=True, mdt=jnp.int8):
    """Parity-quadrant int8 contraction body: stacked [q1; q2] int8 LUT pair
    in prepare.quad_permute column layout — the K axis split into four
    (b even/odd x g even/odd) blocks, so within each block every pixel is
    ONE-tap in both g and b. The W operand is just the hoisted one-hot mask
    (0/1 int8, built ONCE per block): each quadrant dot is a pure gather of
    the pixel's (g,b)-corner column, independent of the pass weights, so the
    4 dots run ONCE and are reused by every pass — tetrahedral pays the same
    MXU time as trilinear. The exact f32 (g,b) corner weights then apply
    post-dot per quadrant (see _quad_pass_factors), folded into the r-tap
    vector, so the int8 tier's ONLY error is the per-row table quantization
    (hi/lo pair: <= rowmax * 1.6e-5 — near-exact, no per-LUT weight gating
    needed, negative-weight interps OK). int8 runs the MXU at 2x bf16
    (361-373 vs 165-188 TOPS measured, v5e).

    The table planes hold the identity-DETRENDED LUT (prepare._identity_lmat)
    so quantization rotates against the detrended cell spread only; the
    identity part of each pass is separable in the compact tap weights —
    ident_c = S1_c * prod(S0_other) with S0 = wp + wn, S1 = (wp*p + wn*nx)
    / (n-1) — and is added EXACTLY from (1, BM) f32 scalars.

    pair=False ("int8_lite"): the q1 plane alone — half the dot, table
    error <= detrended-rowmax/254 (vs *1.6e-5 for the pair), gated per LUT.

    s_ref rows: [s1_unfolded; s2_unfolded] (pair) or [s1_unfolded] (lite)
    per-row dequant scales."""
    bm = idx.shape[1]
    half = lq_ref.shape[0] // 2 if pair else lq_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    offs, masks, par_b, par_g = _quad_setup(n, widths, idx, bm)
    rvs, scals = _quad_pass_factors(n, n_passes, idx, wall, par_b, par_g,
                                    iota)
    s1 = s_ref[:half, :]                # (half, 1) f32 per-row dequant
    s2 = s_ref[half:, :] if pair else None

    if acc is None:
        acc = [None, None, None]
    for q in range(4):
        # i32 select -> int8 convert, NOT the f32 route: measured 12 ms/4K
        # faster at N=65 (45.8 vs 57.9 ms, experiments/r3_65_microopt.py) —
        # the f32 select + f32->i8 convert lowers poorly on Mosaic
        m8 = jnp.where(masks[q], 1, 0).astype(mdt)
        d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8,
                    preferred_element_type=jnp.int32)
        df = d.astype(jnp.float32)
        e = (df[:half, :] * s1 + df[half:, :] * s2 if pair
             else df * s1)                          # dequantized corner cols
        rw = None                       # combined r-tap x quadrant weight
        for ps in range(n_passes):
            t = rvs[ps] * scals[ps][q]
            rw = t if rw is None else rw + t
        for c in range(3):
            contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
            acc[c] = contrib if acc[c] is None else acc[c] + contrib

    return _ident_acc(n, n_passes, idx, wall, acc)


def _ident_acc(n, n_passes, idx, wall, acc):
    """Add the analytic identity term (exact f32 weights), one per pass.
    The quantized table planes store the identity-DETRENDED LUT
    (prepare._identity_lmat); the identity part is separable in the compact
    tap weights — ident_c = S1_c * prod(S0_other) with S0 = wp + wn,
    S1 = (wp*p + wn*nx) / (n-1) — and is exact for every interp (the
    per-axis weights are what define the interpolation). Works unchanged
    under the coarse tap remap: the remap is exact for per-axis-linear
    functions, and the identity is one."""
    inv = 1.0 / (n - 1)
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]

        def s01(axis):
            p = idx[axis:axis + 1, :]
            nx = jnp.minimum(p + 1, n - 1)
            wp = wts[2 * axis:2 * axis + 1, :]
            wn = wts[2 * axis + 1:2 * axis + 2, :]
            return (wp + wn,
                    (wp * p.astype(jnp.float32)
                     + wn * nx.astype(jnp.float32)) * inv)

        sr0, sr1 = s01(0)
        sg0, sg1 = s01(1)
        sb0, sb1 = s01(2)
        ident = (sr1 * sg0 * sb0, sr0 * sg1 * sb0, sr0 * sg0 * sb1)
        for c in range(3):
            acc[c] = acc[c] + ident[c][0, :]
    return acc


def _remap_axis_jnp(p, wp, wn):
    """Per-axis fine->coarse tap remap (prepare.remap_taps_to_coarse_np):
    exact for separable-linear upsampling; tap sums preserved."""
    even = (p % 2) == 0
    ic = p // 2
    wpc = jnp.where(even, wp + 0.5 * wn, 0.5 * wp)
    wnc = jnp.where(even, 0.5 * wn, 0.5 * wp + wn)
    return ic, wpc, wnc


def _fine_taps_remapped(rgb, n_fine: int, n_out: int, interp: str,
                        dmin, dmax):
    """In-kernel: coordinates + pass weights at grid n_fine, then remapped
    down to n_out (one halving per step: 65 -> 33 -> 17 ...). Returns
    (idx (3, BM), wall (6*passes, BM))."""
    bm = rgb.shape[1]
    pr, nr, dr = _scaled_coords(rgb[0:1, :], n_fine, dmin[0], dmax[0])
    pg, ng, dg = _scaled_coords(rgb[1:2, :], n_fine, dmin[1], dmax[1])
    pb, nb, db = _scaled_coords(rgb[2:3, :], n_fine, dmin[2], dmax[2])
    passes = [p.reshape(6, bm) for p in _passes_for_interp(
        interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n_fine)]
    idx_axes = [pr, pg, pb]
    cur = n_fine
    while cur > n_out:
        new_passes = []
        for w6 in passes:
            rows = []
            new_idx = []
            for ax in range(3):
                ic, wpc, wnc = _remap_axis_jnp(
                    idx_axes[ax], w6[2 * ax:2 * ax + 1, :],
                    w6[2 * ax + 1:2 * ax + 2, :])
                new_idx.append(ic)
                rows.extend([wpc, wnc])
            new_passes.append(jnp.concatenate(rows, axis=0))
        idx_axes = new_idx  # identical across passes (depends on p only)
        passes = new_passes
        cur = (cur + 1) // 2
    assert cur == n_out, (n_fine, n_out)
    idx = jnp.concatenate(idx_axes, axis=0)
    wall = jnp.concatenate(passes, axis=0)
    return idx, wall, len(passes)


def _resid_quad_body(n, n_passes, widths, idx, wall, lq_ref,
                     s_ref, acc=None, wdt=jnp.int8):
    """Parity-quadrant residual body: the single-plane int8 residual matrix
    in prepare.quad_permute layout. Same hoisted-dot structure as
    _int8_quad_body (one 0/1 mask dot per quadrant, shared by all passes;
    exact f32 corner weights applied post-dot folded into the r-tap
    vector), with a single dequant plane. The residual tier's only error is
    the per-row int8 table quantization (<= rowmax/254 of an already-tiny
    residual) — no weight error, no interp-substitution gating needed."""
    bm = idx.shape[1]
    half = lq_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    offs, masks, par_b, par_g = _quad_setup(n, widths, idx, bm)
    rvs, scals = _quad_pass_factors(n, n_passes, idx, wall, par_b, par_g,
                                    iota)
    s1 = s_ref[:half, :]

    if acc is None:
        acc = [None, None, None]
    for q in range(4):
        m8 = jnp.where(masks[q], 1, 0).astype(wdt)   # i32-select route
        d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8,
                    preferred_element_type=jnp.int32)
        e = d.astype(jnp.float32) * s1
        rw = None
        for ps in range(n_passes):
            t = rvs[ps] * scals[ps][q]
            rw = t if rw is None else rw + t
        for c in range(3):
            contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    return acc


def _fused_kernel_bf16(n: int, interp: str, exact: bool,
                       widths, dmin, dmax, rgb_ref, l_ref, out_ref):
    """Fused-taps bf16 kernel (see _fused_kernel_int8)."""
    rgb = rgb_ref[:]
    bm = rgb.shape[1]
    pr, nr, dr = _scaled_coords(rgb[0:1, :], n, dmin[0], dmax[0])
    pg, ng, dg = _scaled_coords(rgb[1:2, :], n, dmin[1], dmax[1])
    pb, nb, db = _scaled_coords(rgb[2:3, :], n, dmin[2], dmax[2])
    idx = jnp.concatenate([pr, pg, pb], axis=0)
    passes = _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n)
    wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
    _write_out(out_ref, _bf16_quad_body(n, len(passes), exact, widths,
                                        idx, wall, l_ref))


def _bf16_quad_body(n, n_passes, exact, widths, idx, wall, l_ref, acc=None):
    """Hoisted-dot bf16 body: the stacked [hi; lo] bf16 pair (exact=True —
    hi + lo reconstructs the table to ~2^-17) or the hi half alone
    (exact=False, "fast": table error 2^-9-relative) in the quad_permute
    column layout. Identical structure to _int8_quad_body: the W operand is
    the hoisted 0/1 one-hot mask per quadrant (i1 masks cannot select bf16
    directly on Mosaic — route f32 select -> bf16 convert), the four dots
    accumulate in f32 and run ONCE per block, and the exact f32 corner
    weights fold into the r-tap vector post-dot. With exact weights the
    historical corrected-bf16 machinery (ones-row readback, sum rescale) is
    unnecessary and gone: "exact" total error is ~1e-6 absolute.

    Like the int8 planes, the stored pair is the identity-DETRENDED table
    (+ analytic in-kernel identity term): bf16's error is RELATIVE, so
    detrending turns "fast"'s 2^-9 of the table VALUE into 2^-9 of the
    cell-local grading delta — ~1e-4 absolute on production LUTs, gated
    per LUT like every reduced tier."""
    bm = idx.shape[1]
    rows_l = l_ref.shape[0]
    half = rows_l // 2 if exact else rows_l
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    offs, masks, par_b, par_g = _quad_setup(n, widths, idx, bm)
    rvs, scals = _quad_pass_factors(n, n_passes, idx, wall, par_b, par_g,
                                    iota)

    if acc is None:
        acc = [None, None, None]
    for q in range(4):
        m16 = jnp.where(masks[q], 1.0, 0.0).astype(jnp.bfloat16)
        d = jnp.dot(l_ref[:, offs[q]:offs[q] + widths[q]], m16,
                    preferred_element_type=jnp.float32)
        e = d[:half, :] + d[half:, :] if exact else d
        rw = None
        for ps in range(n_passes):
            t = rvs[ps] * scals[ps][q]
            rw = t if rw is None else rw + t
        for c in range(3):
            contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    return _ident_acc(n, n_passes, idx, wall, acc)


def _unfolded_pair_scales(prep) -> np.ndarray:
    """Per-row dequant scales for the hoisted-dot int8 body: the stored
    scale_q1/q2 fold a 1/254 weight norm from the retired in-dot weight
    coding; the mask dot needs the raw per-row scales back."""
    return np.concatenate([prep.scale_q1 * 254.0, prep.scale_q2 * 254.0],
                          axis=0)


def kernel_operands(prep: PreparedLut, interp: str,
                    precision: str = "auto") -> dict:
    """The table operand arrays for the resolved precision, as a dict of
    numpy arrays.

    Purpose: LUT-AGNOSTIC compiled programs. apply_lut_planes historically
    closed over these arrays, baking the LUT into the jitted program as
    constants — so every new .cube file recompiled (~100 s through the
    remote-compile tunnel). Passing this dict as a jit ARGUMENT instead
    keys the program by (shapes, N, tier, interp, domain) only: any LUT of
    the same size/tier reuses the compiled program, and a warmed persistent
    cache serves never-seen LUTs with zero compiles (engine.warmup)."""
    precision = prep.resolve_precision(interp, precision)
    rows_pad = prep.rows_pad
    if precision == "gather":
        # no kernel tier fits VMEM for this LUT: the XLA gather path takes
        # the raw table as its (LUT-agnostic) operand
        return {"table": prep.table}
    if precision.startswith("coarse") and prep.coarse is not None:
        cp = prep.coarse
        coarse_mode = ("exact" if precision.startswith("coarse2x")
                       else "fast" if precision.startswith("coarse2f")
                       else "int8_fast")
        if coarse_mode == "int8_fast":
            lc = cp.lmat_qp
            sc = _unfolded_pair_scales(cp).astype(np.float32)
        elif coarse_mode == "fast":
            lc = cp.lmat_bf_qp[:cp.rows_pad]
            sc = np.zeros((8, 1), np.float32)
        else:
            lc = cp.lmat_bf_qp
            sc = np.zeros((8, 1), np.float32)
        return {
            "lr": prep.resid_qp,
            "sr": (prep.resid_scale * 127.0).astype(np.float32),
            "lc": lc,
            "sc": sc,
        }
    if precision in ("int8", "int8_fast"):
        return {"lq": prep.lmat_qp,
                "sv": _unfolded_pair_scales(prep).astype(np.float32)}
    if precision == "int8_lite":
        return {"lq": prep.lmat_qp[:rows_pad],
                "sv": (prep.scale_q1 * 254.0).astype(np.float32)}
    if precision == "fast":
        return {"la": prep.lmat_bf_qp[:rows_pad]}
    # "exact" and anything unrecognized lands on the bf16 pair
    return {"la": prep.lmat_bf_qp}


def _run_fused(rgb3, prep, n: int, interp: str, mode: str,
               interpret: bool, ops=None) -> jnp.ndarray:
    """Fused-taps launch: (3, P) f32 RGB in, coordinates/weights computed
    inside the kernel (3 HBM rows/pixel instead of 15 + no XLA tap cluster).
    Covers the exact/fast/int8 tiers; coarse2 launches the MERGED
    coarse+residual kernel (_run_coarse2_fused)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_pad = prep.rows_pad
    npix = rgb3.shape[1]
    n_passes = 1 if interp in ("nearest", "trilinear") else 2
    bm = _block_pixels(n, mode, n_passes)
    assert npix % bm == 0
    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)
    if ops is None:
        ops = kernel_operands(prep, interp, mode)

    if mode in ("int8", "int8_fast", "int8_lite"):
        # "int8" (the historical weight-pair tier) is an alias of
        # "int8_fast" since the hoisted-dot restructure: weights are exact
        # f32 post-dot factors in both, so the tiers coincide. "int8_lite"
        # is the q1 plane alone: half the dot at detrended-rowmax/254
        # table error, per-LUT gated.
        pair = mode != "int8_lite"
        lq = jnp.asarray(ops["lq"], jnp.int8)
        sv = jnp.asarray(ops["sv"], jnp.float32)
        l_rows = 2 * rows_pad if pair else rows_pad
        ktot = lq.shape[1]
        kernel = functools.partial(_fused_kernel_int8, n,
                                   interp, pair, prep.quad_widths,
                                   dmin, dmax)
        out = pl.pallas_call(
            kernel,
            grid=(npix // bm,),
            in_specs=[
                pl.BlockSpec((3, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l_rows, ktot), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l_rows, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
            interpret=interpret,
        )(rgb3, lq, sv)
        return out[:3]

    exact = mode != "fast"
    lmat_a = jnp.asarray(ops["la"], jnp.bfloat16)
    a_rows = 2 * rows_pad if exact else rows_pad
    kernel = functools.partial(_fused_kernel_bf16, n,
                               interp, exact, prep.quad_widths, dmin, dmax)
    out = pl.pallas_call(
        kernel,
        grid=(npix // bm,),
        in_specs=[
            pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((a_rows, lmat_a.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
        interpret=interpret,
    )(rgb3, lmat_a)
    return out[:3]


def _run_coarse2_fused(rgb3, prep, n: int, interp: str, precision: str,
                       interpret: bool, ops=None) -> jnp.ndarray:
    """Fused-taps coarse+residual launch: every kernel takes the raw (3, P)
    RGB rows and rebuilds coordinates in-kernel — the redundant (1, BM)-row
    math is far cheaper than the 15-27 rows/pixel of HBM tap traffic it
    replaces.

    coarse2*: interp(L) = coarse_term(C(N+1)/2) + resid(R_N). The coarse
    term's numerics: plain = offset-int8, "f" = bf16-hi-only (half the
    exact dot), "x" = exact bf16 pair; "_tri" substitutes trilinear for the
    residual's interpolation (per-LUT sim-gated like everything else).

    (A 3-level recursion — C17 + R33 + R65 — was implemented and measured
    SLOWER on-chip: the extra launch and per-block tap recompute outweigh
    the cheaper dots; see experiments/FINDINGS.md.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)
    coarse_mode = ("exact" if precision.startswith("coarse2x")
                   else "fast" if precision.startswith("coarse2f")
                   else "int8_fast")
    resid_interp = ("trilinear"
                    if precision.endswith("_tri") and interp != "trilinear"
                    else interp)

    cp = prep.coarse
    m = cp.size
    rows_f = prep.rows_pad
    rows_m = cp.rows_pad
    if ops is None:
        ops = kernel_operands(prep, interp, precision)
    lr = jnp.asarray(ops["lr"], jnp.int8)
    sr = jnp.asarray(ops["sr"], jnp.float32)  # unfolded
    rwidths = prep.resid_quad_widths
    lc_dt = jnp.int8 if coarse_mode == "int8_fast" else jnp.bfloat16
    lc = jnp.asarray(ops["lc"], lc_dt)
    sc = jnp.asarray(ops["sc"], jnp.float32)
    c_rows = rows_m if coarse_mode == "fast" else 2 * rows_m
    kc = lc.shape[1]

    npix = rgb3.shape[1]
    bm = _coarse2_bm(n)
    assert npix % bm == 0
    kernel = functools.partial(
        _fused_kernel_coarse2, n, m, interp,
        resid_interp, coarse_mode, rwidths,
        cp.quad_widths, dmin, dmax)
    out = pl.pallas_call(
        kernel,
        grid=(npix // bm,),
        in_specs=[
            pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_f, lr.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_f, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_rows, kc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sc.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
        interpret=interpret,
    )(rgb3, lr, sr, lc, sc)
    return out[:3]


def _fused_kernel_coarse2(n, m, interp, resid_interp,
                          coarse_mode, rwidths, cwidths,
                          dmin, dmax,
                          rgb_ref, lr_ref, sr_ref, lc_ref, sc_ref,
                          out_ref):
    """MERGED coarse+residual kernel: both terms of the decomposition in one
    pallas_call, sharing the block's coordinate math (CSE) and accumulating
    into one output — saves a kernel launch, the duplicate fine-tap
    computation, and an (8, P) HBM round-trip + XLA add per frame (~9 ms/4K
    measured as the gap between the summed component times and the 2-kernel
    total)."""
    rgb = rgb_ref[:]
    idxf, wallf, np_f = _fine_taps_remapped(rgb, n, n, resid_interp,
                                            dmin, dmax)
    acc = _resid_quad_body(n, np_f, rwidths, idxf, wallf,
                           lr_ref, sr_ref)
    idxc, wallc, np_c = _fine_taps_remapped(rgb, n, m, interp, dmin, dmax)
    if coarse_mode == "int8_fast":
        acc = _int8_quad_body(m, np_c, cwidths, idxc,
                              wallc, lc_ref, sc_ref, acc)
    else:
        acc = _bf16_quad_body(m, np_c, coarse_mode == "exact", cwidths,
                              idxc, wallc, lc_ref, acc)
    _write_out(out_ref, acc)


def apply_lut_planes(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    prep: PreparedLut,
    interp: str = "tetrahedral",
    strategy: str = "mxu",
    precision: str = "auto",
    interpret: bool = False,
    operands=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply a prepared 3D LUT to planar float RGB in [0,1].

    operands: optional dict from kernel_operands(prep, interp, precision)
    — pass it as a jit ARGUMENT (after jax.device_put) to keep compiled
    programs LUT-agnostic; None bakes the tables in as constants.

    r/g/b: arbitrary same-shaped float arrays (typically (H, W)).
    strategy: "mxu" (Pallas kernel) or "gather" (XLA gather fallback — exact
    but slow on TPU; useful for tiny inputs and cross-checks).
    precision: "exact" (detrended bf16 hi/lo pair, ~1e-6), "fast" (bf16 hi
    only — the usual auto pick), "int8_fast" (int8 pair, near-exact; alias
    "int8"), "int8_lite" (single int8 plane), the coarse2* family for
    N >= 49, or "auto" — the fastest mode whose SIMULATED per-LUT
    worst-case dE76 clears prepare.DE76_BUDGET (resolved at trace time via
    prep.resolve_precision). Every tier uses exact f32 weights (hoisted-dot
    structure); tiers differ only in the stored table representation.
    """
    if interp not in ("nearest", "trilinear", "tetrahedral", "pyramid", "prism"):
        interp = "tetrahedral"
    requested = precision
    precision = prep.resolve_precision(interp, precision)
    # (pyramid's negative difference-pass weights are fine in the int8 tiers
    # since the hoisted-dot restructure: weights are exact f32 post-dot.)
    shape = r.shape
    n = prep.size

    if (strategy == "mxu" and precision != "gather"
            and not tier_fits_vmem(prep, interp, precision)):
        # only reachable with an EXPLICIT tier request (auto walks fitting
        # tiers only): no silent degradation, same contract as forcing an
        # inapplicable fused layout
        raise ValueError(
            f"LUT tier {requested!r} needs ~"
            f"{tier_vmem_bytes(prep, interp, precision) >> 20} MB of "
            f"VMEM at N={n} (> ~16 MB/core); use precision='auto' (walks "
            f"fitting tiers) or strategy='gather'")

    if strategy == "gather" or precision == "gather":
        table = jnp.asarray(operands["table"] if operands is not None
                            and "table" in operands else prep.table)
        rgb = jnp.stack([r, g, b], axis=-1)
        out = colorcore.apply_lut(
            rgb, table, interp, xp=jnp
        ) if prep.has_unit_domain else colorcore.interp._FUNCS[interp](
            rgb, table, prep.domain_min, prep.domain_max, xp=jnp
        )
        return out[..., 0], out[..., 1], out[..., 2]

    rf = r.reshape(-1)
    gf = g.reshape(-1)
    bf = b.reshape(-1)
    npix = rf.shape[0]
    n_passes = 1 if interp in ("nearest", "trilinear") else 2
    coarse2 = precision.startswith("coarse") and prep.coarse is not None
    # coarse2 is one merged kernel (coarse + residual share the block) at
    # its own swept block size
    bm = _coarse2_bm(n) if coarse2 else _block_pixels(n, precision, n_passes)
    pad = (-npix) % bm
    if pad:
        rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
        gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
        bf = jnp.concatenate([bf, jnp.zeros((pad,), bf.dtype)])

    rgb3 = jnp.stack([rf, gf, bf]).astype(jnp.float32)
    if coarse2:
        out = _run_coarse2_fused(rgb3, prep, n, interp, precision, interpret,
                                 ops=operands)
    else:
        out = _run_fused(rgb3, prep, n, interp, precision, interpret,
                         ops=operands)
    ro, go, bo = out[0], out[1], out[2]
    if pad:
        ro, go, bo = ro[:npix], go[:npix], bo[:npix]
    return ro.reshape(shape), go.reshape(shape), bo.reshape(shape)


