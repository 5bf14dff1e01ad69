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
              one-hot at next.

All math is float32, bit-compatible with the colorcore reference interpolators
up to matmul reassociation (~1e-6), validated by tests/test_lut3d_op.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import colorcore
from .prepare import PreparedLut

# Block of pixels processed per grid step; sized so Wt (N^2, BM) f32 plus the
# LUT matrix stay well under VMEM.
def _block_pixels(n: int) -> int:
    if n <= 33:
        return 1024
    if n <= 49:
        return 512
    return 256


def lut3d_tpu_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# XLA side: per-pass transposed tap vectors (N, P)
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


def _onehot_t(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """(P,) int32 -> (N, P) f32 one-hot, transposed-planar layout."""
    iota = jnp.arange(n, dtype=jnp.int32)[:, None]
    return (iota == idx[None, :]).astype(jnp.float32)


def _tap_t(p, nx, wp, wn, n):
    """Tap vector (N, P): wp at p, wn at nx (nx may equal p at the top edge,
    in which case the weights sum there, matching d == 0 in that case)."""
    return _onehot_t(p, n) * wp[None, :] + _onehot_t(nx, n) * wn[None, :]


def _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n):
    """Return a list of (rvT, gvT, bvT) tap-vector triples, one per pass."""
    if interp == "nearest":
        # NEAR(x) = trunc(x + 0.5) on the scaled coordinate
        rn = jnp.minimum(pr + (dr >= 0.5).astype(jnp.int32), n - 1)
        gn = jnp.minimum(pg + (dg >= 0.5).astype(jnp.int32), n - 1)
        bn = jnp.minimum(pb + (db >= 0.5).astype(jnp.int32), n - 1)
        return [(_onehot_t(rn, n), _onehot_t(gn, n), _onehot_t(bn, n))]

    if interp == "trilinear":
        return [(
            _tap_t(pr, nr, 1.0 - dr, dr, n),
            _tap_t(pg, ng, 1.0 - dg, dg, n),
            _tap_t(pb, nb, 1.0 - db, db, n),
        )]

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

        def pass1_axis(is_max, p, nx, d):
            wp = jnp.where(is_max, 1.0 - dmax, 1.0)
            wn = jnp.where(is_max, dmax - dmid, 0.0)
            return _tap_t(p, nx, wp, wn, n)

        def pass2_axis(is_min, p, nx, d):
            wp = jnp.where(is_min, dmid - dmin, 0.0)
            wn = jnp.where(is_min, dmin, 1.0)
            return _tap_t(p, nx, wp, wn, n)

        pass1 = (
            pass1_axis(is_max_r, pr, nr, dr),
            pass1_axis(is_max_g, pg, ng, dg),
            pass1_axis(is_max_b, pb, nb, db),
        )
        pass2 = (
            pass2_axis(is_min_r, pr, nr, dr),
            pass2_axis(is_min_g, pg, ng, dg),
            pass2_axis(is_min_b, pb, nb, db),
        )
        return [pass1, pass2]

    raise ValueError(f"unknown interp {interp!r}")


# ---------------------------------------------------------------------------
# Pallas kernel: one factorized pass
# ---------------------------------------------------------------------------

def _pass_kernel(n: int, gv_ref, bv_ref, rv_ref, lmat_ref, out_ref):
    gv = gv_ref[:]                      # (N, BM)
    bv = bv_ref[:]                      # (N, BM)
    bm = gv.shape[1]
    # Wt[j*N + k, p] = gv[j, p] * bv[k, p]  (outer product along sublanes)
    a = jnp.broadcast_to(gv[:, None, :], (n, n, bm)).reshape(n * n, bm)
    b = jnp.broadcast_to(bv[None, :, :], (n, n, bm)).reshape(n * n, bm)
    w = a * b
    # (ROWS_PAD, N^2) @ (N^2, BM) on the MXU. HIGHEST precision keeps the
    # contraction in true f32 (default TPU precision would downcast to bf16,
    # blowing the dE76 parity budget).
    t = jnp.dot(lmat_ref[:], w, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    rv = rv_ref[:]                      # (N, BM)
    for c in range(3):
        seg = t[c * n:(c + 1) * n, :]   # (N, BM) sublane slice
        out_ref[c, :] = jnp.sum(seg * rv, axis=0)


def _run_pass(gvT, bvT, rvT, lmat, n: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_pad, nsq = lmat.shape
    npix = gvT.shape[1]
    bm = _block_pixels(n)
    assert npix % bm == 0
    kernel = functools.partial(_pass_kernel, n)
    vec_spec = pl.BlockSpec((n, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(npix // bm,),
        in_specs=[
            vec_spec,
            vec_spec,
            vec_spec,
            pl.BlockSpec((rows_pad, nsq), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
        interpret=interpret,
    )(gvT, bvT, rvT, lmat)
    return out[:3]


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def apply_lut_planes(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    prep: PreparedLut,
    interp: str = "tetrahedral",
    strategy: str = "mxu",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply a prepared 3D LUT to planar float RGB in [0,1].

    r/g/b: arbitrary same-shaped float arrays (typically (H, W)).
    strategy: "mxu" (Pallas kernel) or "gather" (XLA gather fallback — exact
    but slow on TPU; useful for tiny inputs and cross-checks).
    """
    if interp not in ("nearest", "trilinear", "tetrahedral"):
        interp = "tetrahedral"
    shape = r.shape
    n = prep.size

    if strategy == "gather":
        rgb = jnp.stack([r, g, b], axis=-1)
        out = colorcore.apply_lut(
            rgb, jnp.asarray(prep.table), interp, xp=jnp
        ) if prep.has_unit_domain else colorcore.interp._FUNCS[interp](
            rgb, jnp.asarray(prep.table), prep.domain_min, prep.domain_max, xp=jnp
        )
        return out[..., 0], out[..., 1], out[..., 2]

    rf = r.reshape(-1)
    gf = g.reshape(-1)
    bf = b.reshape(-1)
    npix = rf.shape[0]
    bm = _block_pixels(n)
    pad = (-npix) % bm
    if pad:
        rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
        gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
        bf = jnp.concatenate([bf, jnp.zeros((pad,), bf.dtype)])

    dmin = jnp.asarray(prep.domain_min)
    dmax = jnp.asarray(prep.domain_max)
    pr, nr, dr = _scaled_coords(rf, n, dmin[0], dmax[0])
    pg, ng, dg = _scaled_coords(gf, n, dmin[1], dmax[1])
    pb, nb, db = _scaled_coords(bf, n, dmin[2], dmax[2])

    lmat = jnp.asarray(prep.lmat)
    passes = _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n)
    acc = None
    for rvT, gvT, bvT in passes:
        out = _run_pass(gvT, bvT, rvT, lmat, n, interpret)
        acc = out if acc is None else acc + out
    ro, go, bo = acc[0], acc[1], acc[2]
    if pad:
        ro, go, bo = ro[:npix], go[:npix], bo[:npix]
    return ro.reshape(shape), go.reshape(shape), bo.reshape(shape)
