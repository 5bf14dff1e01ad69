"""Decompose the int8 kernel's per-pass cost: dot floor vs build variants.

Variants (all same dot shape as production int8_fast N=33 tetra):
  floor   : constant int8 W tile (no build at all) — pure dot + readout
  quadcat : quadrant selects -> 4 int8 tiles -> concat (quad_build.py)
  quad4   : quadrant selects -> 4 separate dots, int32 sum (no concat)
  base    : production int8_fast
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import (
    _block_pixels, _passes_for_interp, _scaled_coords, apply_lut_planes,
)
from experiments.quad_build import quad_permute_lmat, _round_up

SYNC_MS = 30.0
H, W = 2160, 3840
N = 33


def _coords_and_passes(rgb, n, interp, dmin, dmax):
    bm = rgb.shape[1]
    pr, nr, dr = _scaled_coords(rgb[0:1, :], n, dmin[0], dmax[0])
    pg, ng, dg = _scaled_coords(rgb[1:2, :], n, dmin[1], dmax[1])
    pb, nb, db = _scaled_coords(rgb[2:3, :], n, dmin[2], dmax[2])
    idx = jnp.concatenate([pr, pg, pb], axis=0)
    passes = _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n)
    wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
    return idx, wall, len(passes)


def _readout(n, ones_row, t, rv, true_sum, acc):
    meas = t[ones_row:ones_row + 1, :]
    scale = jnp.where(jnp.abs(meas) > 0.01, true_sum / meas, 1.0)
    for c in range(3):
        segc = t[c * n:(c + 1) * n, :]
        contrib = jnp.sum(segc * rv, axis=0) * scale[0, :]
        acc[c] = contrib if acc[c] is None else acc[c] + contrib


def _floor_kernel(n, ones_row, interp, ktot, dmin, dmax,
                  rgb_ref, lq_ref, s_ref, out_ref):
    rgb = rgb_ref[:]
    bm = rgb.shape[1]
    idx, wall, n_passes = _coords_and_passes(rgb, n, interp, dmin, dmax)
    rows_l = lq_ref.shape[0]
    half = rows_l // 2
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    s1 = s_ref[:half, :]
    s2 = s_ref[half:2 * half, :]
    bias = s_ref[2 * half:3 * half, :]
    lq = lq_ref[:]
    kio = jax.lax.broadcasted_iota(jnp.int32, (ktot, bm), 0)
    acc = [None, None, None]
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]
        p = idx[0:1, :]
        nx = jnp.minimum(p + 1, n - 1)
        rv = (jnp.where(iota_n == p, wts[0:1, :], 0.0)
              + jnp.where(iota_n == nx, wts[1:2, :], 0.0))
        true_sum = (wts[2:3, :] + wts[3:4, :]) * (wts[4:5, :] + wts[5:6, :])
        # data-dependent minimal build: 1 select + 1 convert, 1 dot/pass
        srow = jnp.round(wts[2:3, :] * 254.0 - 127.0)
        w8c = jnp.where(kio == idx[1:2, :], srow, -127.0).astype(jnp.int8)
        seg = jnp.dot(lq, w8c, preferred_element_type=jnp.int32).astype(
            jnp.float32)
        t = seg[:half, :] * s1 + seg[half:, :] * s2 + bias
        _readout(n, ones_row, t, rv, true_sum, acc)
    for c in range(3):
        out_ref[c, :] = acc[c]


def _quad4_kernel(n, ones_row, interp, widths, dmin, dmax,
                  rgb_ref, lq_ref, s_ref, out_ref):
    rgb = rgb_ref[:]
    bm = rgb.shape[1]
    idx, wall, n_passes = _coords_and_passes(rgb, n, interp, dmin, dmax)
    rows_l = lq_ref.shape[0]
    half = rows_l // 2
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    ne = (n + 1) // 2

    def split(p):
        par = p % 2
        clamp = p == (n - 1)
        return par, clamp, (p + par) // 2, p // 2

    parb, clampb, be, bo = split(idx[2:3, :])
    parg, clampg, ge, go = split(idx[1:2, :])
    ng_w = {0: ne, 1: n // 2}
    masks = []
    qi = 0
    offs = np.cumsum([0] + list(widths[:-1])).tolist()
    for bs in (0, 1):
        for gs in (0, 1):
            kw = widths[qi]
            bq = be if bs == 0 else bo
            gq = ge if gs == 0 else go
            tgt = bq * ng_w[gs] + gq
            it = jax.lax.broadcasted_iota(jnp.int32, (kw, bm), 0)
            masks.append(it == tgt)
            qi += 1

    s1 = s_ref[:half, :]
    s2 = s_ref[half:2 * half, :]
    bias = s_ref[2 * half:3 * half, :]
    acc = [None, None, None]
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]
        p = idx[0:1, :]
        nx = jnp.minimum(p + 1, n - 1)
        rv = (jnp.where(iota_n == p, wts[0:1, :], 0.0)
              + jnp.where(iota_n == nx, wts[1:2, :], 0.0))
        wgp, wgn = wts[2:3, :], wts[3:4, :]
        wbp, wbn = wts[4:5, :], wts[5:6, :]
        ew = jnp.where(parb == 0, wbp + jnp.where(clampb, wbn, 0.0), wbn)
        ow = jnp.where(parb == 0, jnp.where(clampb, 0.0, wbn), wbp)
        egw = jnp.where(parg == 0, wgp + jnp.where(clampg, wgn, 0.0), wgn)
        ogw = jnp.where(parg == 0, jnp.where(clampg, 0.0, wgn), wgp)
        scal = [ew * egw, ew * ogw, ow * egw, ow * ogw]
        seg32 = None
        for q in range(4):
            srow = jnp.round(scal[q] * 254.0 - 127.0)
            w8 = jnp.where(masks[q], srow, -127.0).astype(jnp.int8)
            d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], w8,
                        preferred_element_type=jnp.int32)
            seg32 = d if seg32 is None else seg32 + d
        seg = seg32.astype(jnp.float32)
        t = seg[:half, :] * s1 + seg[half:, :] * s2 + bias
        true_sum = (wgp + wgn) * (wbp + wbn)
        _readout(n, ones_row, t, rv, true_sum, acc)
    for c in range(3):
        out_ref[c, :] = acc[c]


def launch(kernel_fn, rgb3, lq, sv, rows_l, ktot, bm, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    npix = rgb3.shape[1]
    out = pl.pallas_call(
        kernel_fn,
        grid=(npix // bm,),
        in_specs=[
            pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_l, ktot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sv.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
        interpret=interpret,
    )(rgb3, lq, sv)
    return out[:3]


def timed(fn, *args, iters=5):
    float(jnp.sum(sum(fn(*args))))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(sum(fn(*args))))
        ts.append((time.perf_counter() - t0) * 1e3 - SYNC_MS)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    print(f"device: {jax.devices()[0]}", flush=True)

    lut = Lut3D.identity(N)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(
            np.float32), 0, 1)
    prep = prepare_lut(lut)
    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)
    rows_pad = prep.rows_pad
    lmatq = np.concatenate([prep.lmat_q1, prep.lmat_q2], axis=0).astype(
        np.float32)
    lperm, widths, offs = quad_permute_lmat(lmatq, N)
    lq_perm = jnp.asarray(lperm, jnp.int8)
    lq_base = jnp.asarray(lmatq, jnp.int8)
    sv = jnp.asarray(
        np.concatenate([prep.scale_q1, prep.scale_q2, prep.bias_q,
                        np.zeros_like(prep.bias_q)], axis=0), jnp.float32)

    for interp, bm in (("tetrahedral", 1024), ("tetrahedral", 2048),
                       ("trilinear", 2048)):

        n_passes = 1 if interp == "trilinear" else 2

        def mk(kernel, lq, ktot, bm=bm):
            def step(r, g, b):
                rf, gf, bf = r.reshape(-1), g.reshape(-1), b.reshape(-1)
                npix = rf.shape[0]
                pad = (-npix) % bm
                if pad:
                    rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
                    gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
                    bf = jnp.concatenate([bf, jnp.zeros((pad,), bf.dtype)])
                rgb3 = jnp.stack([rf, gf, bf]).astype(jnp.float32)
                out = launch(kernel, rgb3, lq, sv, 2 * rows_pad, ktot, bm)
                return (out[0, :npix], out[1, :npix], out[2, :npix])
            return jax.jit(step)

        floor_j = mk(functools.partial(_floor_kernel, N, prep.ones_row,
                                       interp, lperm.shape[1], dmin, dmax),
                     lq_perm, lperm.shape[1])
        quad4_j = mk(functools.partial(_quad4_kernel, N, prep.ones_row,
                                       interp, tuple(widths), dmin, dmax),
                     lq_perm, lperm.shape[1])

        @jax.jit
        def base_step(r, g, b, interp=interp):
            return apply_lut_planes(r, g, b, prep, interp, strategy="mxu",
                                    precision="int8_fast")

        ms_f = timed(floor_j, r, g, b)
        ms_q4 = timed(quad4_j, r, g, b)
        ms_b = timed(base_step, r, g, b)
        print(f"{interp:11s} BM={bm}: base {ms_b:6.2f}  floor {ms_f:6.2f}  "
              f"quad4 {ms_q4:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
