"""Parity-quadrant W-build experiment for the int8 LUT kernel.

Hypothesis: the per-pass weight-tile build (repeat + band selects + product
+ round + convert ~= 7 full-size VPU ops, measured 10-11 ms/pass at N=33)
collapses to ~2 full-size ops if the K axis (g, b) is permuted into four
parity quadrants: within a quadrant every pixel is ONE-tap in both g and b,
so the tile is select(mask, broadcast(per-pixel scalar), -127) with the
masks hoisted across passes (targets depend only on cell indices).

Numerics are IDENTICAL to the production int8_fast path: same W entries,
int32 accumulation is order-independent, so outputs must match bit-exactly.
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

SYNC_MS = 30.0
H, W = 2160, 3840
SUBPAD = 32  # quadrant column padding (int8 sublane tile granularity)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def quad_permute_lmat(lmat: np.ndarray, n: int):
    """Permute (rows, N*N) columns k*N+j into 4 parity quadrants
    (b even/odd x g even/odd), each padded to SUBPAD columns.
    Returns (lmat_q, widths, offsets)."""
    rows = lmat.shape[0]
    cols = []
    widths = []
    for bs in (0, 1):
        for gs in (0, 1):
            ks = np.arange(bs, n, 2)
            js = np.arange(gs, n, 2)
            kk, jj = np.meshgrid(ks, js, indexing="ij")
            idx = (kk * n + jj).reshape(-1)
            w = _round_up(len(idx), SUBPAD)
            block = np.zeros((rows, w), lmat.dtype)
            block[:, : len(idx)] = lmat[:, idx]
            cols.append(block)
            widths.append(w)
    offs = np.cumsum([0] + widths[:-1]).tolist()
    return np.concatenate(cols, axis=1), widths, offs


def _quad_kernel(n, ones_row, interp, widths, offs, dmin, dmax,
                 rgb_ref, lq_ref, s_ref, out_ref):
    rgb = rgb_ref[:]
    bm = rgb.shape[1]
    pr, nr, dr = _scaled_coords(rgb[0:1, :], n, dmin[0], dmax[0])
    pg, ng, dg = _scaled_coords(rgb[1:2, :], n, dmin[1], dmax[1])
    pb, nb, db = _scaled_coords(rgb[2:3, :], n, dmin[2], dmax[2])
    idx = jnp.concatenate([pr, pg, pb], axis=0)
    passes = _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb, db, n)
    wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
    n_passes = len(passes)

    rows_l = lq_ref.shape[0]
    half = rows_l // 2
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)

    ne = (n + 1) // 2
    no = n // 2
    # per-pixel parity split of the g/b cells (pass-independent)
    def split(p):
        par = p % 2
        clamp = p == (n - 1)
        e_idx = (p + par) // 2
        o_idx = p // 2
        return par, clamp, e_idx, o_idx

    parb, clampb, be, bo = split(idx[2:3, :])
    parg, clampg, ge, go = split(idx[1:2, :])

    # hoisted quadrant one-hot masks; quadrant (b-parity, g-parity) column
    # layout is b-major/g-minor with per-quadrant zero-padding at the end
    ng_widths = {0: ne, 1: no}
    masks = []
    qi = 0
    for bs in (0, 1):
        for gs in (0, 1):
            kw = widths[qi]
            bq = be if bs == 0 else bo
            gq = ge if gs == 0 else go
            tgt = bq * ng_widths[gs] + gq
            it = jax.lax.broadcasted_iota(jnp.int32, (kw, bm), 0)
            masks.append(it == tgt)
            qi += 1

    s1 = s_ref[:half, :]
    s2 = s_ref[half:2 * half, :]
    bias = s_ref[2 * half:3 * half, :]

    lq = lq_ref[:]
    acc = [None, None, None]
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]

        def tap(axis):
            p = idx[axis:axis + 1, :]
            nx = jnp.minimum(p + 1, n - 1)
            wp = wts[2 * axis:2 * axis + 1, :]
            wn = wts[2 * axis + 1:2 * axis + 2, :]
            return (jnp.where(iota_n == p, wp, 0.0)
                    + jnp.where(iota_n == nx, wn, 0.0))

        rv = tap(0)
        wgp = wts[2:3, :]
        wgn = wts[3:4, :]
        wbp = wts[4:5, :]
        wbn = wts[5:6, :]
        ew = jnp.where(parb == 0, wbp + jnp.where(clampb, wbn, 0.0), wbn)
        ow = jnp.where(parb == 0, jnp.where(clampb, 0.0, wbn), wbp)
        egw = jnp.where(parg == 0, wgp + jnp.where(clampg, wgn, 0.0), wgn)
        ogw = jnp.where(parg == 0, jnp.where(clampg, 0.0, wgn), wgp)
        scal = [ew * egw, ew * ogw, ow * egw, ow * ogw]
        tiles = []
        for q in range(4):
            srow = jnp.round(scal[q] * 254.0 - 127.0)   # (1, BM)
            tiles.append(jnp.where(masks[q], srow, -127.0).astype(jnp.int8))
        w8 = jnp.concatenate(tiles, axis=0)
        seg = jnp.dot(lq, w8, preferred_element_type=jnp.int32).astype(
            jnp.float32)
        t = seg[:half, :] * s1 + seg[half:, :] * s2 + bias
        true_sum = (wgp + wgn) * (wbp + wbn)
        meas = t[ones_row:ones_row + 1, :]
        scale = jnp.where(jnp.abs(meas) > 0.01, true_sum / meas, 1.0)
        for c in range(3):
            segc = t[c * n:(c + 1) * n, :]
            contrib = jnp.sum(segc * rv, axis=0) * scale[0, :]
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    for c in range(3):
        out_ref[c, :] = acc[c]


def run_quad(rgb3, prep, n, interp, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lmatq = np.concatenate([prep.lmat_q1, prep.lmat_q2], axis=0).astype(
        np.float32)
    lperm, widths, offs = quad_permute_lmat(lmatq, n)
    lq = jnp.asarray(lperm, jnp.int8)
    ktot = lperm.shape[1]
    rows_pad = prep.rows_pad
    sv = jnp.asarray(
        np.concatenate([prep.scale_q1, prep.scale_q2, prep.bias_q,
                        np.zeros_like(prep.bias_q)], axis=0), jnp.float32)
    npix = rgb3.shape[1]
    n_passes = 1 if interp in ("nearest", "trilinear") else 2
    bm = _block_pixels(n, "int8_fast", n_passes)
    assert npix % bm == 0
    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)
    kernel = functools.partial(_quad_kernel, n, prep.ones_row, interp,
                               widths, offs, dmin, dmax)
    out = pl.pallas_call(
        kernel,
        grid=(npix // bm,),
        in_specs=[
            pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * rows_pad, ktot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * rows_pad, 1), lambda i: (0, 0),
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

    for n in (33,):
        lut = Lut3D.identity(n)
        lut.table = np.clip(
            lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(
                np.float32), 0, 1)
        prep = prepare_lut(lut)

        for interp in ("tetrahedral", "trilinear"):
            n_passes = 1 if interp == "trilinear" else 2
            bm = _block_pixels(n, "int8_fast", n_passes)

            def quad_step(r, g, b, interp=interp, prep=prep, bm=bm):
                rf, gf, bf = r.reshape(-1), g.reshape(-1), b.reshape(-1)
                npix = rf.shape[0]
                pad = (-npix) % bm
                if pad:
                    rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
                    gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
                    bf = jnp.concatenate([bf, jnp.zeros((pad,), bf.dtype)])
                rgb3 = jnp.stack([rf, gf, bf]).astype(jnp.float32)
                out = run_quad(rgb3, prep, n, interp)
                return (out[0, :npix].reshape(r.shape),
                        out[1, :npix].reshape(r.shape),
                        out[2, :npix].reshape(r.shape))

            quad_j = jax.jit(quad_step)

            @jax.jit
            def base_step(r, g, b, interp=interp, prep=prep):
                return apply_lut_planes(r, g, b, prep, interp,
                                        strategy="mxu",
                                        precision="int8_fast")

            # correctness first (bit-exact expected)
            sub_r, sub_g, sub_b = r[:256, :512], g[:256, :512], b[:256, :512]
            qr, qg, qb = [np.asarray(x) for x in quad_j(sub_r, sub_g, sub_b)]
            br_, bg_, bb_ = [np.asarray(x) for x in
                             base_step(sub_r, sub_g, sub_b)]
            diff = max(np.abs(qr - br_).max(), np.abs(qg - bg_).max(),
                       np.abs(qb - bb_).max())
            ms_q = timed(quad_j, r, g, b)
            ms_b = timed(base_step, r, g, b)
            print(f"N={n} {interp:11s}: base {ms_b:6.2f} ms  quad {ms_q:6.2f}"
                  f" ms  ({1e3/ms_q:5.1f} fps)  maxdiff={diff:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
