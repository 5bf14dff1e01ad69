"""ARCHIVED measurement: pins the pre-merge split-launcher API
(_launch_resid2/_launch_coarse were removed from ops/lut3d.py after the
merged coarse2 kernel landed); kept for the measurement record only.

int4 residual kernel prototype for the 65^3 coarse+residual decomposition.

The residual table R = L - U(C) has tiny magnitude; int4 (x int4 weights at
offset-14 coding) runs the MXU at ~2.4x the int8 rate (989 vs 403-470 TOPS,
experiments/int4_dot.py). b-parity split retained (one-tap b per sub-tile),
g stays 2-tap via a quadrant-style select of two scalar rows.

Compares: production coarse2x_tri vs (exact coarse + int4 trilinear resid),
timing at 4K + NumPy accuracy sim vs exact.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import (
    _fine_taps_remapped, _launch_coarse, apply_lut_planes,
)

SYNC_MS = 30.0
H, W = 2160, 3840
N = 65


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def quant_resid_int4(resid_lmat: np.ndarray):
    """Per-row symmetric int4 (codes -7..7), scale folded with the offset-14
    weight dequant: w stored round(w*14)-7, so contribution = q*s * (w14-7+7)
    -> dequant scale = s/14, bias = 7 * rowsum(q) * s/14."""
    absmax = np.abs(resid_lmat).max(axis=1, keepdims=True)
    s = absmax / 7.0
    safe = np.where(s > 0, s, 1.0)
    q = np.clip(np.round(resid_lmat / safe), -7, 7).astype(np.int8)
    sf = (s / 7.0).astype(np.float32)
    bias = np.zeros_like(sf)
    return q, sf, bias


def _resid4_kernel(n_fine, n, ones_row, interp, dmin, dmax,
                   rgb_ref, lqe_ref, lqo_ref, s_ref, bdive_ref, bdivo_ref,
                   out_ref):
    """int4 b-parity residual: production resid2 build shape (repeat of the
    b-weight-folded g-taps, single select vs the (K, 1) b-plane map), with
    truncate-at-7 weights (production int8 shape, scale 7)."""
    rgb = rgb_ref[:]
    idx, wall, n_passes = _fine_taps_remapped(rgb, n_fine, n, interp,
                                              dmin, dmax)
    bm = idx.shape[1]
    half = lqe_ref.shape[0]
    ne = (n + 1) // 2
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    bdive = bdive_ref[:]
    bdivo = bdivo_ref[:]

    pb = idx[2:3, :]
    parity = pb % 2
    even = parity == 0
    clamp = pb == (n - 1)
    pe = (pb + parity) // 2
    po = pb // 2

    s1 = s_ref[:half, :]
    bias = s_ref[half:2 * half, :]
    lqe = lqe_ref[:]
    lqo = lqo_ref[:]

    acc = [None, None, None]
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]

        def tap(axis, scale=1.0):
            p = idx[axis:axis + 1, :]
            nx = jnp.minimum(p + 1, n - 1)
            wp = wts[2 * axis:2 * axis + 1, :] * scale
            wn = wts[2 * axis + 1:2 * axis + 2, :] * scale
            return (jnp.where(iota_n == p, wp, 0.0)
                    + jnp.where(iota_n == nx, wn, 0.0))

        rv = tap(0)
        g7 = tap(1, 7.0)
        wgp, wgn = wts[2:3, :], wts[3:4, :]
        wbp, wbn = wts[4:5, :], wts[5:6, :]
        we = jnp.where(even, wbp + jnp.where(clamp, wbn, 0.0), wbn)
        wo = jnp.where(even, jnp.where(clamp, 0.0, wbn), wbp)
        true_sum = (wgp + wgn) * (wbp + wbn)

        ae = pltpu.repeat(g7 * we, ne, axis=0)
        w4e = jnp.where(bdive == pe, ae, 0.0).astype(jnp.int4)
        ao = pltpu.repeat(g7 * wo, n // 2, axis=0)
        w4o = jnp.where(bdivo == po, ao, 0.0).astype(jnp.int4)
        seg = (jnp.dot(lqe, w4e, preferred_element_type=jnp.int32)
               + jnp.dot(lqo, w4o, preferred_element_type=jnp.int32))
        t = seg.astype(jnp.float32) * s1 + bias
        meas = t[ones_row:ones_row + 1, :]
        scale = jnp.where(jnp.abs(meas) > 0.01, true_sum / meas, 1.0)
        for c in range(3):
            segc = t[c * n:(c + 1) * n, :]
            contrib = jnp.sum(segc * rv, axis=0) * scale[0, :]
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    for c in range(3):
        out_ref[c, :] = acc[c]


def launch_resid4(rgb3, prep, n_fine, n, interp, dmin, dmax):
    npix = rgb3.shape[1]
    rows = prep.rows_pad
    ne, no = (n + 1) // 2, n // 2
    # int4 quantization of the residual lmat (rebuild from resid_q*scale to
    # keep the experiment standalone; production would quantize the raw f32)
    rows_f = 3 * n
    r_f32 = prep.resid_q.astype(np.float32) * (prep.resid_scale * 127.0)
    q4, s4, b4 = quant_resid_int4(r_f32)
    r3 = q4.reshape(rows, n, n)
    lqe = jnp.asarray(np.ascontiguousarray(
        r3[:, ::2, :].reshape(rows, ne * n)), jnp.int8)
    lqo = jnp.asarray(np.ascontiguousarray(
        r3[:, 1::2, :].reshape(rows, no * n)), jnp.int8)
    sv = jnp.asarray(np.concatenate([s4, b4], axis=0), jnp.float32)
    bdive = jnp.asarray(
        (np.arange(ne * n, dtype=np.int32) // n).reshape(ne * n, 1))
    bdivo = jnp.asarray(
        (np.arange(no * n, dtype=np.int32) // n).reshape(no * n, 1))
    bm = 1024
    assert npix % bm == 0
    kernel = functools.partial(_resid4_kernel, n_fine, n, prep.ones_row,
                               interp, dmin, dmax)
    return pl.pallas_call(
        kernel,
        grid=(npix // bm,),
        in_specs=[
            pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, ne * n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, no * n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * rows, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ne * n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((no * n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
    )(rgb3, lqe.astype(jnp.int4), lqo.astype(jnp.int4), sv, bdive, bdivo)


def film_lut65():
    n = 65
    ramp = np.linspace(0, 1, n, dtype=np.float32)
    r, g, b = np.meshgrid(ramp, ramp, ramp, indexing="ij")
    rgb = np.stack([r, g, b], -1)
    luma = 0.2126 * r + 0.7152 * g + 0.0722 * b
    rgb = rgb * rgb * (3 - 2 * rgb) * 0.85 + rgb * 0.15
    l3 = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
          + 0.0722 * rgb[..., 2])[..., None]
    rgb = l3 + (rgb - l3) * 1.15
    rgb[..., 0] += 0.04 * luma * (1 - luma) * 4
    rgb[..., 2] -= 0.02 * luma
    rgb = np.clip(rgb, 0, 1) ** np.array([0.97, 1.0, 1.05], np.float32)
    lut = Lut3D.identity(n)
    lut.table = np.clip(rgb, 0, 1).astype(np.float32)
    return lut


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

    lut = film_lut65()
    prep = prepare_lut(lut)
    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)

    for interp, resid_interp in (("tetrahedral", "trilinear"),
                                 ("tetrahedral", "tetrahedral"),
                                 ("trilinear", "trilinear")):
        def i4_step(r, g, b, interp=interp, ri=resid_interp):
            rf, gf, bf = r.reshape(-1), g.reshape(-1), b.reshape(-1)
            npix = rf.shape[0]
            pad = (-npix) % 1024
            if pad:
                rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
                gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
                bf = jnp.concatenate([bf, jnp.zeros((pad,), bf.dtype)])
            rgb3 = jnp.stack([rf, gf, bf]).astype(jnp.float32)
            out = launch_resid4(rgb3, prep, N, N, ri, dmin, dmax)
            out = out + _launch_coarse(rgb3, prep.coarse, N, interp,
                                       "exact", dmin, dmax, False)
            return (out[0, :npix].reshape(r.shape),
                    out[1, :npix].reshape(r.shape),
                    out[2, :npix].reshape(r.shape))

        i4_j = jax.jit(i4_step)
        prec = "coarse2x_tri" if resid_interp != interp else "coarse2x"

        @jax.jit
        def base_step(r, g, b, interp=interp, prec=prec):
            return apply_lut_planes(r, g, b, prep, interp, strategy="mxu",
                                    precision=prec)

        # accuracy vs exact gather on a probe grid
        sub = 1.0 * np.mgrid[0:160, 0:160].astype(np.float32) / 160
        pr_ = jnp.asarray(rng.uniform(0, 1, (256, 512)).astype(np.float32))
        pg_ = jnp.asarray(rng.uniform(0, 1, (256, 512)).astype(np.float32))
        pb_ = jnp.asarray(rng.uniform(0, 1, (256, 512)).astype(np.float32))
        from lut_renderer_tpu.colorcore import max_delta_e76
        er, eg, eb = apply_lut_planes(pr_, pg_, pb_, prep, interp,
                                      strategy="gather")
        qr, qg, qb = i4_j(pr_, pg_, pb_)
        ours = np.stack([np.asarray(qr), np.asarray(qg), np.asarray(qb)], -1)
        ref = np.stack([np.asarray(er), np.asarray(eg), np.asarray(eb)], -1)
        de = max_delta_e76(np.clip(ref, 0, 1), np.clip(ours, 0, 1))

        ms_b = timed(base_step, r, g, b)
        ms_4 = timed(i4_j, r, g, b)
        print(f"{interp:11s} resid={resid_interp:11s}: base({prec}) "
              f"{ms_b:6.1f}  int4 {ms_4:6.1f} ms ({1e3/ms_4:4.1f} fps)  "
              f"dE76={float(de):.4f}", flush=True)


if __name__ == "__main__":
    main()
