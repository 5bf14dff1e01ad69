"""Round-4: attack the 33^3 VPU-bound components found by r6_33cube_floor.

That ablation (on-chip): dot 9.41 ms vs 6.61 padded floor; taps/coords
5.68; reduce+ident 6.39; masks ~1-2; production 15.71 (partial VPU/MXU
overlap). The kernel is VPU-bound: the r-tap build (f32 selects over
(n, bm)) and the 12 per-(c,q) mul+reduce pairs are the targets.

Formulation candidates, each timed as a full-kernel variant vs baseline:
  A. rw via i32-select masks + convert + mul (the r3 mask trick applied to
     the f32 tap build: where(eq, wp, 0) -> convert(where(eq,1,0))*wp).
  B. single fused rw application: tile rw to (3n, bm) once (3x fewer mul
     ops than 12 separate (n, bm) muls) then 3 segment reduces.
  C. both A and B.
Parity asserted vs the production body on every variant (same block).
"""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L

SMOKE = bool(os.environ.get("SMOKE"))
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
n = 33
H, W = (16, 256) if SMOKE else (2160, 3840)
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

rows_pad = prep.rows_pad
lq = jnp.asarray(prep.lmat_qp[:rows_pad], jnp.int8)
sv = jnp.asarray(prep.scale_q1 * 254.0, jnp.float32)
ktot = lq.shape[1]
widths = prep.quad_widths
dmin = tuple(float(v) for v in prep.domain_min)
dmax = tuple(float(v) for v in prep.domain_max)


def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def make_kernel(variant, bm):
    i32_taps = variant in ("A", "C")
    fused_rw = variant in ("B", "C")

    def kern(rgb_ref, lq_ref, s_ref, out_ref):
        rgb = rgb_ref[:]
        pr, nr, dr = L._scaled_coords(rgb[0:1, :], n, dmin[0], dmax[0])
        pg, ng, dg = L._scaled_coords(rgb[1:2, :], n, dmin[1], dmax[1])
        pb, nb, db = L._scaled_coords(rgb[2:3, :], n, dmin[2], dmax[2])
        idx = jnp.concatenate([pr, pg, pb], axis=0)
        passes = L._passes_for_interp("tetrahedral", pr, nr, dr, pg, ng, dg,
                                      pb, nb, db, n)
        wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
        offs, masks, par_b, par_g = L._quad_setup(n, widths, idx, bm)

        if not i32_taps:
            rvs, scals = L._quad_pass_factors(n, 2, idx, wall, par_b,
                                              par_g, iota)
        else:
            # variant A: one-hot row masks via i32 select + convert, then
            # scale by the (1, bm) weights — mirrors the r3 i32-mask trick
            parb, clampb = par_b
            parg, clampg = par_g
            p0 = idx[0:1, :]
            nx0 = jnp.minimum(p0 + 1, n - 1)
            hp = jnp.where(iota == p0, 1, 0).astype(jnp.float32)
            hn = jnp.where(iota == nx0, 1, 0).astype(jnp.float32)
            rvs, scals = [], []
            for ps in range(2):
                wts = wall[6 * ps:6 * ps + 6, :]
                rvs.append(hp * wts[0:1, :] + hn * wts[1:2, :])
                wgp, wgn = wts[2:3, :], wts[3:4, :]
                wbp, wbn = wts[4:5, :], wts[5:6, :]
                web, wob = L._parity_weights(parb, clampb, wbp, wbn)
                weg, wog = L._parity_weights(parg, clampg, wgp, wgn)
                scals.append((web * weg, web * wog, wob * weg, wob * wog))

        s1 = s_ref[:, :]
        accs = [None, None, None]
        for q in range(4):
            m8 = jnp.where(masks[q], 1, 0).astype(jnp.int8)
            d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8,
                        preferred_element_type=jnp.int32)
            e = d.astype(jnp.float32) * s1
            rw = None
            for ps in range(2):
                t = rvs[ps] * scals[ps][q]
                rw = t if rw is None else rw + t
            if not fused_rw:
                for c in range(3):
                    contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
                    accs[c] = (contrib if accs[c] is None
                               else accs[c] + contrib)
            else:
                # variant B: one (3n, bm) multiply with the tiled rw, then
                # 3 segment reduces (3x fewer multiply ops)
                rw3 = jnp.concatenate([rw, rw, rw], axis=0)
                ew = e[:3 * n, :] * rw3
                for c in range(3):
                    contrib = jnp.sum(ew[c * n:(c + 1) * n, :], axis=0)
                    accs[c] = (contrib if accs[c] is None
                               else accs[c] + contrib)
        accs = L._ident_acc(n, 2, idx, wall, accs)
        out_ref[0, :] = accs[0]
        out_ref[1, :] = accs[1]
        out_ref[2, :] = accs[2]
        for c in range(3, 8):
            out_ref[c, :] = rgb[0, :]
    return kern


def bench(variant, bm, ref_out=None):
    npix = H * W
    pad = (-npix) % bm
    kern = make_kernel(variant, bm)

    def call(r, g, b):
        rf = jnp.concatenate([r.reshape(-1), jnp.zeros((pad,), r.dtype)])
        gf = jnp.concatenate([g.reshape(-1), jnp.zeros((pad,), g.dtype)])
        bf = jnp.concatenate([b.reshape(-1), jnp.zeros((pad,), b.dtype)])
        rgb3 = jnp.stack([rf, gf, bf])
        return pl.pallas_call(
            kern,
            grid=((npix + pad) // bm,),
            in_specs=[
                pl.BlockSpec((3, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_pad, ktot), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, npix + pad), jnp.float32),
            interpret=SMOKE,
        )(rgb3, lq, sv)

    @jax.jit
    def fval(r, g, b):
        return call(r, g, b)[:3]

    @jax.jit
    def f1(r, g, b):
        return jnp.sum(call(r, g, b)[0])

    @jax.jit
    def f5(r, g, b):
        s = jnp.float32(0.0)
        for _ in range(5):
            s = s + jnp.sum(call(r + s * jnp.float32(1e-30), g, b)[0])
        return s

    try:
        out = np.asarray(fval(rj, gj, bj))
        if ref_out is not None:
            md = float(np.abs(out - ref_out).max())
            assert md < 1e-4, f"variant {variant} diverges: {md}"
        t1 = sync_time(f1, rj, gj, bj)
        t5 = sync_time(f5, rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"variant[{variant}] bm{bm:5d}: {per*1e3:7.2f} ms", flush=True)
        return out, per
    except Exception as e:
        print(f"variant[{variant}] bm{bm} FAILED: {str(e)[:250]}", flush=True)
        return None, None


bm = 256 if SMOKE else 4096
ref, t0 = bench("base", bm)
for v in ("A", "B", "C"):
    bench(v, bm, ref_out=ref)
