"""Round-3 follow-up: the mask build is the biggest VPU term at N=33 (the
dot is only ~6.6 ms of the 15.9 ms int8_lite tetra frame). The adopted
route is compare -> i32 select {1,0} -> int8 convert. Two variants never
measured:

  A (current)  m8 = where(mask, 1, 0).astype(int8)
  B            m8 = mask.astype(int8)            # direct i1 -> i8 convert
  C            all 4 masks converted up-front, then 4 dots, then 4 reduces
               (scheduling hint: VPU mask work can't hide under the first
               dot today because mask q feeds dot q immediately)

Parity-checked vs the library path; timings are chained x5 in one jit
(sync tax amortized), medians of scalar-readback timing.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D, max_delta_e76
from lut_renderer_tpu.ops import prepare_lut
import lut_renderer_tpu.ops.lut3d as L

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(s)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_prep(n):
    lut = Lut3D.identity(n)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.02, 0.02, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


def lite_kernel(n, prep, interp, route, bm, rgb_ref, lq_ref, s_ref, out_ref):
    widths = prep.quad_widths
    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)
    rgb = rgb_ref[:]
    pr, nr, dr = L._scaled_coords(rgb[0:1, :], n, dmin[0], dmax[0])
    pg, ng, dg = L._scaled_coords(rgb[1:2, :], n, dmin[1], dmax[1])
    pb, nb, db = L._scaled_coords(rgb[2:3, :], n, dmin[2], dmax[2])
    idx = jnp.concatenate([pr, pg, pb], axis=0)
    passes = L._passes_for_interp(interp, pr, nr, dr, pg, ng, dg,
                                  pb, nb, db, n)
    n_passes = len(passes)
    wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    offs, masks, par_b, par_g = L._quad_setup(n, widths, idx, bm)
    rvs, scals = L._quad_pass_factors(n, n_passes, idx, wall, par_b, par_g,
                                      iota)
    s1 = s_ref[:, :]
    acc = [None, None, None]

    def to8(mq):
        if route == "astype":
            return mq.astype(jnp.int8)
        return jnp.where(mq, 1, 0).astype(jnp.int8)

    if route == "prebuilt":
        m8s = [jnp.where(masks[q], 1, 0).astype(jnp.int8) for q in range(4)]
        ds = [jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8s[q],
                      preferred_element_type=jnp.int32) for q in range(4)]
        for q in range(4):
            e = ds[q].astype(jnp.float32) * s1
            rw = None
            for ps in range(n_passes):
                t = rvs[ps] * scals[ps][q]
                rw = t if rw is None else rw + t
            for c in range(3):
                contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
                acc[c] = contrib if acc[c] is None else acc[c] + contrib
    else:
        for q in range(4):
            m8 = to8(masks[q])
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
    acc = L._ident_acc(n, n_passes, idx, wall, acc)
    L._write_out(out_ref, acc)


def bench(n, prep, interp, route, bm):
    rows_pad = prep.rows_pad
    lq_np = prep.lmat_qp[:rows_pad]
    sv_np = (prep.scale_q1 * 254.0).astype(np.float32)
    ktot = lq_np.shape[1]
    npix = H * W
    pad = (-npix) % bm
    kern = functools.partial(lite_kernel, n, prep, interp, route, bm)

    def apply3(r, g, b):
        rf = jnp.concatenate([r.reshape(-1), jnp.zeros((pad,), r.dtype)])
        gf = jnp.concatenate([g.reshape(-1), jnp.zeros((pad,), g.dtype)])
        bf = jnp.concatenate([b.reshape(-1), jnp.zeros((pad,), b.dtype)])
        rgb3 = jnp.stack([rf, gf, bf])
        out = pl.pallas_call(
            kern, grid=((npix + pad) // bm,),
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
        )(rgb3, jnp.asarray(lq_np, jnp.int8), jnp.asarray(sv_np))
        o = out[:3, :npix]
        return (o[0].reshape(H, W), o[1].reshape(H, W), o[2].reshape(H, W))

    def make(k):
        @jax.jit
        def f(r, g, b):
            for _ in range(k):
                r, g, b = apply3(r, g, b)
            return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
        return f
    try:
        # parity of one application vs the exact tier
        ro, go, bo = jax.jit(apply3)(rj, gj, bj)
        re, ge, be = L.apply_lut_planes(rj, gj, bj, prep, interp,
                                        precision="exact")
        got = np.stack([np.asarray(ro), np.asarray(go), np.asarray(bo)], -1)
        want = np.stack([np.asarray(re), np.asarray(ge), np.asarray(be)], -1)
        de = max_delta_e76(np.clip(got, 0, 1), np.clip(want, 0, 1))
        t1 = sync_time(make(1), rj, gj, bj)
        t5 = sync_time(make(5), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"n={n} {interp:11s} {route:9s} bm{bm:5d}: {per*1e3:7.1f} ms "
              f"{1/per:6.1f} fps  dE76 {de:.4f}", flush=True)
    except Exception as e:
        print(f"n={n} {interp} {route} bm{bm}: FAILED {str(e)[:160]}",
              flush=True)


prep33 = make_prep(33)
prep65 = make_prep(65)
for route in ("select", "astype", "prebuilt"):
    bench(33, prep33, "tetrahedral", route, 4096)
for route in ("select", "astype"):
    bench(33, prep33, "trilinear", route, 4096)
    bench(65, prep65, "tetrahedral", route, 4096)
