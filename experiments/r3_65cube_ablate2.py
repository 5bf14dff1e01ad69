"""Round-3 65^3 attack, step 2: finish the block sweep for the direct
int8_lite tier and ablate the kernel's cost components (mask build vs dot
vs post-dot) with stripped-down pallas kernels sharing the library's own
helpers."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(65)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
n = 65
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def bench_apply(label, interp, precision, bm):
    import lut_renderer_tpu.ops.lut3d as l3
    orig = l3._block_pixels
    l3._block_pixels = lambda nn, mode="exact", n_passes=2, _bm=bm: _bm
    try:
        @jax.jit
        def f1(r, g, b):
            r, g, b = L.apply_lut_planes(r, g, b, prep, interp,
                                         precision=precision)
            return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)

        @jax.jit
        def f5(r, g, b):
            for _ in range(5):
                r, g, b = L.apply_lut_planes(r, g, b, prep, interp,
                                             precision=precision)
            return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
        t1 = sync_time(f1, rj, gj, bj)
        t5 = sync_time(f5, rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{label:44s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        l3._block_pixels = orig


# ---- ablation kernels (int8_lite structure, tetra) ----
rows_pad = prep.rows_pad
lq = jnp.asarray(prep.lmat_qp[:rows_pad], jnp.int8)
sv = jnp.asarray(prep.scale_q1 * 254.0, jnp.float32)
ktot = lq.shape[1]
widths = prep.quad_widths
dmin = tuple(float(v) for v in prep.domain_min)
dmax = tuple(float(v) for v in prep.domain_max)


def make_ablate(stage, bm):
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
        if stage == "taps":
            # coordinate+tap math only; touch masks shallowly via row 0
            acc = sum(jnp.sum(jnp.where(m[0:1, :], 1.0, 0.0)) for m in masks)
            out_ref[0, :] = wall[0, :] + acc
            for c in range(1, 8):
                out_ref[c, :] = rgb[0, :]
            return
        rvs, scals = L._quad_pass_factors(n, 2, idx, wall, par_b, par_g,
                                          iota)
        if stage == "masks":
            # build + consume the full int8 masks without the dot
            tot = None
            for q in range(4):
                m8 = jnp.where(masks[q], 1.0, 0.0).astype(jnp.int8)
                s = jnp.sum(m8.astype(jnp.float32), axis=0)
                tot = s if tot is None else tot + s
            out_ref[0, :] = tot
            for c in range(1, 8):
                out_ref[c, :] = rgb[0, :]
            return
        if stage == "dot":
            # masks + dots, skip dequant/reduce (sum raw int32)
            tot = None
            for q in range(4):
                m8 = jnp.where(masks[q], 1.0, 0.0).astype(jnp.int8)
                d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8,
                            preferred_element_type=jnp.int32)
                s = jnp.sum(d.astype(jnp.float32), axis=0)
                tot = s if tot is None else tot + s
            out_ref[0, :] = tot
            for c in range(1, 8):
                out_ref[c, :] = rgb[0, :]
            return
        raise ValueError(stage)
    return kern


def bench_ablate(stage, bm):
    npix = H * W
    pad = (-npix) % bm
    kern = make_ablate(stage, bm)

    @jax.jit
    def f(r, g, b):
        rf = jnp.concatenate([r.reshape(-1), jnp.zeros((pad,), r.dtype)])
        gf = jnp.concatenate([g.reshape(-1), jnp.zeros((pad,), g.dtype)])
        bf = jnp.concatenate([b.reshape(-1), jnp.zeros((pad,), b.dtype)])
        rgb3 = jnp.stack([rf, gf, bf])
        out = pl.pallas_call(
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
        )(rgb3, lq, sv)
        return jnp.sum(out[0])

    try:
        t = sync_time(f, rj, gj, bj)
        # single-shot timing includes the ~30 ms sync overhead; report both
        print(f"ablate[{stage:5s}] bm{bm:5d}: {t*1e3:7.1f} ms raw "
              f"(~{(t-0.03)*1e3:6.1f} ms净)", flush=True)
    except Exception as e:
        print(f"ablate[{stage}] bm{bm} FAILED: {str(e)[:200]}", flush=True)


bench_apply("direct int8_lite tetra bm2048", "tetrahedral", "int8_lite", 2048)
bench_apply("direct int8_lite tri bm1024", "trilinear", "int8_lite", 1024)
bench_apply("direct int8_lite tri bm2048", "trilinear", "int8_lite", 2048)
for stage in ("taps", "masks", "dot"):
    bench_ablate(stage, 1024)
