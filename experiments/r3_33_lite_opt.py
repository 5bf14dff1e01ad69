"""Round-3: after the i32-mask win, the 33^3 int8_lite tier (16.3 ms) tied
the bf16 "fast" tier (16.5) — but its DOT is only ~7 ms (128x1216 int8),
so overheads dominate. Sweep blocks + try the dequant-fold here (it was a
wash at 65 where the dot dominates, but here the post-dot volume is the
cost), plus int8_fast blocks. If int8_lite lands clearly under "fast",
the N<=33 auto ladder should try it first (per-LUT gated as always)."""
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
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
n = 33
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


def bench_lib(label, interp, precision, bm):
    orig = L._block_pixels
    L._block_pixels = lambda nn, mode="exact", n_passes=2, _bm=bm: _bm
    try:
        def make(k):
            @jax.jit
            def f(r, g, b):
                for _ in range(k):
                    r, g, b = L.apply_lut_planes(r, g, b, prep, interp,
                                                 precision=precision)
                return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
            return f
        t1 = sync_time(make(1), rj, gj, bj)
        t5 = sync_time(make(5), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{label:44s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        L._block_pixels = orig


rows_pad = prep.rows_pad
lq_np = prep.lmat_qp[:rows_pad]
sv_np = (prep.scale_q1 * 254.0).astype(np.float32)
widths = prep.quad_widths
dmin = tuple(float(v) for v in prep.domain_min)
dmax = tuple(float(v) for v in prep.domain_max)
ktot = lq_np.shape[1]


def fold_kernel(bm, rgb_ref, lq_ref, s_ref, out_ref):
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
    rvs, scals = L._quad_pass_factors(n, 2, idx, wall, par_b, par_g, iota)
    s1 = s_ref[:, :]
    acc = [None, None, None]
    for q in range(4):
        m8 = jnp.where(masks[q], 1, 0).astype(jnp.int8)
        d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8,
                    preferred_element_type=jnp.int32)
        df = d.astype(jnp.float32)
        rw = None
        for ps in range(2):
            t = rvs[ps] * scals[ps][q]
            rw = t if rw is None else rw + t
        for c in range(3):
            rws = rw * s1[c * n:(c + 1) * n, :]
            contrib = jnp.sum(df[c * n:(c + 1) * n, :] * rws, axis=0)
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    acc = L._ident_acc(n, 2, idx, wall, acc)
    L._write_out(out_ref, acc)


def bench_fold(bm):
    npix = H * W
    pad = (-npix) % bm
    kern = functools.partial(fold_kernel, bm)

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
        return out[0].reshape(-1)[:npix].reshape(H, W), g, b

    def make(k):
        @jax.jit
        def f(r, g, b):
            for _ in range(k):
                r, g, b = apply3(r, g, b)
            return jnp.sum(r)
        return f
    try:
        t1 = sync_time(make(1), rj, gj, bj)
        t5 = sync_time(make(5), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"fold bm{bm:5d}: {per*1e3:7.1f} ms  {1/per:6.1f} fps",
              flush=True)
    except Exception as e:
        print(f"fold bm{bm}: FAILED {str(e)[:200]}", flush=True)


bench_lib("33 int8_lite tetra bm2048", "tetrahedral", "int8_lite", 2048)
bench_lib("33 int8_lite tetra bm4096", "tetrahedral", "int8_lite", 4096)
bench_lib("33 int8_lite tri bm4096", "trilinear", "int8_lite", 4096)
bench_fold(2048)
bench_lib("33 int8_fast tetra bm2048", "tetrahedral", "int8_fast", 2048)
bench_lib("33 fast tetra bm4096 (control)", "tetrahedral", "fast", 4096)

# post-i32-mask block sweep for the 65-cube direct tier (the optimum may
# have moved now that masks are cheap)
lut65 = Lut3D.identity(65)
lut65.table = np.clip(
    lut65.table + rng.uniform(-0.02, 0.02, lut65.table.shape
                              ).astype(np.float32), 0, 1)
prep65 = prepare_lut(lut65)


def bench65(label, bm):
    orig = L._block_pixels
    L._block_pixels = lambda nn, mode="exact", n_passes=2, _bm=bm: _bm
    try:
        def make(k):
            @jax.jit
            def f(r, g, b):
                for _ in range(k):
                    r, g, b = L.apply_lut_planes(r, g, b, prep65,
                                                 "tetrahedral",
                                                 precision="int8_lite")
                return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
            return f
        t1 = sync_time(make(1), rj, gj, bj)
        t5 = sync_time(make(5), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{label:44s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:200]}", flush=True)
    finally:
        L._block_pixels = orig


bench65("65 int8_lite tetra bm3072 (post-i32)", 3072)
bench65("65 int8_lite tetra bm4096 (post-i32)", 4096)
