"""Round-4 VERDICT #3: speed-of-light accounting for the 33^3 HEADLINE tier
(int8_lite tetra, bm 4096), mirroring the 65^3 discipline of
r3_65cube_ablate2.py.

Derived bounds (v5e, measured 370 int8 TOPS at our shapes, 4K = 8.29 Mpx):
  - unpadded information floor: 3*33^3 = 107,811 int8 MACs/px
      -> 107811 * 8.29e6 * 2 / 370e12 = 4.83 ms / 4K frame
  - padded dot as launched:     rows 128 x K 1152 = 147,456 MACs/px
      -> 6.61 ms / 4K frame
Measured kernel time was 15.9 ms (r3) -> ~2.4x the padded dot floor; this
script decomposes the non-dot remainder with stripped kernels that share
the library's own helpers, stage by stage:
  taps    coords + pass weights + quadrant parity (VPU only)
  masks   + the 4 one-hot i32-select->int8 masks, consumed by a 32-row dot
  dot     + the full 128-row int8 quadrant dots (raw i32 out)
  dequant + i32->f32 convert and per-row dequant scale (full volume)
  full    the production _int8_quad_body + identity term
Deltas between consecutive stages attribute the cost.
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

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
n = 33
H, W = (16, 256) if os.environ.get("SMOKE") else (2160, 3840)
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

rows_pad = prep.rows_pad
lq = jnp.asarray(prep.lmat_qp[:rows_pad], jnp.int8)       # int8_lite plane
sv = jnp.asarray(prep.scale_q1 * 254.0, jnp.float32)
ktot = lq.shape[1]
widths = prep.quad_widths
dmin = tuple(float(v) for v in prep.domain_min)
dmax = tuple(float(v) for v in prep.domain_max)
print(f"rows_pad={rows_pad} ktot={ktot} widths={widths}", flush=True)


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
        print(f"{label:44s} {per*1e3:7.2f} ms  {1/per:6.1f} fps", flush=True)
        return per
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:200]}", flush=True)
        return None
    finally:
        l3._block_pixels = orig


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
        rvs, scals = L._quad_pass_factors(n, 2, idx, wall, par_b, par_g,
                                          iota)
        if stage == "taps":
            # coordinate+tap math only; touch masks shallowly via row 0
            acc = sum(jnp.sum(jnp.where(m[0:1, :], 1.0, 0.0)) for m in masks)
            rwa = sum(jnp.sum(rvs[ps] * scals[ps][0], axis=0)
                      for ps in range(2))
            out_ref[0, :] = wall[0, :] + acc + rwa
            for c in range(1, 8):
                out_ref[c, :] = rgb[0, :]
            return
        if stage == "masks":
            # build the full masks; consume via a 32-row dot (1/4 the rows
            # -> the consumer adds ~dot/4, subtracted via the dot stage)
            tot = None
            for q in range(4):
                m8 = jnp.where(masks[q], 1, 0).astype(jnp.int8)
                d = jnp.dot(lq_ref[:32, offs[q]:offs[q] + widths[q]], m8,
                            preferred_element_type=jnp.int32)
                s = d[0, :].astype(jnp.float32)
                tot = s if tot is None else tot + s
            out_ref[0, :] = tot
            for c in range(1, 8):
                out_ref[c, :] = rgb[0, :]
            return
        if stage in ("dot", "dequant", "reduce"):
            accs = [None, None, None]
            for q in range(4):
                m8 = jnp.where(masks[q], 1, 0).astype(jnp.int8)
                d = jnp.dot(lq_ref[:, offs[q]:offs[q] + widths[q]], m8,
                            preferred_element_type=jnp.int32)
                if stage == "dot":
                    s = d[0, :].astype(jnp.float32)
                    accs[0] = s if accs[0] is None else accs[0] + s
                    continue
                df = d.astype(jnp.float32)
                e = df * s_ref[:, :]
                if stage == "dequant":
                    s = e[0, :]
                    accs[0] = s if accs[0] is None else accs[0] + s
                    continue
                rw = None
                for ps in range(2):
                    t = rvs[ps] * scals[ps][q]
                    rw = t if rw is None else rw + t
                for c in range(3):
                    contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
                    accs[c] = contrib if accs[c] is None else accs[c] + contrib
            if stage == "reduce":
                accs = L._ident_acc(n, 2, idx, wall, accs)
            out_ref[0, :] = accs[0]
            out_ref[1, :] = accs[1] if accs[1] is not None else rgb[1, :]
            out_ref[2, :] = accs[2] if accs[2] is not None else rgb[2, :]
            for c in range(3, 8):
                out_ref[c, :] = rgb[0, :]
            return
        raise ValueError(stage)
    return kern


def bench_ablate(stage, bm):
    npix = H * W
    pad = (-npix) % bm
    kern = make_ablate(stage, bm)

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
            interpret=bool(os.environ.get("SMOKE")),
        )(rgb3, lq, sv)

    @jax.jit
    def f1(r, g, b):
        return jnp.sum(call(r, g, b)[0])

    @jax.jit
    def f5(r, g, b):
        # chain a real data dependency through each iteration so XLA can't
        # CSE the 5 identical calls into one (first run of this script did
        # exactly that: every stage measured ~0 ms)
        s = jnp.float32(0.0)
        for _ in range(5):
            s = s + jnp.sum(call(r + s * jnp.float32(1e-30), g, b)[0])
        return s

    try:
        t1 = sync_time(f1, rj, gj, bj)
        t5 = sync_time(f5, rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"ablate[{stage:7s}] bm{bm:5d}: {per*1e3:7.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"ablate[{stage}] bm{bm} FAILED: {str(e)[:250]}", flush=True)
        return None


full = None if os.environ.get("SMOKE") else bench_apply("production int8_lite tetra bm4096", "tetrahedral",
                   "int8_lite", 4096)
for bm in ((256,) if os.environ.get("SMOKE") else (4096,)):
    res = {}
    for stage in ("taps", "masks", "dot", "dequant", "reduce"):
        res[stage] = bench_ablate(stage, bm)
    ok = all(v is not None for v in res.values()) and full is not None
    if ok:
        # masks = taps + M + D/4 (32-row consumer); dot = taps + M + D
        D = (res["dot"] - res["masks"]) * 4.0 / 3.0
        M = res["masks"] - res["taps"] - D / 4.0
        print(f"\n--- decomposition @ bm{bm} (4K ms) ---")
        print(f"taps/coords     : {res['taps']*1e3:7.2f}")
        print(f"mask build      : {M*1e3:7.2f}")
        print(f"dot (128 rows)  : {D*1e3:7.2f}")
        print(f"convert+dequant : {(res['dequant'] - res['dot'])*1e3:7.2f}")
        print(f"reduce+ident    : {(res['reduce'] - res['dequant'])*1e3:7.2f}")
        print(f"stage-full      : {res['reduce']*1e3:7.2f} vs production "
              f"{full*1e3:7.2f}")
    print(f"padded dot floor 6.61 ms; information floor 4.83 ms", flush=True)
