"""Round-3: unstacked kernel operands + bm=W layout-free reshape.

The production launch stacks r/g/b into one (3, P) array — stored padded to
(8, P) in HBM (2.67x read inflation), written once (stack), sliced back out
(3 copies) — and reshapes (H, W) -> (P/bm, bm) flat, a tiled-layout copy
(~0.4 ms/plane at 8K). Trace (r3_8k_trace.py) attributes ~7 ms/8K-frame to
this glue. Variant here: three separate (P/bm, bm) operands and three
separate outputs, and bm == W so every reshape is layout-identity.

Measures production apply_lut_planes vs the planes variant, chained x4,
at 4K and 8K for int8_lite N=33 and N=65, bm in {W, 4096}.
"""
import functools
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import (
    apply_lut_planes, kernel_operands, _int8_quad_body, _scaled_coords,
    _passes_for_interp,
)

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def _planes_kernel_int8(n, interp, pair, widths, dmin, dmax,
                        r_ref, g_ref, b_ref, lq_ref, s_ref,
                        ro_ref, go_ref, bo_ref):
    bm = r_ref.shape[1]
    for sr in range(r_ref.shape[0]):
        r = r_ref[sr:sr + 1, :]
        g = g_ref[sr:sr + 1, :]
        b = b_ref[sr:sr + 1, :]
        pr, nr, dr = _scaled_coords(r, n, dmin[0], dmax[0])
        pg, ng, dg = _scaled_coords(g, n, dmin[1], dmax[1])
        pb, nb, db = _scaled_coords(b, n, dmin[2], dmax[2])
        idx = jnp.concatenate([pr, pg, pb], axis=0)
        passes = _passes_for_interp(interp, pr, nr, dr, pg, ng, dg, pb, nb,
                                    db, n)
        wall = jnp.concatenate([p.reshape(6, bm) for p in passes], axis=0)
        acc = _int8_quad_body(n, len(passes), widths, idx, wall, lq_ref,
                              s_ref, pair=pair)
        ro_ref[sr, :] = acc[0]
        go_ref[sr, :] = acc[1]
        bo_ref[sr, :] = acc[2]


def apply_planes(r, g, b, prep, interp, mode, bm, ops):
    n = prep.size
    shape = r.shape
    npix = int(np.prod(shape))
    assert npix % (8 * bm) == 0
    nr_rows = npix // bm
    rf = r.reshape(nr_rows, bm)
    gf = g.reshape(nr_rows, bm)
    bf = b.reshape(nr_rows, bm)
    dmin = tuple(float(v) for v in prep.domain_min)
    dmax = tuple(float(v) for v in prep.domain_max)
    pair = mode != "int8_lite"
    lq = jnp.asarray(ops["lq"], jnp.int8)
    sv = jnp.asarray(ops["sv"], jnp.float32)
    l_rows = 2 * prep.rows_pad if pair else prep.rows_pad
    ktot = lq.shape[1]
    kernel = functools.partial(_planes_kernel_int8, n, interp, pair,
                               prep.quad_widths, dmin, dmax)
    plane_spec = pl.BlockSpec((8, bm), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nr_rows // 8,),
        in_specs=[
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec((l_rows, ktot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_rows, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[plane_spec, plane_spec, plane_spec],
        out_shape=[jax.ShapeDtypeStruct((nr_rows, bm), jnp.float32)] * 3,
    )(rf, gf, bf, lq, sv)
    return tuple(o.reshape(shape) for o in out)


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(body, k=4):
    @jax.jit
    def f(*args):
        out = args
        for _ in range(k):
            out = body(*out)
        return out
    return f


for nsize in (33, 65):
    lut = Lut3D.identity(nsize)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.02, 0.02, lut.table.shape)
        .astype(np.float32), 0, 1)
    prep = prepare_lut(lut)
    ops = jax.device_put(kernel_operands(prep, "tetrahedral", "int8_lite"))
    for (H, W) in ((2160, 3840), (4320, 7680)):
        r0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
        g0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
        b0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

        t = sync_time(chain(lambda r, g, b: apply_lut_planes(
            r, g, b, prep, "tetrahedral", precision="int8_lite",
            operands=ops)), r0, g0, b0) / 4 * 1e3
        print(f"N={nsize} {W}x{H} production      : {t:7.2f} ms", flush=True)

        for bm in (W, 4096):
            if (H * W) % bm:
                continue
            try:
                t = sync_time(chain(lambda r, g, b, bm=bm: apply_planes(
                    r, g, b, prep, "tetrahedral", "int8_lite", bm, ops)),
                    r0, g0, b0) / 4 * 1e3
                print(f"N={nsize} {W}x{H} planes bm={bm:<5d}: {t:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"N={nsize} {W}x{H} planes bm={bm}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

        # numeric parity spot-check (small crop)
        pr_ = apply_lut_planes(r0[:128, :], g0[:128, :], b0[:128, :], prep,
                               "tetrahedral", precision="int8_lite",
                               operands=ops)
        pl_ = apply_planes(r0[:128, :], g0[:128, :], b0[:128, :], prep,
                           "tetrahedral", "int8_lite", W, ops)
        d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(pr_, pl_))
        print(f"N={nsize} {W}x{H} parity max|d|  : {d:.2e}", flush=True)
