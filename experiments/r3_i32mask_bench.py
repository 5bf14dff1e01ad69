"""Round-3: the i32-select mask route, integrated — compiled parity +
speed for every production tier, plus a bf16-mask i32-route variant (does
the 33^3 fast tier gain too?)."""
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


def make_prep(size):
    lut = Lut3D.identity(size)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.02, 0.02, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


prep33 = make_prep(33)
prep65 = make_prep(65)

# compiled parity on 8192 px for each tier
P = 8192
rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
for prep, prec in ((prep33, "fast"), (prep33, "int8_fast"),
                   (prep33, "int8_lite"), (prep65, "int8_lite"),
                   (prep65, "coarse2f")):
    f = jax.jit(lambda r, g, b, prep=prep, prec=prec: L.apply_lut_planes(
        r, g, b, prep, "tetrahedral", precision=prec))
    ro, go, bo = f(jnp.asarray(rs), jnp.asarray(gs), jnp.asarray(bs))
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], 1)
    want = np.stack([np.asarray(x)[0] for x in L.apply_lut_planes(
        rs, gs, bs, prep, "tetrahedral", strategy="gather")], 1)
    de = max_delta_e76(np.clip(got[None], 0, 1), np.clip(want[None], 0, 1))
    sim = prep.mode_error("tetrahedral", prec)
    print(f"parity {prep.size}^3 {prec:10s}: measured {float(de):.4f} "
          f"(sim {sim:.4f})", flush=True)
    assert de < 0.4, (prep.size, prec, de)

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


def bench(label, prep, interp, precision):
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
    print(f"{label:40s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)


bench("65 int8_lite tetra (i32 masks)", prep65, "tetrahedral", "int8_lite")
bench("65 int8_lite trilinear (i32 masks)", prep65, "trilinear", "int8_lite")
bench("65 coarse2f tetra (i32 masks)", prep65, "tetrahedral", "coarse2f")
bench("33 int8_fast tetra (i32 masks)", prep33, "tetrahedral", "int8_fast")
bench("33 int8_lite tetra (i32 masks)", prep33, "tetrahedral", "int8_lite")
bench("33 fast tetra (f32-route bf16 masks)", prep33, "tetrahedral", "fast")

# bf16 mask via i32 route: patch the body and re-measure the fast tier
import types
src_body = L._bf16_quad_body


def bf16_body_i32(n, n_passes, exact, widths, idx, wall, l_ref, acc=None):
    bm = idx.shape[1]
    rows_l = l_ref.shape[0]
    half = rows_l // 2 if exact else rows_l
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, bm), 0)
    offs, masks, par_b, par_g = L._quad_setup(n, widths, idx, bm)
    rvs, scals = L._quad_pass_factors(n, n_passes, idx, wall, par_b, par_g,
                                      iota)
    if acc is None:
        acc = [None, None, None]
    for q in range(4):
        m16 = jnp.where(masks[q], 1, 0).astype(jnp.bfloat16)   # i32 route
        d = jnp.dot(l_ref[:, offs[q]:offs[q] + widths[q]], m16,
                    preferred_element_type=jnp.float32)
        e = d[:half, :] + d[half:, :] if exact else d
        rw = None
        for ps in range(n_passes):
            t = rvs[ps] * scals[ps][q]
            rw = t if rw is None else rw + t
        for c in range(3):
            contrib = jnp.sum(e[c * n:(c + 1) * n, :] * rw, axis=0)
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    return L._ident_acc(n, n_passes, idx, wall, acc)


L._bf16_quad_body = bf16_body_i32
try:
    # parity of the patched route first
    f = jax.jit(lambda r, g, b: L.apply_lut_planes(
        r, g, b, prep33, "tetrahedral", precision="fast"))
    ro, go, bo = f(jnp.asarray(rs), jnp.asarray(gs), jnp.asarray(bs))
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], 1)
    want = np.stack([np.asarray(x)[0] for x in L.apply_lut_planes(
        rs, gs, bs, prep33, "tetrahedral", strategy="gather")], 1)
    de = max_delta_e76(np.clip(got[None], 0, 1), np.clip(want[None], 0, 1))
    print(f"parity 33 fast i32-route: {float(de):.4f}", flush=True)
    bench("33 fast tetra (i32-route bf16 masks)", prep33, "tetrahedral",
          "fast")
    bench("65 coarse2f tetra (i32 bf16 coarse)", prep65, "tetrahedral",
          "coarse2f")
except Exception as e:
    print("bf16 i32 route FAILED:", str(e)[:300], flush=True)
finally:
    L._bf16_quad_body = src_body
