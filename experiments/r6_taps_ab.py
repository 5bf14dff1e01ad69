"""A/B the i32-select tap build inside the PRODUCTION apply path, one
process, to explain why r6_33_vpu_attack's variant A (-25% in a standalone
kernel) did not show up in r6_i32taps_bench's integrated numbers."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
import lut_renderer_tpu.ops.lut3d as L

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
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


def bench(label, precision="int8_lite", interp="tetrahedral"):
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
    print(f"{label:52s} {per*1e3:7.2f} ms", flush=True)


def old_factors(n, n_passes, idx, wall, par_b, par_g, iota):
    parb, clampb = par_b
    parg, clampg = par_g
    rvs, scals = [], []
    for ps in range(n_passes):
        wts = wall[6 * ps:6 * ps + 6, :]

        def tap(axis):
            p = idx[axis:axis + 1, :]
            nx = jnp.minimum(p + 1, n - 1)
            wp = wts[2 * axis:2 * axis + 1, :]
            wn = wts[2 * axis + 1:2 * axis + 2, :]
            return (jnp.where(iota == p, wp, 0.0)
                    + jnp.where(iota == nx, wn, 0.0))

        rvs.append(tap(0))
        wgp, wgn = wts[2:3, :], wts[3:4, :]
        wbp, wbn = wts[4:5, :], wts[5:6, :]
        web, wob = L._parity_weights(parb, clampb, wbp, wbn)
        weg, wog = L._parity_weights(parg, clampg, wgp, wgn)
        scals.append((web * weg, web * wog, wob * weg, wob * wog))
    return rvs, scals


new_factors = L._quad_pass_factors
bench("int8_lite tetra NEW (i32 taps, as shipped)")
L._quad_pass_factors = old_factors
bench("int8_lite tetra OLD (f32 selects, monkeypatched)")
L._quad_pass_factors = new_factors
