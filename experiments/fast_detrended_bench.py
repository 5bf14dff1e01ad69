"""Time + verify the detrended-fast tier (new auto default) on-chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.colorcore.interp import apply_lut
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

rng = np.random.default_rng(0)
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

def chain(prep, k, interp, precision):
    @jax.jit
    def f(r, g, b):
        for _ in range(k):
            r, g, b = apply_lut_planes(r, g, b, prep, interp,
                                       precision=precision)
        return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
    return f

def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters

def bench(prep, interp, precision, tag):
    try:
        t1 = sync_time(chain(prep, 1, interp, precision), rj, gj, bj)
        t3 = sync_time(chain(prep, 3, interp, precision), rj, gj, bj)
        per = (t3 - t1) / 2
        print(f"{tag:34s}: {per*1e3:6.1f} ms = {1/per:5.1f} fps", flush=True)
    except Exception as e:
        print(f"{tag:34s} FAILED: {str(e)[:250]}", flush=True)

def parity(prep, lut, interp, precision, tag):
    P = 8192
    rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
    gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
    bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
    ro, go, bo = apply_lut_planes(jnp.asarray(rs), jnp.asarray(gs),
                                  jnp.asarray(bs), prep, interp,
                                  precision=precision)
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], 1)
    want = apply_lut(np.stack([rs[0], gs[0], bs[0]], 1), lut, interp)
    ub = np.abs(got - want).max() * 255 * np.sqrt(3)
    print(f"{tag:34s}: parity dE76 upper-bound {ub:.4f}", flush=True)

lut33 = Lut3D.identity(33)
lut33.table = np.clip(lut33.table + rng.uniform(
    -0.05, 0.05, lut33.table.shape).astype(np.float32), 0, 1)
p33 = prepare_lut(lut33)
print("33 auto tetra:", p33.resolve_precision("tetrahedral", "auto"),
      "fast sim:", round(p33.mode_error("tetrahedral", "fast"), 4),
      flush=True)
bench(p33, "tetrahedral", "fast", "33 tetra fast-detrended")
bench(p33, "trilinear", "fast", "33 tri fast-detrended")
parity(p33, lut33, "tetrahedral", "fast", "33 tetra fast-detrended")
parity(p33, lut33, "tetrahedral", "exact", "33 tetra exact-detrended")

lut65 = Lut3D.identity(65)
lut65.table = np.clip(lut65.table + rng.uniform(
    -0.02, 0.02, lut65.table.shape).astype(np.float32), 0, 1)
p65 = prepare_lut(lut65)
print("65 auto tetra:", p65.resolve_precision("tetrahedral", "auto"),
      "c2f sim:", round(p65.mode_error("tetrahedral", "coarse2f"), 4),
      flush=True)
bench(p65, "tetrahedral", "coarse2f", "65 tetra coarse2f")
parity(p65, lut65, "tetrahedral", "coarse2f", "65 tetra coarse2f")

# int4 residual rung (coarse2q): production-style LUT that gates in
lutp = Lut3D.identity(65)
t = lutp.table
curve = np.clip(t * 1.08 - 0.02 + 0.05 * np.sin(t * 3.1), 0, 1)
lutp.table = (0.92 * curve
              + 0.08 * curve.mean(axis=-1, keepdims=True)).astype(np.float32)
pp = prepare_lut(lutp)
print("65prod auto tetra:", pp.resolve_precision("tetrahedral", "auto"),
      "q sim:", round(pp.mode_error("tetrahedral", "coarse2q"), 4),
      flush=True)
bench(pp, "tetrahedral", "coarse2q", "65prod tetra coarse2q")
bench(pp, "tetrahedral", "coarse2f", "65prod tetra coarse2f")
parity(pp, lutp, "tetrahedral", "coarse2q", "65prod tetra coarse2q")
