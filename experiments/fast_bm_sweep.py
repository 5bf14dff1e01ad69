"""Block sweep for the detrended-fast tier (the headline default)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L

rng = np.random.default_rng(0)
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

lut33 = Lut3D.identity(33)
lut33.table = np.clip(lut33.table + rng.uniform(
    -0.05, 0.05, lut33.table.shape).astype(np.float32), 0, 1)
p33 = prepare_lut(lut33)

def chain(k, interp, bm):
    orig = L._block_pixels
    L._block_pixels = lambda n, mode="exact", n_passes=2, bm=bm: bm
    try:
        @jax.jit
        def f(r, g, b):
            rr, gg, bb = r, g, b
            for _ in range(k):
                rr, gg, bb = L.apply_lut_planes(rr, gg, bb, p33, interp,
                                                precision="fast")
            return jnp.sum(rr) + jnp.sum(gg) + jnp.sum(bb)
        f(rj, gj, bj)  # trace now, while patched
        return f
    finally:
        L._block_pixels = orig

def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters

for interp in ("tetrahedral", "trilinear"):
    for bm in (512, 1024, 2048, 4096):
        try:
            t1 = sync_time(chain(1, interp, bm), rj, gj, bj)
            t3 = sync_time(chain(3, interp, bm), rj, gj, bj)
            per = (t3 - t1) / 2
            print(f"fast {interp} bm={bm}: {per*1e3:6.1f} ms", flush=True)
        except Exception as e:
            print(f"fast {interp} bm={bm} FAILED: {str(e)[:150]}", flush=True)
