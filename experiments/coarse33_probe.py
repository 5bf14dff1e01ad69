"""Would a 33 -> 17+residual decomposition beat the fast tier at N=33?"""
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

lut33 = Lut3D.identity(33)
lut33.table = np.clip(lut33.table + rng.uniform(
    -0.05, 0.05, lut33.table.shape).astype(np.float32), 0, 1)
prep = prepare_lut(lut33, force_coarse=True)
for m in ("coarse2f", "coarse2"):
    print(m, "sim:", round(prep.mode_error("tetrahedral", m), 4), flush=True)

def chain(k, prec):
    @jax.jit
    def f(r, g, b):
        for _ in range(k):
            r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral",
                                       precision=prec)
        return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
    return f

def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters

for prec in ("coarse2f", "fast"):
    try:
        t1 = sync_time(chain(1, prec), rj, gj, bj)
        t3 = sync_time(chain(3, prec), rj, gj, bj)
        per = (t3 - t1) / 2
        print(f"33 tetra {prec}: {per*1e3:.1f} ms = {1/per:.1f} fps",
              flush=True)
    except Exception as e:
        print(f"33 tetra {prec} FAILED: {str(e)[:200]}", flush=True)
