import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
prep = prepare_lut(lut)
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))

def chain(k, interp):
    @jax.jit
    def f(r,g,b):
        for _ in range(k):
            r,g,b = apply_lut_planes(r,g,b,prep,interp)
        return jnp.sum(r)+jnp.sum(g)+jnp.sum(b)
    return f

def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0=time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter()-t0)/iters

for interp in ("trilinear","tetrahedral"):
    t1 = sync_time(chain(1, interp), rj,gj,bj)
    t5 = sync_time(chain(5, interp), rj,gj,bj)
    per = (t5-t1)/4
    print(f"{interp}: k=1 {t1*1e3:.1f}ms k=5 {t5*1e3:.1f}ms -> per-apply {per*1e3:.1f} ms = {1/per:.1f} fps, overhead {t1-per:+.3f}s")
