import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D, apply_lut
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

rng = np.random.default_rng(0)

# 1. CORRECTNESS on real TPU vs numpy reference (small frame)
lut = Lut3D.identity(33)
lut.table = np.clip(lut.table + rng.uniform(-0.05,0.05,lut.table.shape).astype(np.float32),0,1)
prep = prepare_lut(lut)
r = rng.uniform(0,1,(8,256)).astype(np.float32)
g = rng.uniform(0,1,(8,256)).astype(np.float32)
b = rng.uniform(0,1,(8,256)).astype(np.float32)
for interp in ("trilinear","tetrahedral"):
    ro, go, bo = apply_lut_planes(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b), prep, interp)
    ref = apply_lut(np.stack([r,g,b],-1), lut, interp)
    err = max(abs(np.asarray(ro)-ref[...,0]).max(), abs(np.asarray(go)-ref[...,1]).max())
    print(f"TPU correctness {interp}: maxerr={err:.2e}")

# 2. honest timing: scalar readback forces completion
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
for interp in ("trilinear","tetrahedral"):
    fn = jax.jit(lambda r,g,b,interp=interp: [jnp.sum(x) for x in apply_lut_planes(r,g,b,prep,interp)])
    s = fn(rj,gj,bj); _ = [float(x) for x in s]
    t0 = time.perf_counter(); iters=10
    for _ in range(iters):
        s = fn(rj,gj,bj)
        _ = [float(x) for x in s]   # device->host scalar sync
    dt = (time.perf_counter()-t0)/iters
    print(f"4K {interp} 33^3 (sync): {dt*1e3:.1f} ms = {1/dt:.1f} fps")
