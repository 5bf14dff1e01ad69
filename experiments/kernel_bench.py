"""Measure the production Pallas kernel on the real TPU: 4K trilinear/tetra."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut, RenderConfig, make_render_fn
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

print("devices:", jax.devices())
rng = np.random.default_rng(0)

def timeit(fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters

H, W = 2160, 3840
r = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
g = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
b = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))

for n in (33, 65):
    lut = Lut3D.identity(n)
    lut.table = np.clip(lut.table + rng.uniform(-0.02,0.02,lut.table.shape).astype(np.float32),0,1)
    prep = prepare_lut(lut)
    for interp in ("trilinear", "tetrahedral"):
        fn = jax.jit(lambda r,g,b,interp=interp,prep=prep: apply_lut_planes(r,g,b,prep,interp))
        try:
            dt = timeit(fn, r, g, b, iters=5)
            print(f"4K {interp} {n}^3: {dt*1e3:.1f} ms = {1/dt:.1f} fps  ({H*W/dt/1e6:.0f} Mpix/s)")
        except Exception as e:
            print(f"4K {interp} {n}^3 FAILED: {str(e)[:200]}")

# fused pipeline 4K 420 8bit, batch 4
B = 4
y8 = jnp.asarray(rng.integers(16,236,(B,H,W),dtype=np.uint8))
u8 = jnp.asarray(rng.integers(16,241,(B,H//2,W//2),dtype=np.uint8))
v8 = jnp.asarray(rng.integers(16,241,(B,H//2,W//2),dtype=np.uint8))
prep33 = prepare_lut(Lut3D.identity(33))
for interp in ("trilinear", "tetrahedral"):
    fn = make_render_fn(prep33, RenderConfig(interp=interp))
    try:
        dt = timeit(fn, y8, u8, v8, iters=3)
        print(f"4K FUSED batch{B} {interp} 33^3: {dt/B*1e3:.1f} ms/frame = {B/dt:.1f} fps")
    except Exception as e:
        print(f"FUSED {interp} FAILED: {str(e)[:300]}")
