"""Where do the fused pipeline's extra ~46ms go? Swap parts for identity."""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut, RenderConfig
from lut_renderer_tpu.ops.render import render_yuv_frame

rng = np.random.default_rng(0)
prep = prepare_lut(Lut3D.identity(33))
B, H, W = 4, 2160, 3840
y = jnp.asarray(rng.integers(16,236,(B,H,W),dtype=np.uint8))
u = jnp.asarray(rng.integers(16,241,(B,H//2,W//2),dtype=np.uint8))
v = jnp.asarray(rng.integers(16,241,(B,H//2,W//2),dtype=np.uint8))

def sync(fn, iters=5):
    s = fn(y,u,v); jax.block_until_ready(s)
    def red(s): return [float(jnp.sum(x.astype(jnp.float32))) for x in s]
    red(s)
    ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); red(fn(y,u,v)); ts.append(time.perf_counter()-t0)
    ts.sort(); return (ts[len(ts)//2]-0.030)/B

for name, cfg in [
    ("full tetra", RenderConfig(interp="tetrahedral")),
    ("no-LUT (yuv roundtrip only)", RenderConfig(apply_lut=False)),
    ("trilinear", RenderConfig(interp="trilinear")),
]:
    f = jax.jit(lambda y,u,v,cfg=cfg: render_yuv_frame(y,u,v,prep if cfg.apply_lut else None,cfg))
    print(f"{name}: {sync(f)*1e3:.0f} ms/frame")
