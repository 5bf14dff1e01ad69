"""Where do the fused pipeline's non-LUT ~50ms go?"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from lut_renderer_tpu.ops import RenderConfig
from lut_renderer_tpu.ops.render import render_yuv_frame
from lut_renderer_tpu.ops import pixel as px

rng = np.random.default_rng(0)
H, W = 2160, 3840
y = jnp.asarray(rng.integers(16,236,(H,W),dtype=np.uint8))
u = jnp.asarray(rng.integers(16,241,(H//2,W//2),dtype=np.uint8))
v = jnp.asarray(rng.integers(16,241,(H//2,W//2),dtype=np.uint8))

def sync(fn, *a, iters=6):
    s = fn(*a); jax.block_until_ready(s)
    def red(s):
        if isinstance(s, tuple): return float(jnp.sum(s[0].astype(jnp.float32)))
        return float(jnp.sum(s.astype(jnp.float32)))
    red(s)
    ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); red(fn(*a)); ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]-0.030

cfg = RenderConfig(apply_lut=False)
print(f"full-no-LUT: {sync(jax.jit(lambda y,u,v: render_yuv_frame(y,u,v,None,cfg)), y,u,v)*1e3:.0f} ms")

# pieces
f32 = jnp.float32
up = jax.jit(lambda u: px.chroma_upsample_420(u.astype(f32)))
print(f"chroma upsample x2: {2*sync(up, u)*1e3:.0f} ms")
yuv2rgb = jax.jit(lambda y,uu,vv: px.yuv_planes_to_rgb(y.astype(f32), px.chroma_upsample_420(uu.astype(f32)), px.chroma_upsample_420(vv.astype(f32))))
print(f"upsample+yuv2rgb: {sync(yuv2rgb, y,u,v)*1e3:.0f} ms")
r = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
rgb2yuv = jax.jit(lambda r: px.rgb_to_yuv_planes_tpu(r, r, r))
print(f"rgb2yuv: {sync(rgb2yuv, r)*1e3:.0f} ms")
down = jax.jit(lambda r: px.chroma_downsample_420(r))
print(f"chroma downsample x2: {2*sync(down, r)*1e3:.0f} ms")
q = jax.jit(lambda r: px.quantize_plane(r*255.0, 8, "none"))
print(f"quantize x3-ish: {3*sync(q, r)*1e3:.0f} ms")
qd = jax.jit(lambda r: px.quantize_plane(r*255.0, 8, "ordered"))
print(f"quantize ordered: {sync(qd, r)*1e3:.0f} ms")
