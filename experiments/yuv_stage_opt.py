"""Optimize the non-LUT pipeline stages: downsample variants + stage costs."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
H, W = 2160, 3840
SYNC = 0.030

def sync(fn, *a, iters=7):
    s = fn(*a)
    def red(s):
        if isinstance(s, tuple):
            return float(sum(jnp.sum(x.astype(jnp.float32)) for x in s))
        return float(jnp.sum(s.astype(jnp.float32)))
    red(s)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); red(fn(*a)); ts.append(time.perf_counter() - t0)
    ts.sort()
    return (ts[len(ts)//2] - SYNC) * 1e3

c = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))

def down_reshape(x):
    h, w = x.shape[-2], x.shape[-1]
    return x.reshape(*x.shape[:-2], h // 2, 2, w // 2, 2).mean(axis=(-3, -1))

def down_strided(x):
    a = (x[..., 0::2, :] + x[..., 1::2, :])
    return (a[..., :, 0::2] + a[..., :, 1::2]) * 0.25

def down_reduce_window(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID") * 0.25

def down_lanefirst(x):
    a = (x[..., :, 0::2] + x[..., :, 1::2])
    return (a[..., 0::2, :] + a[..., 1::2, :]) * 0.25

for name, fn in (("reshape-mean", down_reshape), ("strided", down_strided),
                 ("reduce_window", down_reduce_window), ("lanefirst", down_lanefirst)):
    f = jax.jit(fn)
    ref = np.asarray(jax.jit(down_reshape)(c))
    got = np.asarray(f(c))
    ok = np.allclose(ref, got, atol=1e-3)
    print(f"downsample {name:14s}: {sync(f, c):6.1f} ms/plane  match={ok}", flush=True)

# stage costs, cumulative
y8 = jnp.asarray(rng.integers(16, 236, (H, W), dtype=np.uint8))
u8 = jnp.asarray(rng.integers(16, 241, (H//2, W//2), dtype=np.uint8))
v8 = jnp.asarray(rng.integers(16, 241, (H//2, W//2), dtype=np.uint8))

from lut_renderer_tpu.ops import pixel as px

def s_convert(y, u, v):
    return y.astype(jnp.float32), u.astype(jnp.float32), v.astype(jnp.float32)

def s_up(y, u, v):
    yf, uf, vf = s_convert(y, u, v)
    return yf, px.chroma_upsample_420(uf), px.chroma_upsample_420(vf)

def s_rgb(y, u, v):
    yf, uf, vf = s_up(y, u, v)
    return px.yuv_planes_to_rgb(yf, uf, vf, "bt709", 8, False)

def s_back(y, u, v):
    r, g, b = s_rgb(y, u, v)
    return px.rgb_to_yuv_planes_tpu(r, g, b, "bt709", 8, False)

def s_down(y, u, v):
    yo, uo, vo = s_back(y, u, v)
    return yo, down_lanefirst(uo), down_lanefirst(vo)

def s_q(y, u, v):
    yo, uo, vo = s_back(y, u, v)
    uo, vo = down_lanefirst(uo), down_lanefirst(vo)
    return (px.quantize_plane(yo, 8), px.quantize_plane(uo, 8),
            px.quantize_plane(vo, 8))

prev = 0.0
for name, fn in (("convert", s_convert), ("+upsample", s_up), ("+yuv2rgb", s_rgb),
                 ("+rgb2yuv", s_back), ("+downsample", s_down), ("+quantize", s_q)):
    t = sync(jax.jit(fn), y8, u8, v8)
    print(f"cumulative {name:12s}: {t:6.1f} ms (delta {t - prev:+5.1f})", flush=True)
    prev = t
