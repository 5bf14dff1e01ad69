"""Round-3: sub-stage timing of the 8K 10-bit pre/post pipeline segments.

r3_8k_stage_profile measured pre 13.1 ms / post 12.7 ms standalone at 8K
(vs ~0.6 ms HBM speed-of-light for the traffic involved). Isolate which
sub-op carries the cost: range-normalize, chroma upsample (nearest),
YUV->RGB matrix, RGB->YUV matrix, chroma downsample, ordered quantize.
Each timed as a chained x4 jit with scalar-readback sync.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.ops import pixel as P

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
H, W = 4320, 7680

yf = jnp.asarray(rng.uniform(0, 1023, (H, W)).astype(np.float32))
uf = jnp.asarray(rng.uniform(0, 1023, (H, W)).astype(np.float32))
vf = jnp.asarray(rng.uniform(0, 1023, (H, W)).astype(np.float32))
uh = jnp.asarray(rng.uniform(0, 1023, (H // 2, W // 2)).astype(np.float32))
vh = jnp.asarray(rng.uniform(0, 1023, (H // 2, W // 2)).astype(np.float32))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s[0]) if isinstance(s, tuple) else jnp.sum(s))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0]) if isinstance(s, tuple) else jnp.sum(s))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(body, k=4):
    @jax.jit
    def f(*args):
        out = args
        for _ in range(k):
            out = body(*out)
        return out
    return f


def report(name, body, *args, k=4):
    t = sync_time(chain(body, k), *args)
    print(f"{name:<28}: {t/k*1e3:7.2f} ms/frame", flush=True)


# range normalize (3 planes full-res; production does it pre-upsample on
# half-res chroma, time the worst case anyway)
report("range_norm 3x full", lambda a, b, c: P.range_normalize(a, b, c, 10, False, True), yf, uf, vf)

# chroma upsample nearest: 2 half-res planes -> full (feed back cropped)
report("upsample_420 x2 (nearest)",
       lambda a, b: (P.chroma_upsample_420(a)[..., :H // 2, :W // 2],
                     P.chroma_upsample_420(b)[..., :H // 2, :W // 2]),
       uh, vh)

# YUV -> RGB matrix (3 full planes in, 3 out)
report("yuv->rgb matrix",
       lambda a, b, c: P.yuv_planes_to_rgb(a, b, c, "bt709", 10, False), yf, uf, vf)

# RGB -> YUV matrix
report("rgb->yuv matrix",
       lambda a, b, c: P.rgb_to_yuv_planes_tpu(a, b, c, "bt709", 10, False), yf, uf, vf)

# chroma downsample x2 (full -> half, pad back for stable carry)
report("downsample_420 x2",
       lambda a, b: (jnp.pad(P.chroma_downsample_420(a), ((0, H // 2), (0, W // 2))),
                     jnp.pad(P.chroma_downsample_420(b), ((0, H // 2), (0, W // 2)))),
       uf, vf)

# ordered quantize x3 (full + 2 half in production; worst-case 3 full here)
report("quantize ordered x3 full",
       lambda a, b, c: (P.quantize_plane(a, 10, "ordered", plane_seed=1).astype(jnp.float32),
                        P.quantize_plane(b, 10, "ordered", plane_seed=2).astype(jnp.float32),
                        P.quantize_plane(c, 10, "ordered", plane_seed=3).astype(jnp.float32)),
       yf, uf, vf)

# quantize none (round only) for the dither delta
report("quantize none x3 full",
       lambda a, b, c: (P.quantize_plane(a, 10, "none").astype(jnp.float32),
                        P.quantize_plane(b, 10, "none").astype(jnp.float32),
                        P.quantize_plane(c, 10, "none").astype(jnp.float32)),
       yf, uf, vf)

# pure elementwise baseline: 3 full-res fma (what SoL looks like here)
report("baseline 3x fma",
       lambda a, b, c: (a * 1.001 + 0.1, b * 1.001 + 0.1, c * 1.001 + 0.1),
       yf, uf, vf)
