"""Round-3: decompose the 8K 10-bit fused-pipeline overhead.

4K fused runs 17.2 ms vs 15.9 kernel-only (1.3 ms pipeline overhead), but
8K 10-bit runs ~82.6 ms vs ~63.6 kernel-only — ~19 ms, superlinear in
pixels. Time each pipeline segment separately (chained x4 in one jit,
scalar-readback sync) to find what scales badly:

  pre   = convert + range-normalize + 420 upsample + YUV->RGB matrix
  lut   = the Pallas kernel alone (33^3 int8_lite tetra)
  post  = RGB->YUV + 420 downsample + ordered-dither quantize (10-bit)
  fused = the production render_yuv_frame
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame, make_render_fn
from lut_renderer_tpu.ops import pixel as P
from lut_renderer_tpu.ops.lut3d import apply_lut_planes, kernel_operands

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
tier = prep.resolve_precision("tetrahedral")
print("tier:", tier, flush=True)

H, W = 4320, 7680
y = jnp.asarray(rng.integers(64, 940, (H, W)).astype(np.uint16))
u = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
v = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral",
                   dither="ordered", lut_strategy="mxu")


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


# --- pre: int planes -> r, g, b f32 (range-normalize + upsample + matrix)
def pre_body(y, u, v):
    yf, uf, vf = y.astype(jnp.float32), u.astype(jnp.float32), v.astype(jnp.float32)
    yf, uf, vf = P.range_normalize(yf, uf, vf, 10, False, False)
    uf = P.chroma_upsample_420(uf, "nearest")
    vf = P.chroma_upsample_420(vf, "nearest")
    r, g, b = P.yuv_planes_to_rgb(yf, uf, vf, "bt709", 10, False)
    # feed back as uint16-ish to keep carry types stable
    return ((r * 1023).astype(jnp.uint16),
            (g[: H // 2, : W // 2] * 1023).astype(jnp.uint16),
            (b[: H // 2, : W // 2] * 1023).astype(jnp.uint16))


# --- lut: kernel alone on full-res RGB f32
r0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
g0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
b0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))


def lut_body(r, g, b):
    return apply_lut_planes(r, g, b, prep, "tetrahedral", operands=ops)


# --- post: r,g,b -> int YUV (matrix + downsample + ordered quantize)
def post_body(r, g, b):
    yo, uo, vo = P.rgb_to_yuv_planes_tpu(r, g, b, "bt709", 10, False)
    uo = P.chroma_downsample_420(uo)
    vo = P.chroma_downsample_420(vo)
    yq = P.quantize_plane(yo, 10, "ordered", plane_seed=1)
    uq = P.quantize_plane(uo, 10, "ordered", plane_seed=2)
    vq = P.quantize_plane(vo, 10, "ordered", plane_seed=3)
    # stable carry: back to f32 full-res planes
    return (yq.astype(jnp.float32) / 1023.0,
            jnp.pad(uq, ((0, H // 2), (0, W // 2))).astype(jnp.float32) / 1023.0,
            jnp.pad(vq, ((0, H // 2), (0, W // 2))).astype(jnp.float32) / 1023.0)


# --- fused production path
fused = make_render_fn(prep, cfg)

t = sync_time(chain(lut_body), r0, g0, b0)
print(f"lut only   : {t/4*1e3:7.1f} ms/frame", flush=True)
t = sync_time(chain(post_body), r0, g0, b0)
print(f"post only  : {t/4*1e3:7.1f} ms/frame", flush=True)
t = sync_time(chain(pre_body), y, u, v)
print(f"pre only   : {t/4*1e3:7.1f} ms/frame", flush=True)

# fused: single call (already amortized via batch? no — single frame here),
# use the chained library path instead: time 1 vs 5 applications
def fused1(y, u, v):
    return fused(y, u, v)

t1 = sync_time(fused1, y, u, v)
print(f"fused x1   : {t1*1e3:7.1f} ms (incl. one sync)", flush=True)
