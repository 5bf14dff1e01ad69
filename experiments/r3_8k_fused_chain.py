"""Round-3: true chained cost of the fused 8K 10-bit pipeline.

r3_8k_stage_profile timed fused x1 (sync-polluted). Here the production
render_yuv_frame chains x4 inside one jit (out planes feed back as in
planes: same dtypes/shapes at 10-bit 420), isolating per-frame cost.
Also times pre+kernel and kernel+post halves to locate the fusion penalty
the sub-stage sum (~7 ms) doesn't explain.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame
from lut_renderer_tpu.ops import pixel as P
from lut_renderer_tpu.ops.lut3d import apply_lut_planes, kernel_operands

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
print("tier:", prep.resolve_precision("tetrahedral"), flush=True)

H, W = 4320, 7680
y = jnp.asarray(rng.integers(64, 940, (H, W)).astype(np.uint16))
u = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
v = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral",
                   dither="ordered", lut_strategy="mxu")
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))


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
    print(f"{name:<24}: {t/k*1e3:7.2f} ms/frame", flush=True)


def fused_body(y, u, v):
    return render_yuv_frame(y, u, v, prep, cfg, lut_operands=ops)


report("fused chain", fused_body, y, u, v)


# pre + kernel: yuv ints -> RGB f32 -> LUT (carry back as uint16-ish)
def prekernel_body(y, u, v):
    yf, uf, vf = y.astype(jnp.float32), u.astype(jnp.float32), v.astype(jnp.float32)
    uf = P.chroma_upsample_420(uf, "nearest")
    vf = P.chroma_upsample_420(vf, "nearest")
    r, g, b = P.yuv_planes_to_rgb(yf, uf, vf, "bt709", 10, False)
    r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral", operands=ops)
    return ((r * 1023).astype(jnp.uint16),
            (g[..., : H // 2, : W // 2] * 1023).astype(jnp.uint16),
            (b[..., : H // 2, : W // 2] * 1023).astype(jnp.uint16))


report("pre+kernel chain", prekernel_body, y, u, v)


# kernel + post: RGB f32 -> LUT -> yuv ints (carry back as f32 RGB)
r0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
g0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
b0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def kernelpost_body(r, g, b):
    r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral", operands=ops)
    yo, uo, vo = P.rgb_to_yuv_planes_tpu(r, g, b, "bt709", 10, False)
    uo = P.chroma_downsample_420(uo)
    vo = P.chroma_downsample_420(vo)
    yq = P.quantize_plane(yo, 10, "ordered", plane_seed=1)
    uq = P.quantize_plane(uo, 10, "ordered", plane_seed=2)
    vq = P.quantize_plane(vo, 10, "ordered", plane_seed=3)
    return (yq.astype(jnp.float32) / 1023.0,
            jnp.pad(uq, ((0, H // 2), (0, W // 2))).astype(jnp.float32) / 1023.0,
            jnp.pad(vq, ((0, H // 2), (0, W // 2))).astype(jnp.float32) / 1023.0)


report("kernel+post chain", kernelpost_body, r0, g0, b0)


# kernel alone again, same session, for a clean delta
def lut_body(r, g, b):
    return apply_lut_planes(r, g, b, prep, "tetrahedral", operands=ops)


report("kernel chain", lut_body, r0, g0, b0)
