"""Round-3: does forcing materialization between pipeline stages fix the
8K fused overhead?

fused chain = 91.0 ms/frame vs kernel chain 72.1 while standalone stage
math sums to ~7 ms — ~12 ms of fusion penalty. Hypothesis: XLA fuses the
pre/post elementwise chains badly around the pallas_call (recompute or
relayout). Test: insert lax.optimization_barrier between (pre | kernel |
post) to force one clean materialization per stage, all combinations.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import pixel as P
from lut_renderer_tpu.ops.lut3d import apply_lut_planes, kernel_operands

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)

H, W = 4320, 7680
y = jnp.asarray(rng.integers(64, 940, (H, W)).astype(np.uint16))
u = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
v = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0]))
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


def make_body(bar_pre: bool, bar_post: bool):
    def body(y, u, v):
        yf = y.astype(jnp.float32)
        uf = P.chroma_upsample_420(u.astype(jnp.float32), "nearest")
        vf = P.chroma_upsample_420(v.astype(jnp.float32), "nearest")
        r, g, b = P.yuv_planes_to_rgb(yf, uf, vf, "bt709", 10, False)
        if bar_pre:
            r, g, b = lax.optimization_barrier((r, g, b))
        r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral", operands=ops)
        if bar_post:
            r, g, b = lax.optimization_barrier((r, g, b))
        yo, uo, vo = P.rgb_to_yuv_planes_tpu(r, g, b, "bt709", 10, False)
        uo = P.chroma_downsample_420(uo)
        vo = P.chroma_downsample_420(vo)
        yq = P.quantize_plane(yo, 10, "ordered", plane_seed=1)
        uq = P.quantize_plane(uo, 10, "ordered", plane_seed=2)
        vq = P.quantize_plane(vo, 10, "ordered", plane_seed=3)
        return yq, uq, vq
    return body


for bp, bq in [(False, False), (True, False), (False, True), (True, True)]:
    t = sync_time(chain(make_body(bp, bq)), y, u, v)
    print(f"bar_pre={int(bp)} bar_post={int(bq)}: {t/4*1e3:7.2f} ms/frame",
          flush=True)
