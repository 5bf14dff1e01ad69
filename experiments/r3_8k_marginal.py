"""Round-3: marginal in-context cost of each 8K fused-pipeline stage.

Standalone stage timings are all at the sync-tax floor, yet the fused chain
runs ~17.5 ms/frame over the kernel chain and barriers don't help
(r3_8k_barrier). So the cost lives in how stages compile IN CONTEXT.
Here the FULL fused body runs with one stage at a time replaced by a
shape-compatible near-free placeholder; the delta vs the full body is that
stage's true marginal cost.

  full        : cast+up(nearest)+matrix+kernel+matrix+down+quant(ordered)
  -upsample   : pad half plane to full (cheap write, no lane interleave)
  -matrix_in  : passthrough planes
  -kernel     : skip apply_lut_planes
  -matrix_out : passthrough
  -downsample : contiguous slice [:H/2,:W/2]
  -quant      : plain astype(u16), no round/clip/dither
  quant none  : full body, dither="none"
  quant rnd   : full body, dither="random"
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
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


def make_body(skip=None, dither="ordered"):
    def body(y, u, v):
        yf = y.astype(jnp.float32)
        uf, vf = u.astype(jnp.float32), v.astype(jnp.float32)
        if skip == "upsample":
            uf = jnp.pad(uf, ((0, H // 2), (0, W // 2)))
            vf = jnp.pad(vf, ((0, H // 2), (0, W // 2)))
        else:
            uf = P.chroma_upsample_420(uf, "nearest")
            vf = P.chroma_upsample_420(vf, "nearest")
        if skip == "matrix_in":
            r, g, b = yf / 1023.0, uf / 1023.0, vf / 1023.0
        else:
            r, g, b = P.yuv_planes_to_rgb(yf, uf, vf, "bt709", 10, False)
        if skip != "kernel":
            r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral",
                                       operands=ops)
        if skip == "matrix_out":
            yo, uo, vo = r * 1023.0, g * 1023.0, b * 1023.0
        else:
            yo, uo, vo = P.rgb_to_yuv_planes_tpu(r, g, b, "bt709", 10, False)
        if skip == "downsample":
            uo = uo[: H // 2, : W // 2]
            vo = vo[: H // 2, : W // 2]
        else:
            uo = P.chroma_downsample_420(uo)
            vo = P.chroma_downsample_420(vo)
        if skip == "quant":
            return (yo.astype(jnp.uint16), uo.astype(jnp.uint16),
                    vo.astype(jnp.uint16))
        yq = P.quantize_plane(yo, 10, dither, plane_seed=1)
        uq = P.quantize_plane(uo, 10, dither, plane_seed=2)
        vq = P.quantize_plane(vo, 10, dither, plane_seed=3)
        return yq, uq, vq
    return body


base = sync_time(chain(make_body()), y, u, v) / 4 * 1e3
print(f"full (ordered)   : {base:7.2f} ms/frame", flush=True)
for skip in ["upsample", "matrix_in", "kernel", "matrix_out", "downsample",
             "quant"]:
    t = sync_time(chain(make_body(skip=skip)), y, u, v) / 4 * 1e3
    print(f"-{skip:<16}: {t:7.2f} ms/frame  (marginal {base - t:+6.2f})",
          flush=True)
for dither in ["none", "random"]:
    t = sync_time(chain(make_body(dither=dither)), y, u, v) / 4 * 1e3
    print(f"dither={dither:<10}: {t:7.2f} ms/frame  (vs ordered {base - t:+6.2f})",
          flush=True)
