"""Round-3: standalone cost of the row-phase glue at 8K (no LUT kernel).

apply_lut=False runs the full row-phase pre+post glue (stack, lane-dup,
matrix in/out, downsample, quantize, interleave) with the kernel elided.
Compare against the full fused frame and the kernel-only chain to see how
much of the fused-over-kernel delta is inherent glue vs pallas-boundary
fragmentation. Also time a no-matrix variant (y passthrough) to split
matrix cost from layout cost.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes, kernel_operands
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))

H, W, B, K = 4320, 7680, 2, 8
y = jnp.asarray(rng.integers(64, 940, (B, H, W)).astype(np.uint16))
u = jnp.asarray(rng.integers(64, 960, (B, H // 2, W // 2)).astype(np.uint16))
v = jnp.asarray(rng.integers(64, 960, (B, H // 2, W // 2)).astype(np.uint16))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s[0].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_chain(body, k=K):
    @jax.jit
    def f(y, u, v):
        def step(carry, _):
            return body(*carry), None
        (y, u, v), _ = jax.lax.scan(step, (y, u, v), None, length=k)
        return y, u, v
    return f


base = dict(in_depth=10, out_depth=10, interp="tetrahedral", dither="none",
            lut_strategy="mxu")

for tag, cfg in (
    ("fused full", RenderConfig(**base)),
    ("glue only (apply_lut=False)", RenderConfig(**base, apply_lut=False)),
    ("glue only PLAIN layout", RenderConfig(**base, apply_lut=False,
                                            phase_layout="plain")),
):
    t = sync_time(scan_chain(
        lambda yy, uu, vv, c=cfg: render_yuv_frame(yy, uu, vv, prep, c,
                                                   lut_operands=ops)),
        y, u, v)
    print(f"{tag:<30}: {t/(K*B)*1e3:7.2f} ms/frame", flush=True)

# kernel-only chain on f32 planes of the same pixel count
r = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
g = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
b = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))

@jax.jit
def kchain(r, g, b):
    def step(carry, _):
        return apply_lut_planes(*carry, prep, "tetrahedral",
                                operands=ops), None
    (r, g, b), _ = jax.lax.scan(step, (r, g, b), None, length=K)
    return r, g, b

t = sync_time(kchain, r, g, b)
print(f"{'kernel only':<30}: {t/(K*B)*1e3:7.2f} ms/frame", flush=True)
