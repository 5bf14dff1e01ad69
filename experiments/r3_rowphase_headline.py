"""A/B the row-phase layout at the EXACT headline bench shape:
4K 8-bit 420, 33^3 bench LUT (seed 11, +-0.05 -> resolves int8_lite),
batch 8, lax.scan chain, production make_render_fn path.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from dataclasses import replace
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import kernel_operands
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(11)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
print("tier:", prep.resolve_precision("tetrahedral", "auto"), flush=True)
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))

H, W, B, K = 2160, 3840, 8, 8
y = jnp.asarray(rng.integers(16, 235, (B, H, W)).astype(np.uint8))
u = jnp.asarray(rng.integers(16, 235, (B, H // 2, W // 2)).astype(np.uint8))
v = jnp.asarray(rng.integers(16, 235, (B, H // 2, W // 2)).astype(np.uint8))


def scan_chain(cfg):
    @jax.jit
    def f(y, u, v):
        def step(carry, _):
            return render_yuv_frame(*carry, prep, cfg, lut_operands=ops), None
        (y, u, v), _ = jax.lax.scan(step, (y, u, v), None, length=K)
        return y, u, v
    return f


def sync_time(fn, *args, iters=7):
    s = fn(*args)
    float(jnp.sum(s[0].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

for layout in ("plain", "auto", "plain", "auto"):
    cfg = RenderConfig(interp="tetrahedral", phase_layout=layout)
    t = sync_time(scan_chain(cfg), y, u, v)
    print(f"headline 4K8 {layout:<6}: {t/(K*B)*1e3:7.3f} ms/frame "
          f"({K*B/t:6.1f} fps)", flush=True)
