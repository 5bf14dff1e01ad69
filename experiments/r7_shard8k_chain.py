"""Sharded 8K with device-resident step chaining (round 4).

Round-3 measured 12.35 fps/chip for the SHARDED 8K 10-bit fused program vs
15.0 fps for the same kernel un-sharded — and attributed the gap to the
per-dispatch sync tax (~30 ms over B=2 frames = up to 15 ms/frame), "at or
below the per-dispatch sync tax". This closes the question by amortizing
the tax the same way the headline bench does: make_sharded_render_fn
(parallel/sharding.py) gains chain=N, running N steps inside one dispatch
via lax.scan with the output feeding the next input. If the residual
sharding overhead is really ~zero, the chained sharded figure should land
at the un-sharded fused kernel rate.

Run on the real chip: python experiments/r7_shard8k_chain.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import RenderConfig, prepare_lut
from lut_renderer_tpu.parallel import default_mesh, make_sharded_render_fn
from lut_renderer_tpu.parallel.sharding import put_sharded

rng = np.random.default_rng(0)
H, W = 4320, 7680
B = 2
y = np.asarray(rng.integers(64, 940, (B, H, W)), np.uint16)
u = np.asarray(rng.integers(64, 960, (B, H // 2, W // 2)), np.uint16)
v = np.asarray(rng.integers(64, 960, (B, H // 2, W // 2)), np.uint16)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral")
mesh = default_mesh(jax.devices())
print(f"mesh: {mesh.shape} on {jax.devices()[0].platform}", flush=True)
ys, us, vs = put_sharded(mesh, y, u, v)

for chain in (1, 4, 8):
    fn = make_sharded_render_fn(prep, cfg, mesh, chain=chain)
    float(jnp.sum(fn(ys, us, vs)[0].astype(jnp.float32)))  # compile+warm
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.sum(fn(ys, us, vs)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) * 1e3 - 30)
    ms = float(np.median(ts)) / (B * chain)
    print(f"chain={chain}: {ms:.1f} ms/frame = {1e3 / ms:.2f} fps/chip "
          f"(runs {[f'{t:.0f}' for t in ts]})", flush=True)
