import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut, RenderConfig
from lut_renderer_tpu.parallel import default_mesh, make_sharded_render_fn
from lut_renderer_tpu.parallel.sharding import put_sharded

rng = np.random.default_rng(0)
H, W = 4320, 7680
B = 2
y = np.asarray(rng.integers(64, 940, (B, H, W)), np.uint16)
u = np.asarray(rng.integers(64, 960, (B, H//2, W//2)), np.uint16)
v = np.asarray(rng.integers(64, 960, (B, H//2, W//2)), np.uint16)
lut = Lut3D.identity(33)
lut.table = np.clip(lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32), 0, 1)
prep = prepare_lut(lut)
cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral")
mesh = default_mesh(jax.devices())
print(f"mesh: {mesh.shape} on {jax.devices()[0].platform}", flush=True)
fn = make_sharded_render_fn(prep, cfg, mesh)
ys, us, vs = put_sharded(mesh, y, u, v)
out = fn(ys, us, vs)
float(jnp.sum(out[0].astype(jnp.float32)))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(fn(ys, us, vs)[0].astype(jnp.float32)))
    ts.append((time.perf_counter()-t0)*1e3 - 30)
ms = float(np.median(ts)) / B
print(f"8K 10-bit SHARDED fused tetra ({prep.resolve_precision('tetrahedral')}): "
      f"{ms:.1f} ms/frame = {1e3/ms:.2f} fps, out={out[0].shape} {out[0].dtype}", flush=True)
