"""Round-3 (cont): the bench headline unrolls CHAIN=3 LUT applications per
jit region and pays one ~30 ms axon sync per region (amortized over
BATCH*CHAIN=24 frames ~ 1.25 ms/frame). Negative #6 showed a lax.scan
CHAIN=8 is SLOWER (f32 carry cost), but a deeper UNROLLED chain carries no
scan state — XLA repeats the same program. Measure sync-INCLUSIVE fps
(exact bench.py methodology) for unrolled CHAIN in {3, 6, 12} to see if
the headline should deepen its unroll.

RESULT (v5e, clean box, warm cache; medians of 6):
  chain  3: 412.2 ms/region  58.22 fps  (17.18 ms/frame)  spread 411-413
  chain  6: 789.7 ms/region  60.78 fps  (16.45 ms/frame)  spread 787-801
  chain 12: 1541.5 ms/region 62.28 fps  (16.06 ms/frame)  spread 1541-1546
  chain 24: 3041.1 ms/region 63.14 fps  (15.84 ms/frame)  spread 3041-3473
Monotone amortization of the ~30 ms axon sync toward the 15.9 ms kernel
floor. ADOPTED CHAIN=12 in bench.py: within 1% of floor, tight spread;
24 gains only +1.4% for a 165 s cold compile and a loose tail. A first
(contended) run with pytest active showed chain 6 SLOWER than 3 with an
845-1024 ms spread — re-confirming FINDINGS' never-run-bench-with-
anything-else rule."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(11)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
H, W, BATCH = 2160, 3840, 8
rng = np.random.default_rng(0)
r = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W)).astype(np.float32))
g = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W)).astype(np.float32))
b = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W)).astype(np.float32))

for chain in (3, 6, 12):
    @jax.jit
    def step(r, g, b, _c=chain):
        for _ in range(_c):
            r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral",
                                       strategy="mxu", precision="auto")
        return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)

    t0 = time.perf_counter()
    float(step(r, g, b))
    print(f"chain {chain:2d}: compile+first {time.perf_counter()-t0:.1f} s",
          flush=True)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(step(r, g, b))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"chain {chain:2d}: {dt*1e3:8.1f} ms/region  "
          f"{BATCH*chain/dt:6.2f} fps sync-inclusive  "
          f"({dt*1e3/(BATCH*chain):.2f} ms/frame)  "
          f"spread {min(times)*1e3:.0f}-{max(times)*1e3:.0f}", flush=True)
