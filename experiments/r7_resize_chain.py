"""Round-4 follow-up: re-measure the resize class with the sync-tax-free
scan methodology (see FINDINGS "Depth-changing bench configs were
sync-tax understated").

r7_resize_bench.py timed single dispatches, so its ABSOLUTE figures carry
the ~30 ms axon sync tax over one batch (3.75 ms/frame at batch 8); the
+16% resize DELTA was apples-to-apples, but the class rate itself is
better than published. Same fix as bench.py: lax.scan over 6 distinct
pre-staged input batches inside one jit, outputs consumed by the scalar
reduce.

Cross-check from the old numbers (tax removed by hand): 19.8 - 3.75 =
16.1 ms predicted for the fused no-resize 4K frame — the headline fused
measure is 16.5 ms, so the correction model is right before we run.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import RenderConfig, prepare_lut
from lut_renderer_tpu.ops.render import make_render_fn

rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
t = lut.table.copy()
t[..., 0] = np.clip(t[..., 0] ** 0.95, 0, 1)
t[..., 2] = np.clip(t[..., 2] * 0.97 + 0.01, 0, 1)
lut.table = t
prep = prepare_lut(lut)
CHAIN = 6


def stacked_planes(h, w, batch):
    def stack(a):
        return jnp.asarray(np.stack(
            [a] + [rng.permutation(a, axis=1) for _ in range(CHAIN - 1)]))

    y = stack(rng.integers(16, 235, (batch, h, w)).astype(np.uint8))
    u = stack(rng.integers(16, 235, (batch, h // 2, w // 2)).astype(np.uint8))
    v = stack(rng.integers(16, 235, (batch, h // 2, w // 2)).astype(np.uint8))
    return y, u, v


def fps(cfg, h, w, batch):
    fn = make_render_fn(prep, cfg)
    ys, us, vs = stacked_planes(h, w, batch)

    @jax.jit
    def stepk(ys, us, vs):
        def body(acc, inp):
            out = fn(*inp)[0]
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (ys, us, vs))
        return acc

    float(stepk(ys, us, vs))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(stepk(ys, us, vs))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / (CHAIN * batch)
    return 1.0 / med, med * 1e3


for label, cfg, h, w, batch in [
    ("4K->1080p scaled render ", RenderConfig(interp="tetrahedral",
                                              resize=(1920, 1080)),
     2160, 3840, 8),
    ("4K->4K fused (no resize)", RenderConfig(interp="tetrahedral"),
     2160, 3840, 8),
    ("1080p->4K upscale       ", RenderConfig(interp="tetrahedral",
                                              resize=(3840, 2160)),
     1080, 1920, 16),
    ("1080p fused (no resize) ", RenderConfig(interp="tetrahedral"),
     1080, 1920, 16),
]:
    f, ms = fps(cfg, h, w, batch)
    print(f"{label}: {ms:6.2f} ms/frame = {f:6.1f} fps", flush=True)
