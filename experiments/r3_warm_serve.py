"""Round-3: validate the LUT-agnostic serving story on the chip.

1. warmup_programs() — compiles the production program set (persistent
   cache makes this one-time per machine).
2. A NEVER-seen .cube (different values, same 33^3/65^3 sizes) through
   make_render_fn at a warmed shape must run its FIRST batch in ~render
   time (no compile): the program is keyed by geometry, not table values.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
import jax

from lut_renderer_tpu.engine.warmup import warmup_programs
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.render import RenderConfig, make_render_fn
from lut_renderer_tpu.engine.executor import _pick_batch_size

print("devices:", jax.devices(), flush=True)
t0 = time.perf_counter()
recs = warmup_programs(log=lambda m: print(m, flush=True))
print(f"warmup total {time.perf_counter()-t0:.1f}s", flush=True)

# never-seen LUTs at warmed shapes
for size, w, h in ((33, 3840, 2160), (65, 3840, 2160)):
    rng = np.random.default_rng(12345 + size)
    lut = Lut3D.identity(size)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.03, 0.03, lut.table.shape
                                ).astype(np.float32), 0, 1)
    prep = prepare_lut(lut)
    cfg = RenderConfig(interp="tetrahedral", lut_strategy="mxu")
    bsz = _pick_batch_size(w, h)
    y = np.zeros((bsz, h, w), np.uint8)
    u = np.zeros((bsz, h // 2, w // 2), np.uint8)
    v = np.zeros((bsz, h // 2, w // 2), np.uint8)
    t0 = time.perf_counter()
    fn = make_render_fn(prep, cfg)
    out = fn(y, u, v)
    float(np.asarray(out[0][0, 0, 0]))
    dt = time.perf_counter() - t0
    tier = prep.resolve_precision("tetrahedral", "auto")
    print(f"NEW {size}^3 LUT [{tier}] first batch: {dt:.2f}s "
          f"({'ZERO-COMPILE' if dt < 5 else 'compiled?!'})", flush=True)
