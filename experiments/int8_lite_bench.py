"""Time int8_lite vs int8_fast on-chip (33^3 + 65^3), with parity."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.colorcore.interp import apply_lut
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

rng = np.random.default_rng(0)
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

def chain(prep, k, interp, precision):
    @jax.jit
    def f(r, g, b):
        for _ in range(k):
            r, g, b = apply_lut_planes(r, g, b, prep, interp,
                                       precision=precision)
        return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
    return f

def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters

def bench(prep, interp, precision, tag):
    try:
        t1 = sync_time(chain(prep, 1, interp, precision), rj, gj, bj)
        t3 = sync_time(chain(prep, 3, interp, precision), rj, gj, bj)
        per = (t3 - t1) / 2
        print(f"{tag:34s}: {per*1e3:6.1f} ms = {1/per:5.1f} fps", flush=True)
    except Exception as e:
        print(f"{tag:34s} FAILED: {str(e)[:250]}", flush=True)

def parity(prep, lut, interp, precision, tag):
    P = 8192
    rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
    gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
    bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
    ro, go, bo = apply_lut_planes(jnp.asarray(rs), jnp.asarray(gs),
                                  jnp.asarray(bs), prep, interp,
                                  precision=precision)
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], 1)
    want = apply_lut(np.stack([rs[0], gs[0], bs[0]], 1), lut, interp)
    ub = np.abs(got - want).max() * 255 * np.sqrt(3)
    print(f"{tag:34s}: parity dE76 upper-bound {ub:.4f}", flush=True)

lut33 = Lut3D.identity(33)
lut33.table = np.clip(lut33.table + rng.uniform(
    -0.05, 0.05, lut33.table.shape).astype(np.float32), 0, 1)
p33 = prepare_lut(lut33)
print("33 auto tetra:", p33.resolve_precision("tetrahedral", "auto"),
      "lite sim:", round(p33.mode_error("tetrahedral", "int8_lite"), 4),
      flush=True)
for interp in ("tetrahedral", "trilinear"):
    bench(p33, interp, "int8_lite", f"33 {interp} int8_lite")
parity(p33, lut33, "tetrahedral", "int8_lite", "33 tetra int8_lite")
parity(p33, lut33, "trilinear", "int8_lite", "33 tri int8_lite")
