"""ARCHIVED measurement: the int4-residual "coarse2q" rung was reverted
(73.8 vs 75.1 ms — not dot-bound; see FINDINGS). Pins removed prepare
fields (resid_q4*); kept for the measurement record only."""
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

lut = Lut3D.identity(65)
t = lut.table
curve = np.clip(t * 1.08 - 0.02 + 0.05 * np.sin(t * 3.1), 0, 1)
lut.table = (0.92 * curve
             + 0.08 * curve.mean(axis=-1, keepdims=True)).astype(np.float32)
prep = prepare_lut(lut)
print("auto:", prep.resolve_precision("tetrahedral", "auto"),
      "q sim:", round(prep.mode_error("tetrahedral", "coarse2q"), 4),
      flush=True)

# parity first (one compile, small pixel count -> also validates lowering)
P = 8192
rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
for prec in ("coarse2q", "coarse2f"):
    f = jax.jit(lambda r, g, b, prec=prec: apply_lut_planes(
        r, g, b, prep, "tetrahedral", precision=prec))
    ro, go, bo = f(jnp.asarray(rs), jnp.asarray(gs), jnp.asarray(bs))
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], 1)
    want = apply_lut(np.stack([rs[0], gs[0], bs[0]], 1), lut, "tetrahedral")
    print(f"{prec}: parity dE-ub "
          f"{np.abs(got - want).max() * 255 * np.sqrt(3):.4f}", flush=True)


def chain(k, prec):
    @jax.jit
    def f(r, g, b):
        for _ in range(k):
            r, g, b = apply_lut_planes(r, g, b, prep, "tetrahedral",
                                       precision=prec)
        return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
    return f


def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


for prec in ("coarse2q", "coarse2f"):
    t1 = sync_time(chain(1, prec), rj, gj, bj)
    t3 = sync_time(chain(3, prec), rj, gj, bj)
    per = (t3 - t1) / 2
    print(f"65 tetra {prec}: {per*1e3:.1f} ms = {1/per:.1f} fps", flush=True)
