import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L3
lut = Lut3D.identity(33)
prep = prepare_lut(lut)
rng = np.random.default_rng(0)
P = 2160*3840
r = jnp.asarray(rng.uniform(0,1,(P,)).astype(np.float32))

def sync_time(fn, *args, iters=3):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s[0]) if isinstance(s,(tuple,list)) else jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
        float(jnp.sum(s[0]) if isinstance(s,(tuple,list)) else jnp.sum(s))
    return (time.perf_counter()-t0)/iters - 0.030

# XLA-side prep only (indices + both tetra passes' weights)
@jax.jit
def prep_only(rf):
    pr, nr, dr = L3._scaled_coords(rf, 33, 0.0, 1.0)
    pg, ng, dg = L3._scaled_coords(rf, 33, 0.0, 1.0)
    pb, nb, db = L3._scaled_coords(rf, 33, 0.0, 1.0)
    idx3 = jnp.stack([pr, pg, pb])
    passes = L3._passes_for_interp("tetrahedral", pr, nr, dr, pg, ng, dg, pb, nb, db, 33)
    return [idx3] + passes
print(f"XLA prep (tetra): {sync_time(prep_only, r)*1e3:.0f} ms")

@jax.jit
def full(rf):
    ro, go, bo = L3.apply_lut_planes(rf, rf, rf, prep, "tetrahedral")
    return ro
print(f"full tetra: {sync_time(full, r)*1e3:.0f} ms")

@jax.jit
def full_tri(rf):
    ro, go, bo = L3.apply_lut_planes(rf, rf, rf, prep, "trilinear")
    return ro
print(f"full trilinear: {sync_time(full_tri, r)*1e3:.0f} ms")
