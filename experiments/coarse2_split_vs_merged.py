"""ARCHIVED measurement: pins the pre-merge split-launcher API
(_launch_resid2/_launch_coarse were removed from ops/lut3d.py after the
merged coarse2 kernel landed); kept for the measurement record only.

Decompose the 65^3 coarse2 time: split launchers vs merged kernel,
per-term times, tetra + trilinear residual variants."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L

rng = np.random.default_rng(0)
lut = Lut3D.identity(65)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
n = 65
dmin = tuple(float(v) for v in prep.domain_min)
dmax = tuple(float(v) for v in prep.domain_max)

H, W = 2160, 3840
P = H * W
rgb3 = jnp.asarray(rng.uniform(0, 1, (3, P)).astype(np.float32))


def sync_time(fn, *args, iters=5):
    s = fn(*args); float(jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


for interp in ("tetrahedral", "trilinear"):
    f_resid = jax.jit(lambda x, i=interp: L._launch_resid2(
        x, prep, n, n, i, dmin, dmax, False))
    f_coarse = jax.jit(lambda x, i=interp: L._launch_coarse(
        x, prep.coarse, n, i, "int8_fast", dmin, dmax, False))
    f_split = jax.jit(lambda x, i=interp: (L._launch_resid2(
        x, prep, n, n, i, dmin, dmax, False) + L._launch_coarse(
        x, prep.coarse, n, i, "int8_fast", dmin, dmax, False)))
    f_merged = jax.jit(lambda x, i=interp: L._run_coarse2_fused(
        x, prep, n, i, "coarse2", False))
    for name, f in (("resid", f_resid), ("coarse", f_coarse),
                    ("split-sum", f_split), ("merged", f_merged)):
        try:
            dt = sync_time(f, rgb3)
            print(f"{interp:12s} {name:10s}: {dt*1e3:7.1f} ms")
        except Exception as e:
            print(f"{interp:12s} {name:10s} FAILED: {str(e)[:200]}")
