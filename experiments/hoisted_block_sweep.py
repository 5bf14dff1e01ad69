"""Block-size sweep for the hoisted-dot kernels: the per-pass W tile is gone,
so the old VMEM-pressure-derived block policy may be stale."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L

rng = np.random.default_rng(0)
H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

def chain(prep, k, interp, precision):
    @jax.jit
    def f(r, g, b):
        for _ in range(k):
            r, g, b = L.apply_lut_planes(r, g, b, prep, interp,
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
        t5 = sync_time(chain(prep, 5, interp, precision), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{tag:40s}: {per*1e3:6.1f} ms", flush=True)
    except Exception as e:
        print(f"{tag:40s} FAILED: {str(e)[:200]}", flush=True)

lut33 = Lut3D.identity(33)
lut33.table = np.clip(lut33.table + rng.uniform(
    -0.02, 0.02, lut33.table.shape).astype(np.float32), 0, 1)
p33 = prepare_lut(lut33)
lut65 = Lut3D.identity(65)
lut65.table = np.clip(lut65.table + rng.uniform(
    -0.02, 0.02, lut65.table.shape).astype(np.float32), 0, 1)
p65 = prepare_lut(lut65)

orig = L._block_pixels
for bm in (512, 1024, 2048, 4096):
    L._block_pixels = lambda n, mode="exact", n_passes=2, bm=bm: bm
    bench(p33, "tetrahedral", "int8_fast", f"33 tetra int8 bm={bm}")
    bench(p33, "trilinear", "int8_fast", f"33 tri int8 bm={bm}")
L._block_pixels = orig

# merged coarse2 uses a hard bm=1024; patch it via the module constant sweep
src_bm = []
import lut_renderer_tpu.ops.lut3d as M
import re, types
for bm in (512, 1024, 2048):
    # re-run with the launcher's bm monkeypatched through _block_pixels is
    # not possible (hardcoded); emulate by padding npix and calling
    # _run_coarse2_fused directly with edited bm
    def run(bm=bm, interp="tetrahedral"):
        P = H * W
        rgb3 = jnp.asarray(rng.uniform(0, 1, (3, P)).astype(np.float32))
        import functools
        f = jax.jit(lambda x: jnp.sum(M._run_coarse2_fused_bm(
            x, p65, 65, interp, "coarse2", False, bm)))
        return None
    pass
print("(coarse2 bm sweep needs launcher param; skipped here)")
