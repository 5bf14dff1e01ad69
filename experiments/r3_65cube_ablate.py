"""Round-3 65^3 attack, step 1: ablate the merged coarse2 kernel on the
real chip and measure the direct (non-decomposed) int8 tiers at N=65.

Hypotheses to test (from FINDINGS round 2):
 - resid int8 dot floor ~43-46 ms; coarse bf16-hi dot ~14 ms; the rest
   (mask builds, tap math, dequant, reduces) ~15-20 ms.
 - direct int8_lite@65 is structurally the resid body alone (single int8
   plane, (224, ~4256) quad dot + identity) with NO coarse term, NO second
   mask set, NO tap remap: predicted ~45-55 ms = 18-22 fps.
 - coarse2 bm sweep (hard-coded 1024 since the merge; fast tier gained
   12% from its own sweep).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import lut3d as L

print("devices:", jax.devices())
rng = np.random.default_rng(0)
lut = Lut3D.identity(65)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)

H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def chain(k, interp, precision):
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


def bench(label, interp, precision):
    try:
        t1 = sync_time(chain(1, interp, precision), rj, gj, bj)
        t5 = sync_time(chain(5, interp, precision), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{label:40s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)
        return per
    except Exception as e:
        print(f"{label:40s} FAILED: {str(e)[:300]}", flush=True)
        return None


# sim-gate info for the direct tiers at 65
for m in ("fast", "int8_lite", "int8_fast"):
    e = prep.mode_error("tetrahedral", m)
    print(f"sim dE76 tetra {m:10s}: {e:.4f}")
for m in ("coarse2f", "coarse2"):
    e = prep.mode_error("tetrahedral", m)
    print(f"sim dE76 tetra {m:10s}: {e:.4f}")

bench("coarse2f tetra bm1024 (prod)", "tetrahedral", "coarse2f")
bench("coarse2f trilinear bm1024", "trilinear", "coarse2f")
bench("direct int8_lite tetra", "tetrahedral", "int8_lite")
bench("direct int8_lite trilinear", "trilinear", "int8_lite")
bench("direct int8_fast tetra", "tetrahedral", "int8_fast")
bench("direct fast (bf16 hi) tetra", "tetrahedral", "fast")
bench("coarse2 (int8 coarse) tetra", "tetrahedral", "coarse2")

# (_COARSE2_BM became the size-dependent _coarse2_bm(n) in round 5 —
# monkeypatch the function, like the _block_pixels sweep below)
_orig_cbm = L._coarse2_bm
for bm in (512, 2048):
    L._coarse2_bm = lambda n, _bm=bm: _bm
    bench(f"coarse2f tetra bm{bm}", "tetrahedral", "coarse2f")
L._coarse2_bm = _orig_cbm

# block sweep for the direct lite tier (N>=49 1-pass policy is 512/256)
import lut_renderer_tpu.ops.lut3d as l3
orig = l3._block_pixels
for bm in (512, 1024):
    l3._block_pixels = lambda n, mode="exact", n_passes=2, _bm=bm: _bm
    bench(f"direct int8_lite tetra bm{bm}", "tetrahedral", "int8_lite")
l3._block_pixels = orig
