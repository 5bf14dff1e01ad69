"""Time the MERGED coarse2 kernel (one pallas_call) at 65^3 on the real TPU,
plus parity vs the f64 oracle interpolator."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

print("devices:", jax.devices())
rng = np.random.default_rng(0)
lut = Lut3D.identity(65)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
print("auto tier tetra:", prep.resolve_precision("tetrahedral", "auto"),
      "tri:", prep.resolve_precision("trilinear", "auto"))

H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def chain(k, interp, precision):
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


for interp in ("tetrahedral", "trilinear"):
    prec = prep.resolve_precision(interp, "auto")
    try:
        t1 = sync_time(chain(1, interp, prec), rj, gj, bj)
        t5 = sync_time(chain(5, interp, prec), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{interp} [{prec}]: per-apply {per*1e3:.1f} ms = "
              f"{1/per:.1f} fps")
    except Exception as e:
        print(f"{interp} [{prec}] FAILED: {str(e)[:400]}")

# parity spot-check on a small random block
P = 4096
rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
from lut_renderer_tpu.colorcore.interp import apply_lut
for interp in ("tetrahedral", "trilinear"):
    prec = prep.resolve_precision(interp, "auto")
    ro, go, bo = apply_lut_planes(jnp.asarray(rs), jnp.asarray(gs),
                                  jnp.asarray(bs), prep, interp,
                                  precision=prec)
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], axis=1)
    want = apply_lut(np.stack([rs[0], gs[0], bs[0]], axis=1), lut, interp)
    err = np.abs(got - want).max()
    de = np.linalg.norm((got - want) * 255.0, axis=1).max()
    print(f"{interp} [{prec}] parity: max abs {err:.2e}, max dE76-ish {de:.3f}")

# explicit-tier timings (gate-independent): the _tri residual substitution
for prec in ("coarse2_tri", "coarse2"):
    try:
        t1 = sync_time(chain(1, "tetrahedral", prec), rj, gj, bj)
        t5 = sync_time(chain(5, "tetrahedral", prec), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"tetrahedral [{prec}]: per-apply {per*1e3:.1f} ms = "
              f"{1/per:.1f} fps")
    except Exception as e:
        print(f"tetrahedral [{prec}] FAILED: {str(e)[:300]}")
