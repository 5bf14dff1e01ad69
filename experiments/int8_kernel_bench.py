"""Time the real LUT kernel at 4K for every precision tier, 33^3 and 65^3."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import apply_lut_planes

SYNC_MS = 30.0
H, W = 2160, 3840


def timed(fn, *args, iters=5):
    float(jnp.sum(sum(fn(*args))))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(sum(fn(*args))))
        ts.append((time.perf_counter() - t0) * 1e3 - SYNC_MS)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    print(f"device: {jax.devices()[0]}", flush=True)
    for n in (33, 65):
        lut = Lut3D.identity(n)
        lut.table = np.clip(
            lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(
                np.float32), 0, 1)
        prep = prepare_lut(lut)
        for interp in ("tetrahedral", "trilinear"):
            for prec in ("int8_fast", "int8", "exact"):
                err = prep.mode_error(interp, prec) if prec != "exact" else 0.0

                @jax.jit
                def step(r, g, b, interp=interp, prec=prec, prep=prep):
                    return apply_lut_planes(r, g, b, prep, interp,
                                            strategy="mxu", precision=prec)

                try:
                    ms = timed(step, r, g, b)
                except Exception as exc:
                    print(f"N={n} {interp} {prec}: FAIL {str(exc)[:140]}",
                          flush=True)
                    continue
                print(f"N={n} {interp:11s} {prec:9s}: {ms:7.2f} ms/4K "
                      f"({1e3 / ms:5.1f} fps)  simErr={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
