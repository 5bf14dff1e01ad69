"""Raw MXU rate probes: int8 vs int4 vs mixed at the LUT kernel's shapes.

Questions:
  1. What does a bare (256, 1152) @ (1152, BM) int8 dot run at inside a
     Pallas grid (the kernel's exact shape)? -> true dot floor.
  2. Does int4 x int4 -> int32 lower at all, and at what rate?
  3. Does int8 x int4 work?
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SYNC_MS = 30.0
NPIX = 3840 * 2160


def timed(fn, *args, iters=5):
    float(jnp.sum(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append((time.perf_counter() - t0) * 1e3 - SYNC_MS)
    return float(np.median(ts))


def dot_kernel(n_dots, ldt, wdt, x_ref, l_ref, out_ref):
    x = x_ref[:]
    lq = l_ref[:]
    rows, k = lq.shape
    bm = x.shape[1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (k, bm), 0)
    acc = None
    for i in range(n_dots):
        srow = jnp.round(x[0:1, :] * 100.0 + i)
        w = jnp.where(kio == i, srow, -1.0).astype(wdt)
        d = jnp.dot(lq, w, preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    out_ref[:, :] = acc[:8, :].astype(jnp.float32)


def bench(rows, k, bm, n_dots, ldt, wdt, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, NPIX)).astype(np.float32))
    lv = rng.integers(-7, 7, (rows, k)).astype(np.int8)
    lq8 = jnp.asarray(lv, jnp.int8)
    kern = functools.partial(dot_kernel, n_dots, ldt, wdt)
    f = pl.pallas_call(
        kern,
        grid=(NPIX // bm,),
        in_specs=[
            pl.BlockSpec((8, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, NPIX), jnp.float32),
    )
    jf = jax.jit(lambda x: f(x, lq8.astype(ldt)))
    try:
        ms = timed(jf, x)
        tops = n_dots * rows * k * NPIX * 2 / (ms * 1e-3) / 1e12
        print(f"{label:34s} rows={rows} K={k} BM={bm} x{n_dots}: "
              f"{ms:7.2f} ms  {tops:6.1f} TOPS", flush=True)
        return ms
    except Exception as exc:
        print(f"{label:34s}: FAIL {str(exc)[:180]}", flush=True)
        return None


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    # 1. the kernel's exact dot shape (int8 pair, one dot per pass)
    bench(256, 1152, 1024, 2, jnp.int8, jnp.int8, "int8 kernel-shape 2 dots")
    bench(256, 1152, 2048, 2, jnp.int8, jnp.int8, "int8 kernel-shape BM2048")
    bench(256, 1152, 1024, 1, jnp.int8, jnp.int8, "int8 kernel-shape 1 dot")
    # bigger M for reference
    bench(512, 1152, 1024, 2, jnp.int8, jnp.int8, "int8 M=512")
    # 2. int4
    bench(256, 1152, 1024, 2, jnp.int4, jnp.int4, "int4 x int4")
    bench(512, 1152, 1024, 2, jnp.int4, jnp.int4, "int4 x int4 M=512")
    # 3. mixed
    bench(256, 1152, 1024, 2, jnp.int4, jnp.int8, "int4 L x int8 W")
    bench(256, 1152, 1024, 2, jnp.int8, jnp.int4, "int8 L x int4 W")


if __name__ == "__main__":
    main()
