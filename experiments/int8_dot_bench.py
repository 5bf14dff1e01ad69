"""Measure Pallas MXU dot throughput at the LUT-kernel shapes: bf16 vs int8.

Per grid step: (ROWS, NSQ) @ (NSQ, BM). The L and W blocks are single fixed
blocks (index_map -> (0,0)) so HBM holds only a few MB; the grid replays the
dot npix/BM times, which isolates MXU throughput exactly like the real
kernel's inner dot. Timing: scalar readback, median, minus ~30 ms sync.
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
    out = fn(*args)
    float(jnp.sum(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) * 1e3 - SYNC_MS)
    return float(np.median(ts))


def dot_kernel(acc_t, l_ref, w_ref, out_ref):
    acc = jnp.dot(l_ref[:], w_ref[:], preferred_element_type=acc_t)
    out_ref[:] = acc[:8].astype(jnp.float32)


def make_dot(rows, nsq, bm, steps, dtype):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
    kernel = functools.partial(dot_kernel, acc_t)

    @jax.jit
    def run(l, w):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((rows, nsq), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nsq, bm), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, bm), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, bm), jnp.float32),
        )(l, w)

    return run


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    configs = [
        (33, 256, 1024),   # current exact-33 stacked shape
        (33, 512, 1024),
        (65, 256, 512),
        (65, 512, 512),
        (65, 256, 1024),
    ]
    for n, rows, bm in configs:
        nsq = n * n
        steps = NPIX // bm
        for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            l = jnp.asarray(rng.integers(-100, 100, (rows, nsq)), dtype)
            w = jnp.asarray(rng.integers(0, 2, (nsq, bm)), dtype)
            try:
                ms = timed(make_dot(rows, nsq, bm, steps, dtype), l, w)
            except Exception as exc:
                print(f"N={n} rows={rows} bm={bm} {name}: FAIL "
                      f"{str(exc)[:150]}", flush=True)
                continue
            tops = 2 * rows * nsq * bm * steps / (ms / 1e3) / 1e12
            print(f"N={n} rows={rows} bm={bm} {name}: {ms:7.2f} ms/4K "
                  f"({tops:6.1f} TOPS)", flush=True)


if __name__ == "__main__":
    main()
