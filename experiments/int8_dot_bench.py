"""Measure Pallas MXU dot throughput at the LUT-kernel shapes: bf16 vs int8.

Shapes: (ROWS, NSQ) @ (NSQ, BM) per grid step, grid over a 4K frame's pixel
blocks. This isolates the dot from the tap/W-build work to answer: does int8
actually run ~2x bf16 on v5e at these shapes (peak 394 vs 197 TOPS)?

Timing: scalar-readback sync (axon block_until_ready is a no-op), median of
repeats, ~30 ms sync overhead subtracted per CLAUDE.md.
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


def timed(fn, *args, iters=7):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append((time.perf_counter() - t0) * 1e3 - SYNC_MS)
    return float(np.median(ts))


def dot_kernel(w_dtype, l_ref, w_ref, out_ref):
    acc = jnp.dot(l_ref[:], w_ref[:], preferred_element_type=jnp.float32
                  if w_dtype != jnp.int8 else jnp.int32)
    out_ref[:] = acc[:8].astype(jnp.float32)


def make_dot(rows, nsq, bm, npix, dtype):
    kernel = functools.partial(dot_kernel, dtype)

    @jax.jit
    def run(l, w):
        return pl.pallas_call(
            kernel,
            grid=(npix // bm,),
            in_specs=[
                pl.BlockSpec((rows, nsq), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nsq, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, bm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, npix), jnp.float32),
        )(l, w)

    return run


def main():
    npix = 3840 * 2160
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    configs = [
        # (N, rows, bm): current exact-33 stacked shape, int8-pair-33 shape,
        # 65 fast/pair shapes at feasible BMs
        (33, 256, 1024),
        (33, 512, 1024),
        (65, 256, 512),
        (65, 512, 512),
        (65, 256, 1024),
    ]
    for n, rows, bm in configs:
        nsq = n * n
        if True:
            if True:
                # VMEM estimate: L + 2x W blocks + out
                for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
                    esz = 2 if dtype == jnp.bfloat16 else 1
                    vmem = rows * nsq * esz + 2 * nsq * bm * esz + 8 * bm * 4
                    if vmem > 13e6:
                        continue
                    pad = (-npix) % bm
                    np_tot = npix + pad
                    l = jnp.asarray(
                        rng.integers(-100, 100, (rows, nsq)), dtype)
                    w = jnp.asarray(
                        rng.integers(0, 2, (nsq, np_tot)), dtype)
                    try:
                        ms = timed(make_dot(rows, nsq, bm, np_tot, dtype), l, w)
                    except Exception as exc:
                        print(f"N={n} rows={rows} bm={bm} {name}: FAIL "
                              f"{str(exc)[:120]}")
                        continue
                    tops = 2 * rows * nsq * np_tot / (ms / 1e3) / 1e12
                    print(f"N={n} rows={rows} bm={bm} {name}: {ms:7.2f} ms "
                          f"({tops:6.1f} TOPS)")


if __name__ == "__main__":
    main()
