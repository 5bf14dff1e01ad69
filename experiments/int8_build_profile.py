"""Isolate the int8 weight-tile build cost: which variant lowers fastest?

Variants (all produce a (NSQ, BM) int8 tile per grid step then dot it):
  supplied : tile comes in as a kernel input (no build) — dot-only floor
  round    : w8 = round(a*b).astype(int8)            [current kernel]
  floorhalf: w8 = (a*b + 0.5).astype(int8)           [trunc == round, w>=0]
  bf16prod : w8 = (a16*b16 + 0.5).astype(int8)       [bf16 product, 1 convert]
  f32mask  : like round but masks built f32 then single convert
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
N = 33
NSQ = N * N
BM = 1024
ROWS = 256
NPIX = 3840 * 2160
STEPS = NPIX // BM


def timed(fn, *args, iters=5):
    float(jnp.sum(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append((time.perf_counter() - t0) * 1e3 - SYNC_MS)
    return float(np.median(ts))


def kernel(variant, idx_ref, w_ref, lq_ref, sup_ref, out_ref):
    idx = idx_ref[:]
    wts = w_ref[:]
    bm = idx.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, bm), 0)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (NSQ, bm), 0)
    pk = idx[2:3, :]
    nk = jnp.minimum(pk + 1, N - 1)

    def tap(axis, scale=1.0, dtype=jnp.float32):
        p = idx[axis:axis + 1, :]
        nx = jnp.minimum(p + 1, N - 1)
        wp = (wts[2 * axis:2 * axis + 1, :] * scale).astype(dtype)
        wn = (wts[2 * axis + 1:2 * axis + 2, :] * scale).astype(dtype)
        zero = jnp.zeros((), dtype)
        return (jnp.where(iota == p, wp, zero)
                + jnp.where(iota == nx, wn, zero))

    if variant == "supplied":
        w8 = sup_ref[:]
    elif variant == "round":
        a = pltpu.repeat(tap(1, 127.0), N, axis=0)
        maskp = jnp.where((t_iota >= pk * N) & (t_iota < pk * N + N), 1.0, 0.0)
        maskn = jnp.where((t_iota >= nk * N) & (t_iota < nk * N + N), 1.0, 0.0)
        b32 = maskp * wts[4:5, :] + maskn * wts[5:6, :]
        w8 = jnp.round(a * b32).astype(jnp.int8)
    elif variant == "floorhalf":
        a = pltpu.repeat(tap(1, 127.0), N, axis=0)
        maskp = jnp.where((t_iota >= pk * N) & (t_iota < pk * N + N), 1.0, 0.0)
        maskn = jnp.where((t_iota >= nk * N) & (t_iota < nk * N + N), 1.0, 0.0)
        b32 = maskp * wts[4:5, :] + maskn * wts[5:6, :]
        w8 = (a * b32 + 0.5).astype(jnp.int8)
    elif variant == "bf16prod":
        a16 = pltpu.repeat(tap(1, 127.0, jnp.bfloat16), N, axis=0)
        maskp = jnp.where((t_iota >= pk * N) & (t_iota < pk * N + N), 1.0, 0.0)
        maskn = jnp.where((t_iota >= nk * N) & (t_iota < nk * N + N), 1.0, 0.0)
        b16 = (maskp * wts[4:5, :] + maskn * wts[5:6, :]).astype(jnp.bfloat16)
        w8 = (a16 * b16 + jnp.bfloat16(0.5)).astype(jnp.int8)
    out_ref[:] = jnp.dot(lq_ref[:], w8,
                         preferred_element_type=jnp.int32)[:8].astype(
        jnp.float32)


def make(variant):
    k = functools.partial(kernel, variant)

    @jax.jit
    def run(idx, w, lq, sup):
        return pl.pallas_call(
            k,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((3, BM), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, BM), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NSQ, BM), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BM), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, NPIX), jnp.float32),
        )(idx, w, lq, sup)

    return run


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N - 1, (3, NPIX)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (6, NPIX)), jnp.float32)
    lq = jnp.asarray(rng.integers(-127, 127, (ROWS, NSQ)), jnp.int8)
    sup = jnp.asarray(rng.integers(0, 127, (NSQ, BM)), jnp.int8)
    print(f"device: {jax.devices()[0]}", flush=True)
    for variant in ("supplied", "round", "floorhalf", "bf16prod"):
        try:
            ms = timed(make(variant), idx, w, lq, sup)
            print(f"{variant:9s}: {ms:7.2f} ms/4K-pass", flush=True)
        except Exception as exc:
            print(f"{variant:9s}: FAIL {str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
