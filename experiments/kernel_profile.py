"""Isolate kernel cost components: W-build vs matmul vs r-contract, BM sweep, precision."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 33
NSQ = N * N
ROWS = 128
P = 2160 * 3840  # one 4K frame

rng = np.random.default_rng(0)
idx3 = jnp.asarray(rng.integers(0, N, (3, P)), jnp.int32)
w6 = jnp.asarray(rng.uniform(0, 1, (6, P)).astype(np.float32))
lmat = jnp.asarray(rng.uniform(0, 1, (ROWS, NSQ)).astype(np.float32))

def sync_time(fn, *args, iters=3):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s[0]) if isinstance(s, tuple) else jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
        float(jnp.sum(s[0]) if isinstance(s, tuple) else jnp.sum(s))
    return (time.perf_counter()-t0)/iters

def make(variant, bm, precision="highest"):
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    def kernel(idx_ref, w_ref, lmat_ref, out_ref):
        idx = idx_ref[:]; wts = w_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, bm), 0)
        def tap(axis):
            p = idx[axis:axis+1, :]
            nx = jnp.minimum(p + 1, N - 1)
            wp = wts[2*axis:2*axis+1, :]; wn = wts[2*axis+1:2*axis+2, :]
            return jnp.where(iota == p, wp, 0.0) + jnp.where(iota == nx, wn, 0.0)
        rv = tap(0); gv = tap(1); bv = tap(2)
        if variant == "taps_only":
            out_ref[0, :] = jnp.sum(rv, axis=0) + jnp.sum(gv, axis=0) + jnp.sum(bv, axis=0)
            for c in range(1,3): out_ref[c, :] = out_ref[0, :]
            return
        a = jnp.broadcast_to(gv[:, None, :], (N, N, bm)).reshape(NSQ, bm)
        b = jnp.broadcast_to(bv[None, :, :], (N, N, bm)).reshape(NSQ, bm)
        w = a * b
        if variant == "build_only":
            out_ref[0, :] = jnp.sum(w, axis=0)
            for c in range(1,3): out_ref[c, :] = out_ref[0, :]
            return
        t = jnp.dot(lmat_ref[:], w, preferred_element_type=jnp.float32, precision=prec)
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            out_ref[c, :] = jnp.sum(seg * rv, axis=0)
    def call(idx3, w6, lmat):
        return pl.pallas_call(
            kernel,
            grid=(P // bm,),
            in_specs=[
                pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((6, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
        )(idx3, w6, lmat)
    return jax.jit(call)

for bm in (512, 1024, 2048):
    for variant in ("taps_only", "build_only", "full"):
        try:
            dt = sync_time(make(variant, bm), idx3, w6, lmat)
            print(f"BM={bm} {variant}: {dt*1e3:.1f} ms/frame")
        except Exception as e:
            print(f"BM={bm} {variant}: FAIL {str(e)[:120]}")
dt = sync_time(make("full", 1024, "default"), idx3, w6, lmat)
print(f"BM=1024 full bf16-matmul: {dt*1e3:.1f} ms/frame")
