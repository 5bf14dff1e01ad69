"""v2 component profile: where do the ms go?"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import ml_dtypes

N = 33; NSQ = N*N; ROWS = 128; P = 2160*3840; BM = 1024
rng = np.random.default_rng(0)
idx3 = jnp.asarray(rng.integers(0, N, (3, P)), jnp.int32)
w6 = jnp.asarray(rng.uniform(0, 1, (6, P)).astype(np.float32))
lmatf = rng.uniform(0, 1, (ROWS, NSQ)).astype(np.float32)
lhi = jnp.asarray(lmatf.astype(ml_dtypes.bfloat16))
llo = jnp.asarray((lmatf - lhi.astype(np.float32)).astype(ml_dtypes.bfloat16))
lcat = jnp.concatenate([lhi, llo], axis=0)  # (256, NSQ)

def sync_time(fn, *args, iters=3):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(iters): float(jnp.sum(fn(*args)))
    return (time.perf_counter()-t0)/iters - 0.030

def build(variant):
    def kernel(idx_ref, w_ref, lhi_ref, llo_ref, out_ref):
        idx = idx_ref[:]; wts = w_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, BM), 0)
        def tap(axis, dtype=jnp.float32):
            p = idx[axis:axis+1, :]; nx = jnp.minimum(p+1, N-1)
            wp = wts[2*axis:2*axis+1, :].astype(dtype); wn = wts[2*axis+1:2*axis+2, :].astype(dtype)
            z = jnp.zeros((), dtype)
            return jnp.where(iota == p, wp, z) + jnp.where(iota == nx, wn, z)
        rv = tap(0)
        if variant == "bf16taps":
            gv = tap(1).astype(jnp.bfloat16); bv = tap(2).astype(jnp.bfloat16)
            a = jnp.broadcast_to(gv[:, None, :], (N, N, BM)).reshape(NSQ, BM)
            b = jnp.broadcast_to(bv[None, :, :], (N, N, BM)).reshape(NSQ, BM)
            w = a * b
        else:
            gv = tap(1); bv = tap(2)
            a = jnp.broadcast_to(gv[:, None, :], (N, N, BM)).reshape(NSQ, BM)
            b = jnp.broadcast_to(bv[None, :, :], (N, N, BM)).reshape(NSQ, BM)
            w = (a * b).astype(jnp.bfloat16)
        if variant == "build":
            out_ref[0, :] = jnp.sum(w.astype(jnp.float32), axis=0)
            for c in range(1,3): out_ref[c,:] = out_ref[0,:]
            return
        if variant in ("1mm", "bf16taps"):
            t = jnp.dot(lhi_ref[:], w, preferred_element_type=jnp.float32)
        elif variant == "2mm":
            t = jnp.dot(lhi_ref[:], w, preferred_element_type=jnp.float32) + jnp.dot(llo_ref[:], w, preferred_element_type=jnp.float32)
        elif variant == "cat":
            tb = jnp.dot(lhi_ref[:], w, preferred_element_type=jnp.float32)  # placeholder replaced below
            t = tb
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            out_ref[c, :] = jnp.sum(seg * rv, axis=0)
    def call(idx3, w6, lhi, llo):
        return pl.pallas_call(kernel, grid=(P // BM,),
            in_specs=[pl.BlockSpec((3, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((6, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
        )(idx3, w6, lhi, llo)
    return jax.jit(call)

# cat variant: single (256, NSQ) stationary
def build_cat():
    def kernel(idx_ref, w_ref, lcat_ref, out_ref):
        idx = idx_ref[:]; wts = w_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, BM), 0)
        def tap(axis):
            p = idx[axis:axis+1, :]; nx = jnp.minimum(p+1, N-1)
            wp = wts[2*axis:2*axis+1, :]; wn = wts[2*axis+1:2*axis+2, :]
            return jnp.where(iota == p, wp, 0.) + jnp.where(iota == nx, wn, 0.)
        rv = tap(0); gv = tap(1); bv = tap(2)
        a = jnp.broadcast_to(gv[:, None, :], (N, N, BM)).reshape(NSQ, BM)
        b = jnp.broadcast_to(bv[None, :, :], (N, N, BM)).reshape(NSQ, BM)
        w = (a * b).astype(jnp.bfloat16)
        t2 = jnp.dot(lcat_ref[:], w, preferred_element_type=jnp.float32)  # (256, BM)
        t = t2[:ROWS, :] + t2[ROWS:, :]
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            out_ref[c, :] = jnp.sum(seg * rv, axis=0)
    def call(idx3, w6, lcat):
        return pl.pallas_call(kernel, grid=(P // BM,),
            in_specs=[pl.BlockSpec((3, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((6, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((2*ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
        )(idx3, w6, lcat)
    return jax.jit(call)

for v in ("build", "1mm", "2mm", "bf16taps"):
    try:
        dt = sync_time(build(v), idx3, w6, lhi, llo)
        print(f"{v}: {dt*1e3:.0f} ms/frame")
    except Exception as e:
        print(f"{v}: FAIL {str(e)[:100]}")
try:
    dt = sync_time(build_cat(), idx3, w6, lcat)
    print(f"cat(256 rows, 1 matmul): {dt*1e3:.0f} ms/frame")
except Exception as e:
    print(f"cat FAIL: {str(e)[:150]}")
