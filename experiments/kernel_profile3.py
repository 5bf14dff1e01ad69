"""Implicit-broadcast W build + BM sweep."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import ml_dtypes

N = 33; NSQ = N*N; ROWS = 128; P = 2160*3840
rng = np.random.default_rng(0)
idx3 = jnp.asarray(rng.integers(0, N, (3, P)), jnp.int32)
w6 = jnp.asarray(rng.uniform(0, 1, (6, P)).astype(np.float32))
lmatf = rng.uniform(0, 1, (ROWS, NSQ)).astype(np.float32)
lhi = jnp.asarray(lmatf.astype(ml_dtypes.bfloat16))
llo = jnp.asarray((lmatf - lhi.astype(np.float32)).astype(ml_dtypes.bfloat16))

def sync_time(fn, *args, iters=3):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(iters): float(jnp.sum(fn(*args)))
    return (time.perf_counter()-t0)/iters - 0.030

def build(bm, nmm=2, wstyle="implicit_bf16"):
    def kernel(idx_ref, w_ref, lhi_ref, llo_ref, out_ref):
        idx = idx_ref[:]; wts = w_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, bm), 0)
        def tap(axis):
            p = idx[axis:axis+1, :]; nx = jnp.minimum(p+1, N-1)
            wp = wts[2*axis:2*axis+1, :]; wn = wts[2*axis+1:2*axis+2, :]
            return jnp.where(iota == p, wp, 0.) + jnp.where(iota == nx, wn, 0.)
        rv = tap(0)
        gv = tap(1).astype(jnp.bfloat16); bv = tap(2).astype(jnp.bfloat16)
        if wstyle == "implicit_bf16":
            w = (gv[:, None, :] * bv[None, :, :]).reshape(NSQ, bm)
        else:
            a = jnp.broadcast_to(gv[:, None, :], (N, N, bm)).reshape(NSQ, bm)
            b = jnp.broadcast_to(bv[None, :, :], (N, N, bm)).reshape(NSQ, bm)
            w = a * b
        t = jnp.dot(lhi_ref[:], w, preferred_element_type=jnp.float32)
        if nmm == 2:
            t = t + jnp.dot(llo_ref[:], w, preferred_element_type=jnp.float32)
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            out_ref[c, :] = jnp.sum(seg * rv, axis=0)
    def call(idx3, w6, lhi, llo):
        return pl.pallas_call(kernel, grid=(P // bm,),
            in_specs=[pl.BlockSpec((3, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((6, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
        )(idx3, w6, lhi, llo)
    return jax.jit(call)

for bm in (1024, 2048):
    for nmm in (1, 2):
        try:
            dt = sync_time(build(bm, nmm), idx3, w6, lhi, llo)
            print(f"BM={bm} implicit nmm={nmm}: {dt*1e3:.0f} ms/frame/pass")
        except Exception as e:
            print(f"BM={bm} nmm={nmm} FAIL: {str(e)[:120]}")
