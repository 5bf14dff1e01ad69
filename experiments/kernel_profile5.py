"""W-build strategies: implicit-3D vs pad-48-layout-free vs repeat-based."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import ml_dtypes

N = 33; ROWS = 128; P = 2160*3840; BM = 1024
KP = 48  # padded k-stride (multiple of bf16 sublane tile 16)
rng = np.random.default_rng(0)
idx3 = jnp.asarray(rng.integers(0, N, (3, P)), jnp.int32)
w6 = jnp.asarray(rng.uniform(0, 1, (6, P)).astype(np.float32))

def lmake(nsq, kmap):
    lm = np.zeros((ROWS, nsq), np.float32)
    base = rng.uniform(0, 1, (ROWS, N*N)).astype(np.float32)
    for j in range(N):
        for k in range(N):
            lm[:, kmap(j, k)] = base[:, j*N+k]
    hi = lm.astype(ml_dtypes.bfloat16)
    lo = (lm - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)

lhi_a, llo_a = lmake(N*N, lambda j,k: j*N+k)
lhi_b, llo_b = lmake(N*KP, lambda j,k: j*KP+k)

def sync_time(fn, *args, iters=3):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(iters): float(jnp.sum(fn(*args)))
    return (time.perf_counter()-t0)/iters - 0.030

def make(variant, nsq, nmm=2):
    def kernel(idx_ref, w_ref, lhi_ref, llo_ref, out_ref):
        idx = idx_ref[:]; wts = w_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, BM), 0)
        def tap(axis, nn=N):
            p = idx[axis:axis+1, :]; nx = jnp.minimum(p+1, N-1)
            wp = wts[2*axis:2*axis+1, :]; wn = wts[2*axis+1:2*axis+2, :]
            io = iota if nn == N else jax.lax.broadcasted_iota(jnp.int32, (nn, BM), 0)
            return jnp.where(io == p, wp, 0.) + jnp.where(io == nx, wn, 0.)
        rv = tap(0)
        if variant == "implicit":
            gv = tap(1).astype(jnp.bfloat16); bv = tap(2).astype(jnp.bfloat16)
            w = (gv[:, None, :] * bv[None, :, :]).reshape(nsq, BM)
        elif variant == "pad48":
            gv = tap(1).astype(jnp.bfloat16)
            bv = tap(2, KP).astype(jnp.bfloat16)     # (48, BM), rows 33.. zero
            w = (gv[:, None, :] * bv[None, :, :]).reshape(nsq, BM)
        elif variant == "repeat":
            gv = tap(1).astype(jnp.bfloat16); bv = tap(2).astype(jnp.bfloat16)
            a = pltpu.repeat(gv, N, axis=0)           # (N*N, BM) g-major
            b = jnp.concatenate([bv] * N, axis=0)     # tile
            w = a * b
        t = jnp.dot(lhi_ref[:], w, preferred_element_type=jnp.float32)
        if nmm == 2:
            t = t + jnp.dot(llo_ref[:], w, preferred_element_type=jnp.float32)
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            out_ref[c, :] = jnp.sum(seg * rv, axis=0)
    def call(idx3, w6, lhi, llo):
        return pl.pallas_call(kernel, grid=(P // BM,),
            in_specs=[pl.BlockSpec((3, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((6, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, nsq), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, nsq), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
        )(idx3, w6, lhi, llo)
    return jax.jit(call)

for variant, nsq, lhi, llo in [("implicit", N*N, lhi_a, llo_a),
                               ("pad48", N*KP, lhi_b, llo_b),
                               ("repeat", N*N, lhi_a, llo_a)]:
    for nmm in (1, 2):
        try:
            dt = sync_time(make(variant, nsq, nmm), idx3, w6, lhi, llo)
            print(f"{variant} nmm={nmm}: {dt*1e3:.0f} ms/frame/pass")
        except Exception as e:
            print(f"{variant} nmm={nmm}: FAIL {str(e)[:140]}")
