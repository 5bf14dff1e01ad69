"""One big dot per kernel: lcat (256, NSQ) @ [W1|W2] (NSQ, 2BM)."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import ml_dtypes

N = 33; NSQ = N*N; ROWS = 128; P = 2160*3840; BM = 1024
rng = np.random.default_rng(0)
idx3 = jnp.asarray(rng.integers(0, N, (3, P)), jnp.int32)
w12 = jnp.asarray(rng.uniform(0, 1, (12, P)).astype(np.float32))
lmatf = rng.uniform(0, 1, (ROWS, NSQ)).astype(np.float32)
lhi = lmatf.astype(ml_dtypes.bfloat16)
llo = (lmatf - lhi.astype(np.float32)).astype(ml_dtypes.bfloat16)
lcat = jnp.asarray(np.concatenate([lhi, llo], axis=0))  # (256, NSQ)

def sync_time(fn, *args, iters=6):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s))
    ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(jnp.sum(fn(*args))); ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]-0.030

def kernel(idx_ref, w_ref, lcat_ref, out_ref):
    idx = idx_ref[:]; wall = w_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, BM), 0)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (NSQ, BM), 0)
    pk = idx[2:3, :]; nk = jnp.minimum(pk+1, N-1)
    maskp = jnp.where((t_iota >= pk*N) & (t_iota < pk*N + N), 1.0, 0.0)
    maskn = jnp.where((t_iota >= nk*N) & (t_iota < nk*N + N), 1.0, 0.0)
    lcat = lcat_ref[:]
    ws = []
    rvs = []
    sums = []
    for ps in range(2):
        wts = wall[6*ps:6*ps+6, :]
        def tap(axis):
            p = idx[axis:axis+1, :]; nx = jnp.minimum(p+1, N-1)
            wp = wts[2*axis:2*axis+1, :]; wn = wts[2*axis+1:2*axis+2, :]
            return jnp.where(iota == p, wp, 0.) + jnp.where(iota == nx, wn, 0.)
        rvs.append(tap(0))
        gv16 = tap(1).astype(jnp.bfloat16)
        a = pltpu.repeat(gv16, N, axis=0)
        b32 = maskp * wts[4:5, :] + maskn * wts[5:6, :]
        ws.append(a * b32.astype(jnp.bfloat16))
        sums.append((wts[2:3, :] + wts[3:4, :]) * (wts[4:5, :] + wts[5:6, :]))
    acc = [None]*3
    for ps in range(2):
        T2 = jnp.dot(lcat, ws[ps], preferred_element_type=jnp.float32)
        t = T2[:ROWS, :] + T2[ROWS:, :]
        meas = t[3*N:3*N+1, :]
        scale = jnp.where(meas > 1e-12, sums[ps] / meas, 0.0)
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            contrib = jnp.sum(seg * rvs[ps], axis=0) * scale[0, :]
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    for c in range(3):
        out_ref[c, :] = acc[c]

def call(idx3, w12, lcat):
    return pl.pallas_call(kernel, grid=(P // BM,),
        in_specs=[pl.BlockSpec((3, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((12, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((2*ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32),
    )(idx3, w12, lcat)

try:
    f = jax.jit(call)
    dt = sync_time(f, idx3, w12, lcat)
    print(f"one-dot tetra 4K: {dt*1e3:.0f} ms = {1/dt:.1f} fps")
except Exception as e:
    print("FAIL:", str(e)[-250:])
