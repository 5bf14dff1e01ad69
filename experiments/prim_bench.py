"""Microbench: (1) Pallas take_along_axis throughput, (2) MXU int8/bf16/f32 matmul TOPS."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters

# ---- 1. lane-gather throughput: per (8,128) vreg table lookup
M = 4096  # rows of pixels
def g_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]
    out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

tab = jnp.asarray(np.random.default_rng(0).uniform(0,1,(M,128)).astype(np.float32))
idx = jnp.asarray(np.random.default_rng(1).integers(0,128,(M,128)), jnp.int32)
gather = jax.jit(lambda t,i: pl.pallas_call(
    g_kernel, out_shape=jax.ShapeDtypeStruct((M,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t,i))
dt = timeit(gather, tab, idx)
print(f"pallas lane take_along_axis: {dt*1e6:.1f} us for {M*128/1e6:.2f}M lookups -> {M*128/dt/1e9:.2f} G-lookups/s")

# sublane-axis gather: table (8, 128) per column... big rows along sublane:
def g_kernel2(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
idx2 = jnp.asarray(np.random.default_rng(1).integers(0,M,(M,128)), jnp.int32)
gather2 = jax.jit(lambda t,i: pl.pallas_call(
    g_kernel2, out_shape=jax.ShapeDtypeStruct((M,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t,i))
try:
    dt = timeit(gather2, tab, idx2)
    print(f"pallas sublane take_along_axis (full-column {M}-entry tables): {dt*1e6:.1f} us -> {M*128/dt/1e9:.2f} G-lookups/s")
except Exception as e:
    print("sublane big gather failed:", str(e)[:200])

# ---- 2. MXU throughput
for dtype, acc in [(jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32), (jnp.float32, jnp.float32)]:
    Mm, K, Nn = 4096, 1152, 256
    a = jnp.asarray(np.random.default_rng(0).integers(-100,100,(Mm,K)), dtype)
    b = jnp.asarray(np.random.default_rng(1).integers(-100,100,(K,Nn)), dtype)
    f = jax.jit(lambda x,y: jnp.dot(x, y, preferred_element_type=acc))
    dt = timeit(f, a, b, iters=50)
    print(f"XLA matmul {dtype.__name__} ({Mm}x{K}x{Nn}): {dt*1e6:.1f} us -> {2*Mm*K*Nn/dt/1e12:.1f} TOPS")

# int8 matmul inside pallas
def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
Mm, K, Nn = 4096, 1152, 256
a = jnp.asarray(np.random.default_rng(0).integers(-100,100,(Mm,K)), jnp.int8)
b = jnp.asarray(np.random.default_rng(1).integers(-100,100,(K,Nn)), jnp.int8)
f = jax.jit(lambda x,y: pl.pallas_call(
    mm_kernel, out_shape=jax.ShapeDtypeStruct((Mm,Nn), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x,y))
try:
    dt = timeit(f, a, b, iters=50)
    print(f"pallas int8 matmul: {dt*1e6:.1f} us -> {2*Mm*K*Nn/dt/1e12:.1f} TOPS")
except Exception as e:
    print("pallas int8 matmul failed:", str(e)[:300])
