import time
import numpy as np
import jax, jax.numpy as jnp

N = 33
P = 1920*1080
H, W = 1080, 1920
rng = np.random.default_rng(0)
lut3 = jnp.asarray(rng.uniform(0,1,(N,N,N,3)).astype(np.float32))
lutflat = jnp.asarray(rng.uniform(0,1,(N**3,)).astype(np.float32))
lutflat2d = jnp.asarray(rng.uniform(0,1,(N**3,3)).astype(np.float32))
lutpad = jnp.asarray(rng.uniform(0,1,(N**3,128)).astype(np.float32))
lutsub = jnp.asarray(rng.uniform(0,1,(N**3,8)).astype(np.float32))

idx = rng.integers(0, N, (P,3)).astype(np.int32)
ri = jnp.asarray(idx[:,0]); gi = jnp.asarray(idx[:,1]); bi = jnp.asarray(idx[:,2])
fi = jnp.asarray((idx[:,0]*N*N + idx[:,1]*N + idx[:,2]).astype(np.int32))
fi_hw = fi.reshape(H, W)

def timeit(name, fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.3f} ms ({P/dt/1e6:.0f} Midx/s)")
    return dt

timeit("a lut3[ri,gi,bi] -> (P,3)", jax.jit(lambda r,g,b: lut3[r,g,b]), ri, gi, bi)
timeit("b lutflat[fi] -> (P,)", jax.jit(lambda f: lutflat[f]), fi)
timeit("c lutflat2d[fi] -> (P,3)", jax.jit(lambda f: lutflat2d[f]), fi)
timeit("d lutpad[fi] -> (P,128)", jax.jit(lambda f: lutpad[f]), fi)
timeit("e lutsub[fi] -> (P,8)", jax.jit(lambda f: lutsub[f]), fi)
timeit("f lutflat[fi_hw] -> (H,W)", jax.jit(lambda f: lutflat[f]), fi_hw)
timeit("g take_along_axis-ish sum", jax.jit(lambda f: lutpad[f].sum(axis=1)), fi)
