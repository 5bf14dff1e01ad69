"""Validate gather speed vs roofline; test the full fused YUV420->LUT->YUV420 pipeline."""
import time
import numpy as np
import jax, jax.numpy as jnp

N = 33
H, W = 2160, 3840  # 4K
P = H * W
rng = np.random.default_rng(0)
lut_j = jnp.asarray(rng.uniform(0, 1, (N, N, N, 3)).astype(np.float32))

def timeit(fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# roofline: pure copy of f32 (P,3)
rgb_j = jnp.asarray(rng.uniform(0, 1, (P, 3)).astype(np.float32))
copy = jax.jit(lambda x: x * 1.0000001)
dt = timeit(copy, rgb_j)
print(f"roofline f32 copy (read+write {2*P*12/1e6:.0f} MB): {dt*1e3:.2f} ms -> {2*P*12/dt/1e9:.0f} GB/s")

# trilinear fancy gather on 4K f32
@jax.jit
def trilinear_gather(rgb, lut):
    scaled = jnp.clip(rgb, 0, 1) * (N - 1)
    prev = jnp.floor(scaled).astype(jnp.int32)
    nxt = jnp.minimum(prev + 1, N - 1)
    d = scaled - prev
    dr, dg, db = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    r0, g0, b0 = prev[:, 0], prev[:, 1], prev[:, 2]
    r1, g1, b1 = nxt[:, 0], nxt[:, 1], nxt[:, 2]
    c000 = lut[r0, g0, b0]; c001 = lut[r0, g0, b1]
    c010 = lut[r0, g1, b0]; c011 = lut[r0, g1, b1]
    c100 = lut[r1, g0, b0]; c101 = lut[r1, g0, b1]
    c110 = lut[r1, g1, b0]; c111 = lut[r1, g1, b1]
    c00 = c000*(1-db) + c001*db; c01 = c010*(1-db) + c011*db
    c10 = c100*(1-db) + c101*db; c11 = c110*(1-db) + c111*db
    c0 = c00*(1-dg) + c01*dg; c1 = c10*(1-dg) + c11*dg
    return c0*(1-dr) + c1*dr

dt = timeit(trilinear_gather, rgb_j, lut_j)
print(f"4K trilinear fancy-gather: {dt*1e3:.2f} ms -> {P/dt/1e6:.0f} Mpix/s = {1/dt:.0f} fps(4K)")

# FULL fused pipeline: uint8 YUV420 planar -> RGB -> tetra LUT -> YUV420 uint8
y8 = jnp.asarray(rng.integers(16, 236, (H, W), dtype=np.uint8))
u8 = jnp.asarray(rng.integers(16, 241, (H//2, W//2), dtype=np.uint8))
v8 = jnp.asarray(rng.integers(16, 241, (H//2, W//2), dtype=np.uint8))

@jax.jit
def fused(y, u, v, lut):
    yf = y.astype(jnp.float32)
    # nearest chroma upsample
    uf = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1).astype(jnp.float32)
    vf = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1).astype(jnp.float32)
    yn = (yf - 16.0) / 219.0
    un = (uf - 128.0) / 224.0
    vn = (vf - 128.0) / 224.0
    kr, kb = 0.2126, 0.0722
    kg = 1 - kr - kb
    r = jnp.clip(yn + 2*(1-kr)*vn, 0, 1)
    b = jnp.clip(yn + 2*(1-kb)*un, 0, 1)
    g = jnp.clip(yn - (kr*2*(1-kr)/kg)*vn - (kb*2*(1-kb)/kg)*un, 0, 1)
    scaled_r = r * (N-1); scaled_g = g * (N-1); scaled_b = b * (N-1)
    pr = jnp.floor(scaled_r).astype(jnp.int32); pg = jnp.floor(scaled_g).astype(jnp.int32); pb = jnp.floor(scaled_b).astype(jnp.int32)
    nr = jnp.minimum(pr+1, N-1); ng = jnp.minimum(pg+1, N-1); nb = jnp.minimum(pb+1, N-1)
    dr = scaled_r - pr; dg = scaled_g - pg; db = scaled_b - pb
    c000 = lut[pr, pg, pb]; c111 = lut[nr, ng, nb]
    c001 = lut[pr, pg, nb]; c010 = lut[pr, ng, pb]
    c011 = lut[pr, ng, nb]; c100 = lut[nr, pg, pb]
    c101 = lut[nr, pg, nb]; c110 = lut[nr, ng, pb]
    rg_ = dr > dg; gb_ = dg > db; rb_ = dr > db; bg_ = db > dg; br_ = db > dr
    dr3 = dr[..., None]; dg3 = dg[..., None]; db3 = db[..., None]
    m1 = (rg_ & gb_)[..., None]; m2 = (rg_ & ~gb_ & rb_)[..., None]; m3 = (rg_ & ~gb_ & ~rb_)[..., None]
    m4 = (~rg_ & bg_)[..., None]; m5 = (~rg_ & ~bg_ & br_)[..., None]
    out = jnp.where(m1, (1-dr3)*c000 + (dr3-dg3)*c100 + (dg3-db3)*c110 + db3*c111,
          jnp.where(m2, (1-dr3)*c000 + (dr3-db3)*c100 + (db3-dg3)*c101 + dg3*c111,
          jnp.where(m3, (1-db3)*c000 + (db3-dr3)*c001 + (dr3-dg3)*c101 + dg3*c111,
          jnp.where(m4, (1-db3)*c000 + (db3-dg3)*c001 + (dg3-dr3)*c011 + dr3*c111,
          jnp.where(m5, (1-dg3)*c000 + (dg3-db3)*c010 + (db3-dr3)*c011 + dr3*c111,
                        (1-dg3)*c000 + (dg3-dr3)*c010 + (dr3-db3)*c110 + db3*c111)))))
    ro, go, bo = out[..., 0], out[..., 1], out[..., 2]
    yo = kr*ro + kg*go + kb*bo
    uo = (bo - yo) / (2*(1-kb)) * 224.0 + 128.0
    vo = (ro - yo) / (2*(1-kr)) * 224.0 + 128.0
    yq = jnp.clip(jnp.floor(yo*219.0 + 16.0 + 0.5), 0, 255).astype(jnp.uint8)
    # chroma subsample: average 2x2
    uq = jnp.clip(jnp.floor(uo.reshape(H//2, 2, W//2, 2).mean(axis=(1,3)) + 0.5), 0, 255).astype(jnp.uint8)
    vq = jnp.clip(jnp.floor(vo.reshape(H//2, 2, W//2, 2).mean(axis=(1,3)) + 0.5), 0, 255).astype(jnp.uint8)
    return yq, uq, vq

dt = timeit(fused, y8, u8, v8, lut_j)
print(f"4K FUSED yuv420->tetra LUT->yuv420: {dt*1e3:.2f} ms -> {P/dt/1e6:.0f} Mpix/s = {1/dt:.0f} fps(4K)")

# batch of 8 frames to amortize dispatch
yb = jnp.tile(y8[None], (8,1,1)); ub = jnp.tile(u8[None], (8,1,1)); vb = jnp.tile(v8[None], (8,1,1))
fusedb = jax.jit(jax.vmap(lambda y,u,v: fused(y,u,v,lut_j)))
dt = timeit(fusedb, yb, ub, vb, iters=10)
print(f"4K FUSED batch8: {dt*1e3:.2f} ms -> {8*P/dt/1e6:.0f} Mpix/s = {8/dt:.0f} fps(4K)")
