"""Planar-layout fused pipeline benchmark: (H,W) per channel, LUT as flat per-channel arrays."""
import time
import numpy as np
import jax, jax.numpy as jnp

N = 33
H, W = 2160, 3840
P = H * W
rng = np.random.default_rng(0)
lut = rng.uniform(0, 1, (N, N, N, 3)).astype(np.float32)
lutr = jnp.asarray(lut[..., 0].ravel()); lutg = jnp.asarray(lut[..., 1].ravel()); lutb = jnp.asarray(lut[..., 2].ravel())

def timeit(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# roofline copies
x = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
dt = timeit(jax.jit(lambda a: a * 1.0000001), x)
print(f"roofline f32 (H,W) copy: {dt*1e3:.3f} ms -> {2*P*4/dt/1e9:.0f} GB/s")
x8 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
dt = timeit(jax.jit(lambda a: a + jnp.uint8(1)), x8)
print(f"roofline u8 (H,W) copy: {dt*1e3:.3f} ms -> {2*P/dt/1e9:.0f} GB/s")

y8 = jnp.asarray(rng.integers(16, 236, (H, W), dtype=np.uint8))
u8 = jnp.asarray(rng.integers(16, 241, (H//2, W//2), dtype=np.uint8))
v8 = jnp.asarray(rng.integers(16, 241, (H//2, W//2), dtype=np.uint8))

def gather3(fi):
    return lutr[fi], lutg[fi], lutb[fi]

@jax.jit
def fused(y, u, v):
    yf = y.astype(jnp.float32)
    uf = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1).astype(jnp.float32)
    vf = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1).astype(jnp.float32)
    yn = (yf - 16.0) * (1.0/219.0)
    un = (uf - 128.0) * (1.0/224.0)
    vn = (vf - 128.0) * (1.0/224.0)
    kr, kb = 0.2126, 0.0722
    kg = 1 - kr - kb
    r = jnp.clip(yn + 2*(1-kr)*vn, 0, 1)
    b = jnp.clip(yn + 2*(1-kb)*un, 0, 1)
    g = jnp.clip(yn - (kr*2*(1-kr)/kg)*vn - (kb*2*(1-kb)/kg)*un, 0, 1)
    sr = r * (N-1); sg = g * (N-1); sb = b * (N-1)
    pr = jnp.floor(sr).astype(jnp.int32); pg = jnp.floor(sg).astype(jnp.int32); pb = jnp.floor(sb).astype(jnp.int32)
    nr = jnp.minimum(pr+1, N-1); ng = jnp.minimum(pg+1, N-1); nb = jnp.minimum(pb+1, N-1)
    dr = sr - pr; dg = sg - pg; db = sb - pb
    base_pp = (pr*N + pg)*N; base_pn = (pr*N + ng)*N; base_np = (nr*N + pg)*N; base_nn = (nr*N + ng)*N
    i000 = base_pp + pb; i001 = base_pp + nb; i010 = base_pn + pb; i011 = base_pn + nb
    i100 = base_np + pb; i101 = base_np + nb; i110 = base_nn + pb; i111 = base_nn + nb
    rg_ = dr > dg; gb_ = dg > db; rb_ = dr > db; bg_ = db > dg; br_ = db > dr
    m1 = rg_ & gb_; m2 = rg_ & ~gb_ & rb_; m3 = rg_ & ~gb_ & ~rb_
    m4 = ~rg_ & bg_; m5 = ~rg_ & ~bg_ & br_
    # tetrahedral: select the two middle corner indices + weights, then 4 gathers x 3 ch
    iA = jnp.where(m1 | m2, i100, jnp.where(m3 | m4, i001, i010))
    iB = jnp.where(m1, i110, jnp.where(m2 | m3, i101, jnp.where(m4 | m5, i011, i110)))
    w0 = jnp.where(m1 | m2, 1-dr, jnp.where(m3 | m4, 1-db, 1-dg))
    wA = jnp.where(m1, dr-dg, jnp.where(m2, dr-db, jnp.where(m3, db-dr, jnp.where(m4, db-dg, jnp.where(m5, dg-db, dg-dr)))))
    wB = jnp.where(m1, dg-db, jnp.where(m2, db-dg, jnp.where(m3, dr-dg, jnp.where(m4, dg-dr, jnp.where(m5, db-dr, dr-db)))))
    w1 = jnp.where(m1 | m6_else(m2, m3, m4, m5), db, db)  # placeholder
    w1 = jnp.where(m1, db, jnp.where(m2 | m3, dg, jnp.where(m4 | m5, dr, db)))
    o = []
    for lc in (lutr, lutg, lutb):
        o.append(w0*lc[i000] + wA*lc[iA] + wB*lc[iB] + w1*lc[i111])
    ro, go, bo = o
    yo = kr*ro + kg*go + kb*bo
    uo = (bo - yo) * (224.0/(2*(1-kb))) + 128.0
    vo = (ro - yo) * (224.0/(2*(1-kr))) + 128.0
    yq = jnp.clip(jnp.floor(yo*219.0 + 16.0 + 0.5), 0, 255).astype(jnp.uint8)
    uq = jnp.clip(jnp.floor(uo.reshape(H//2, 2, W//2, 2).mean(axis=(1,3)) + 0.5), 0, 255).astype(jnp.uint8)
    vq = jnp.clip(jnp.floor(vo.reshape(H//2, 2, W//2, 2).mean(axis=(1,3)) + 0.5), 0, 255).astype(jnp.uint8)
    return yq, uq, vq

def m6_else(*a):  # helper never used at trace time beyond placeholder
    return a[0]

dt = timeit(fused, y8, u8, v8)
print(f"4K FUSED planar tetra (4 gathers/ch): {dt*1e3:.2f} ms -> {P/dt/1e6:.0f} Mpix/s = {1/dt:.0f} fps(4K)")
