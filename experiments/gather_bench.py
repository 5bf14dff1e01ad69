"""Measure 3D-LUT gather/interp strategies on the real TPU.

Strategies:
  A. XLA fancy-index gather of 8 corners + trilinear weights (f32)
  B. flat jnp.take of packed-brick rows (cell -> 8 corners pre-packed, 24 f32/row)
  C. one-hot factorized matmul (bf16 weights x f32->bf16-split LUT)
  D. XLA fancy-index tetrahedral (4 corners via where-select)
"""
import time, functools
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices())

N = 33
P = 1920 * 1080  # pixels per "frame" for timing; scale results to 4K
rng = np.random.default_rng(0)
lut = rng.uniform(0, 1, (N, N, N, 3)).astype(np.float32)
rgb = rng.uniform(0, 1, (P, 3)).astype(np.float32)

lut_j = jnp.asarray(lut)
rgb_j = jnp.asarray(rgb)

def timeit(fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, out

# ---------- A: trilinear via fancy-index gather ----------
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

dt, outA = timeit(trilinear_gather, rgb_j, lut_j)
print(f"A fancy-gather trilinear: {dt*1e3:.2f} ms -> {P/dt/1e6:.1f} Mpix/s")

# ---------- B: bricked row gather ----------
C = N - 1  # cells per axis
brick = np.zeros((C*C*C, 24), np.float32)
cells = lut  # (N,N,N,3)
idx = 0
b8 = np.stack([
    lut[:-1, :-1, :-1], lut[:-1, :-1, 1:], lut[:-1, 1:, :-1], lut[:-1, 1:, 1:],
    lut[1:, :-1, :-1], lut[1:, :-1, 1:], lut[1:, 1:, :-1], lut[1:, 1:, 1:],
], axis=3)  # (C,C,C,8,3)
brick = b8.reshape(C*C*C, 24)
brick_j = jnp.asarray(brick)

@jax.jit
def trilinear_brick(rgb, brick):
    scaled = jnp.clip(rgb, 0, 1) * (N - 1)
    prev = jnp.minimum(jnp.floor(scaled).astype(jnp.int32), C - 1)
    d = scaled - prev
    cell = (prev[:, 0] * C + prev[:, 1]) * C + prev[:, 2]
    rows = jnp.take(brick, cell, axis=0)  # (P, 24)
    co = rows.reshape(-1, 8, 3)
    dr, dg, db = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    w = jnp.stack([
        (1-dr)*(1-dg)*(1-db), (1-dr)*(1-dg)*db, (1-dr)*dg*(1-db), (1-dr)*dg*db,
        dr*(1-dg)*(1-db), dr*(1-dg)*db, dr*dg*(1-db), dr*dg*db,
    ], axis=1)  # (P, 8, 1)
    return jnp.sum(co * w, axis=1)

dt, outB = timeit(trilinear_brick, rgb_j, brick_j)
print(f"B brick-row gather trilinear: {dt*1e3:.2f} ms -> {P/dt/1e6:.1f} Mpix/s   maxerr={float(jnp.max(jnp.abs(outA-outB))):.2e}")

# ---------- C: factorized one-hot matmul (bf16) ----------
lut_flat = jnp.asarray(lut.reshape(N, N*N*3))  # contract over r first

@jax.jit
def trilinear_onehot(rgb, lutf):
    scaled = jnp.clip(rgb, 0, 1) * (N - 1)
    prev = jnp.floor(scaled).astype(jnp.int32)
    d = (scaled - prev)
    iota = jnp.arange(N, dtype=jnp.int32)[None, :]
    def axis_w(i, frac):
        p = prev[:, i:i+1]
        return ((iota == p) * (1 - d[:, i:i+1]) + (iota == jnp.minimum(p+1, N-1)) * d[:, i:i+1])
    wr = axis_w(0, None).astype(jnp.bfloat16)   # (P, N)
    wg = axis_w(1, None)                         # (P, N) f32
    wb = axis_w(2, None)
    t1 = jnp.dot(wr, lutf.astype(jnp.bfloat16), preferred_element_type=jnp.float32)  # (P, N*N*3)
    t1 = t1.reshape(-1, N, N*3)
    t2 = jnp.einsum("pjx,pj->px", t1, wg)  # (P, N*3)
    t2 = t2.reshape(-1, N, 3)
    t3 = jnp.einsum("pkc,pk->pc", t2, wb)
    return t3

dt, outC = timeit(trilinear_onehot, rgb_j, lut_flat)
print(f"C one-hot matmul trilinear: {dt*1e3:.2f} ms -> {P/dt/1e6:.1f} Mpix/s   maxerr={float(jnp.max(jnp.abs(outA-outC))):.2e}")

# ---------- D: tetrahedral fancy gather ----------
@jax.jit
def tetra_gather(rgb, lut):
    scaled = jnp.clip(rgb, 0, 1) * (N - 1)
    prev = jnp.floor(scaled).astype(jnp.int32)
    nxt = jnp.minimum(prev + 1, N - 1)
    d = scaled - prev
    dr, dg, db = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    r0, g0, b0 = prev[:, 0], prev[:, 1], prev[:, 2]
    r1, g1, b1 = nxt[:, 0], nxt[:, 1], nxt[:, 2]
    c000 = lut[r0, g0, b0]; c111 = lut[r1, g1, b1]
    c001 = lut[r0, g0, b1]; c010 = lut[r0, g1, b0]
    c011 = lut[r0, g1, b1]; c100 = lut[r1, g0, b0]
    c101 = lut[r1, g0, b1]; c110 = lut[r1, g1, b0]
    rg = dr > dg; gb = dg > db; rb = dr > db; bg = db > dg; br = db > dr
    m1 = rg & gb; m2 = rg & ~gb & rb; m3 = rg & ~gb & ~rb
    m4 = ~rg & bg; m5 = ~rg & ~bg & br
    out = jnp.where(m1, (1-dr)*c000 + (dr-dg)*c100 + (dg-db)*c110 + db*c111,
          jnp.where(m2, (1-dr)*c000 + (dr-db)*c100 + (db-dg)*c101 + dg*c111,
          jnp.where(m3, (1-db)*c000 + (db-dr)*c001 + (dr-dg)*c101 + dg*c111,
          jnp.where(m4, (1-db)*c000 + (db-dg)*c001 + (dg-dr)*c011 + dr*c111,
          jnp.where(m5, (1-dg)*c000 + (dg-db)*c010 + (db-dr)*c011 + dr*c111,
                        (1-dg)*c000 + (dg-dr)*c010 + (dr-db)*c110 + db*c111)))))
    return out

dt, outD = timeit(tetra_gather, rgb_j, lut_j)
print(f"D fancy-gather tetrahedral: {dt*1e3:.2f} ms -> {P/dt/1e6:.1f} Mpix/s")
