"""Variant: rgb planes in, ALL prep (coords/masks/weights) in-kernel.
Inputs blocked as (NB, BM) rows so per-pixel scalars are (1, BM) lane-major."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import ml_dtypes

N = 33; NSQ = N*N; ROWS = 128; P = 2160*3840; BM = 1024
NB = P // BM
rng = np.random.default_rng(0)
lmatf = np.zeros((ROWS, NSQ), np.float32)
lut = rng.uniform(0,1,(N,N,N,3)).astype(np.float32)
lmatf[:3*N] = lut.transpose(3,0,2,1).reshape(3*N, NSQ)  # b-major cols k*N+j
lmatf[3*N] = 1.0
lhi = jnp.asarray(lmatf.astype(ml_dtypes.bfloat16))
llo = jnp.asarray((lmatf - lhi.astype(np.float32)).astype(ml_dtypes.bfloat16))

r_np = rng.uniform(0,1,(P,)).astype(np.float32)
g_np = rng.uniform(0,1,(P,)).astype(np.float32)
b_np = rng.uniform(0,1,(P,)).astype(np.float32)

def sync_time(fn, *args, iters=6):
    s = fn(*args); jax.block_until_ready(s); float(jnp.sum(s))
    ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(jnp.sum(fn(*args))); ts.append(time.perf_counter()-t0)
    ts.sort()
    return ts[len(ts)//2] - 0.030

def kernel(r_ref, g_ref, b_ref, lhi_ref, llo_ref, out_ref):
    # refs: (8, BM) f32 rgb row-groups; loop rows so per-pixel scalars stay
    # (1, BM) lane-major (no relayout)
    lhi = lhi_ref[:]; llo = llo_ref[:]
    for row in range(8):
        _one_row(row, r_ref, g_ref, b_ref, lhi, llo, out_ref)

def _one_row(row, r_ref, g_ref, b_ref, lhi, llo, out_ref):
    def coords(x):
        s = jnp.clip(x, 0., 1.) * (N - 1)
        p = jnp.floor(s).astype(jnp.int32)
        d = s - p.astype(jnp.float32)
        return p, d
    pr, dr = coords(r_ref[row:row+1, :])   # (1, BM)
    pg, dg = coords(g_ref[row:row+1, :])
    pb, db = coords(b_ref[row:row+1, :])
    # tetra case masks (f32 selects)
    rg_ = dr > dg; gb_ = dg > db; rb_ = dr > db; bg_ = db > dg; br_ = db > dr
    m1 = rg_ & gb_; m2 = rg_ & ~gb_ & rb_; m3 = rg_ & ~gb_ & ~rb_
    m4 = ~rg_ & bg_; m5 = ~rg_ & ~bg_ & br_
    is_max_r = m1 | m2; is_max_g = m5 | (~rg_ & ~bg_ & ~br_); is_max_b = m3 | m4
    is_min_r = m4 | m5; is_min_g = m2 | m3; is_min_b = m1 | (~rg_ & ~bg_ & ~br_)
    dmax = jnp.where(is_max_r, dr, jnp.where(is_max_g, dg, db))
    dmin = jnp.where(is_min_r, dr, jnp.where(is_min_g, dg, db))
    dmid = dr + dg + db - dmax - dmin
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, BM), 0)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (NSQ, BM), 0)
    pk = pb; nk = jnp.minimum(pk+1, N-1)
    pkn = pk * N; nkn = nk * N
    bmask_p = (t_iota >= pkn) & (t_iota < pkn + N)
    bmask_n = (t_iota >= nkn) & (t_iota < nkn + N)

    acc = [None]*3
    for ps in range(2):
        if ps == 0:
            wrp = jnp.where(is_max_r, 1.0-dmax, 1.0); wrn = jnp.where(is_max_r, dmax-dmid, 0.0)
            wgp = jnp.where(is_max_g, 1.0-dmax, 1.0); wgn = jnp.where(is_max_g, dmax-dmid, 0.0)
            wbp = jnp.where(is_max_b, 1.0-dmax, 1.0); wbn = jnp.where(is_max_b, dmax-dmid, 0.0)
        else:
            wrp = jnp.where(is_min_r, dmid-dmin, 0.0); wrn = jnp.where(is_min_r, dmin, 1.0)
            wgp = jnp.where(is_min_g, dmid-dmin, 0.0); wgn = jnp.where(is_min_g, dmin, 1.0)
            wbp = jnp.where(is_min_b, dmid-dmin, 0.0); wbn = jnp.where(is_min_b, dmin, 1.0)
        def tap(p, wp, wn):
            nx = jnp.minimum(p+1, N-1)
            return jnp.where(iota == p, wp, 0.) + jnp.where(iota == nx, wn, 0.)
        rv = tap(pr, wrp, wrn)
        gv16 = tap(pg, wgp, wgn).astype(jnp.bfloat16)
        a = pltpu.repeat(gv16, N, axis=0)
        b32 = jnp.where(bmask_p, wbp, 0.) + jnp.where(bmask_n, wbn, 0.)
        w = a * b32.astype(jnp.bfloat16)
        t = (jnp.dot(lhi, w, preferred_element_type=jnp.float32)
             + jnp.dot(llo, w, preferred_element_type=jnp.float32))
        true_sum = (wgp + wgn) * (wbp + wbn)
        meas = t[3*N:3*N+1, :]
        scale = jnp.where(meas > 1e-12, true_sum / meas, 0.0)
        for c in range(3):
            seg = t[c*N:(c+1)*N, :]
            contrib = jnp.sum(seg * rv, axis=0) * scale[0, :]
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    for c in range(3):
        out_ref[row * 3 + c, :] = acc[c]

def call(r, g, b):
    r2 = r.reshape(NB, BM); g2 = g.reshape(NB, BM); b2 = b.reshape(NB, BM)
    grid = NB // 8
    row = pl.BlockSpec((8, BM), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(kernel, grid=(grid,),
        in_specs=[row, row, row,
                  pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, NSQ), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((24, BM), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24*grid, BM), jnp.float32),
    )(r2, g2, b2, lhi, llo)
    return out

f = jax.jit(call)
rj, gj, bj = jnp.asarray(r_np), jnp.asarray(g_np), jnp.asarray(b_np)
try:
    dt = sync_time(f, rj, gj, bj)
    print(f"fused-prep tetra 4K: {dt*1e3:.0f} ms = {1/dt:.1f} fps")
    # correctness vs current production path
    from lut_renderer_tpu.colorcore import Lut3D, apply_lut
    out = np.asarray(f(rj, gj, bj))
    # out rows: block i occupies rows [8i, 8i+8): channel c at row 8i+c
    grid = NB // 8
    got_r = out.reshape(grid, 8, 3, BM)[:, :, 0, :].reshape(-1)
    ref = apply_lut(np.stack([r_np, g_np, b_np], -1), lut, "tetrahedral")
    print("maxerr vs reference:", abs(got_r - ref[:, 0]).max())
except Exception as e:
    print("FAIL:", str(e)[-300:])
