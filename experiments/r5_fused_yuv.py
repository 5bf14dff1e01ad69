"""Prototype: FULLY-FUSED YUV->YUV kernel (pre/post glue inside the Pallas
LUT kernel) vs the production rowphase path.

Motivation: 4K fused rowphase = 19.95 ms/frame vs ~16.06 kernel-only chain
-> ~3.9 ms/frame of XLA glue (converts, chroma dup, matrix, downsample,
quantize, y interleave). Negative #7 only moved glue into its OWN kernel
(same HBM pass structure); this folds it into the LUT kernel itself:

  * y read at FULL RES by the kernel; the row-phase split happens in-kernel
    via sublane-strided reads (cheap per r3_phase_prims).
  * chroma pre-dupped in XLA on the UINT8 plane (v1; candidate to move
    in-kernel later) and read at (R, W).
  * per phase-row: u8->f32 convert, matrix, clip, the unchanged int8_lite
    quad body at bm=W, rgb->yuv, quantize(+dither) — all in-VMEM.
  * QUANTIZED INTERLEAVED y written directly at its absolute row (kills the
    XLA stack+reshape interleave AND the (8,P) f32 kernel output round trip).
  * chroma written as 4 full-width f32 phase planes; XLA finishes the lane
    pair-adds + quantize (lane-STRIDED reads are Mosaic poison but XLA runs
    them at noise level).

Scope v1: 420 8-bit tv->tv, bt709 both ways, N=33 int8_lite, tetrahedral,
dither none. Parity target: BIT-exact vs the production rowphase path.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.colorcore import matrices as cm
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.lut3d import (
    kernel_operands, _scaled_coords, _passes_for_interp, _int8_quad_body)
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame
from lut_renderer_tpu.ops.pixel import quantize_plane

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(11)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
N = prep.size
assert prep.resolve_precision("tetrahedral", "auto") == "int8_lite"
ops_np = kernel_operands(prep, "tetrahedral", "int8_lite")
ops = jax.device_put(ops_np)
DMIN = tuple(float(v) for v in prep.domain_min)
DMAX = tuple(float(v) for v in prep.domain_max)
WIDTHS = prep.quad_widths
INTERP = "tetrahedral"
N_PASSES = 2
R = 8  # phase rows per block (y block = 2R = 16 rows -> u16 tile aligned)


def fused_yuv_kernel(in_depth, out_depth,
                     y_ref, ud_ref, vd_ref, lq_ref, sv_ref,
                     yq_ref, u0_ref, u1_ref, v0_ref, v1_ref):
    W = y_ref.shape[-1]
    maxv = float((1 << out_depth) - 1)
    uf = ud_ref[0, 0, 0, :].reshape(1, W).astype(jnp.int32).astype(jnp.float32)
    vf = vd_ref[0, 0, 0, :].reshape(1, W).astype(jnp.int32).astype(jnp.float32)
    for p in range(2):
        yrow = (y_ref[0, 0, p, :].reshape(1, W)
                .astype(jnp.int32).astype(jnp.float32))
        rr, gg, bb = cm.yuv_to_rgb_planes(
            yrow, uf, vf, "bt709", in_depth, False, xp=jnp)
        pr, nr, dr = _scaled_coords(rr, N, DMIN[0], DMAX[0])
        pg, ng, dg = _scaled_coords(gg, N, DMIN[1], DMAX[1])
        pb, nb, db = _scaled_coords(bb, N, DMIN[2], DMAX[2])
        idx = jnp.concatenate([pr, pg, pb], axis=0)
        passes = _passes_for_interp(INTERP, pr, nr, dr, pg, ng, dg,
                                    pb, nb, db, N)
        wall = jnp.concatenate([w.reshape(6, W) for w in passes], axis=0)
        acc = _int8_quad_body(N, N_PASSES, WIDTHS, idx, wall,
                              lq_ref, sv_ref, pair=False)
        yo, uo, vo = cm.rgb_to_yuv_planes(
            acc[0], acc[1], acc[2], "bt709", out_depth, False, xp=jnp)
        yq = jnp.clip(jnp.floor(yo + 0.5), 0, maxv)
        yq_ref[0, 0, p, :] = (
            yq.reshape(W).astype(jnp.int32).astype(jnp.uint16))
        up_ref = u0_ref if p == 0 else u1_ref
        vp_ref = v0_ref if p == 0 else v1_ref
        up_ref[0, 0, 0, :] = uo.reshape(W)
        vp_ref[0, 0, 0, :] = vo.reshape(W)


def make_proto(B, H, W, in_depth=8, out_depth=8):
    Hc, Wc = H // 2, W // 2
    l_rows = prep.rows_pad
    ktot = ops_np["lq"].shape[1]
    kern = functools.partial(fused_yuv_kernel, in_depth, out_depth)
    grid = (B, H // 2)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 2, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_rows, ktot), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_rows, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 2, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H // 2, 2, W), jnp.uint16),
            jax.ShapeDtypeStruct((B, Hc, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B, Hc, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B, Hc, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B, Hc, 1, W), jnp.float32),
        ],
    )

    def render(y, u, v, lq, sv):
        ud = jnp.repeat(u, 2, axis=-1).reshape(B, Hc, 1, W)
        vd = jnp.repeat(v, 2, axis=-1).reshape(B, Hc, 1, W)
        y4 = y.reshape(B, H // 2, 2, W)
        yq16, u0, u1, v0, v1 = call(y4, ud, vd, lq, sv)
        yq16 = yq16.reshape(B, H, W)
        u0, u1 = u0.reshape(B, Hc, W), u1.reshape(B, Hc, W)
        v0, v1 = v0.reshape(B, Hc, W), v1.reshape(B, Hc, W)
        y_out = yq16.astype(jnp.uint8) if out_depth <= 8 else yq16

        def down(c0, c1):
            a0 = c0[..., 0::2] + c0[..., 1::2]
            a1 = c1[..., 0::2] + c1[..., 1::2]
            return (a0 + a1) * 0.25

        uq = quantize_plane(down(u0, u1), out_depth, "none", plane_seed=2)
        vq = quantize_plane(down(v0, v1), out_depth, "none", plane_seed=3)
        return y_out, uq, vq

    return render


def sync_time(fn, *args, iters=7):
    s = fn(*args)
    float(jnp.sum(s[0].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run_shape(H, W, B, K):
    y = jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.uint8))

    cfg = RenderConfig(interp=INTERP)

    @jax.jit
    def prod_chain(y, u, v):
        def step(carry, _):
            return render_yuv_frame(*carry, prep, cfg, lut_operands=ops), None
        (y, u, v), _ = jax.lax.scan(step, (y, u, v), None, length=K)
        return y, u, v

    proto = make_proto(B, H, W)

    @jax.jit
    def proto_chain(y, u, v):
        def step(carry, _):
            return proto(*carry, ops["lq"], ops["sv"]), None
        (y, u, v), _ = jax.lax.scan(step, (y, u, v), None, length=K)
        return y, u, v

    # parity first (single step)
    @jax.jit
    def prod1(y, u, v):
        return render_yuv_frame(y, u, v, prep, cfg, lut_operands=ops)

    @jax.jit
    def proto1(y, u, v):
        return proto(y, u, v, ops["lq"], ops["sv"])

    a = prod1(y, u, v)
    b = proto1(y, u, v)
    for name, pa, pb in zip("yuv", a, b):
        d = np.abs(np.asarray(pa).astype(np.int32)
                   - np.asarray(pb).astype(np.int32))
        print(f"  {H}p parity {name}: max|d|={d.max()} frac>0={np.mean(d > 0):.2e}",
              flush=True)

    tp = sync_time(prod_chain, y, u, v)
    tf = sync_time(proto_chain, y, u, v)
    print(f"  {H}p production : {tp/(K*B)*1e3:7.3f} ms/frame ({K*B/tp:6.1f} fps)",
          flush=True)
    print(f"  {H}p fused-yuv  : {tf/(K*B)*1e3:7.3f} ms/frame ({K*B/tf:6.1f} fps)",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "4k"
    if which in ("4k", "all"):
        run_shape(2160, 3840, 8, 8)
    if which in ("8k", "all"):
        run_shape(4320, 7680, 2, 8)
