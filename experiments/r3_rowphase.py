"""Round-3: ROW-phase 420 pipeline vs production at 8K/4K.

r3_phase_prims showed lane-strided phase ops are catastrophic (stack4
extract 590 ms) but ROW-strided ops are modest (stack2 9.6 ms @8K B=2),
so the 4-phase design is dead and this is the survivor: split y into TWO
half-height row phases, pair both elementwise with lane-dupped chroma
(== exact nearest 420 upsample), box-downsample output chroma as
lane-adds-per-phase + phase add (bit-identical grouping to production's
lane-first strided adds), and interleave only the final quantized y.

Interleave routes measured: "reshape" (stack axis=-2 + reshape),
"set" (zeros.at[0::2].set), "pallas" (per-sublane-store kernel).

Parity must be BIT-exact vs render_yuv_frame (same arithmetic, same
grouping) for dither="none".
"""
import functools
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops import pixel as P
from lut_renderer_tpu.ops.lut3d import apply_lut_planes, kernel_operands
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))


def _ilv_kernel(e_ref, o_ref, out_ref):
    for s in range(8):
        out_ref[2 * s, :] = e_ref[s, :]
        out_ref[2 * s + 1, :] = o_ref[s, :]


def row_interleave_pallas(e, o, bm=3840):
    shp = e.shape
    hc, w = shp[-2], shp[-1]
    ef = e.reshape(-1, w)
    of = o.reshape(-1, w)
    rows = ef.shape[0]
    grid = (rows // 8, w // bm)
    out = pl.pallas_call(
        _ilv_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((8, bm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((16, bm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * rows, w), e.dtype),
    )(ef, of)
    return out.reshape(shp[:-2] + (2 * hc, w))


def rowphase_render(y, u, v, cfg, interleave="reshape"):
    """Row-phase twin of render_yuv_frame for 420->420 nearest, dither none."""
    # 1. row-phase split on the raw integer plane (sublane-strided: cheap)
    yp = jnp.stack([y[..., 0::2, :], y[..., 1::2, :]], axis=-3)  # (..,2,Hc,W)
    # 2. chroma lane-dup on the raw integer plane == horizontal nearest
    ud = jnp.repeat(u, 2, axis=-1)[..., None, :, :]              # (..,1,Hc,W)
    vd = jnp.repeat(v, 2, axis=-1)[..., None, :, :]

    yf = yp.astype(jnp.float32)
    uf = ud.astype(jnp.float32)
    vf = vd.astype(jnp.float32)
    yf, uf, vf = P.range_normalize(
        yf, uf, vf, cfg.in_depth, cfg.in_full_range, cfg.work_full_range)
    if cfg.requantize_intermediate and cfg.in_full_range != cfg.work_full_range:
        maxv = float((1 << cfg.in_depth) - 1)
        yf = jnp.clip(jnp.floor(yf + 0.5), 0, maxv)
        uf = jnp.clip(jnp.floor(uf + 0.5), 0, maxv)
        vf = jnp.clip(jnp.floor(vf + 0.5), 0, maxv)

    r, g, b = P.yuv_planes_to_rgb(
        yf, uf, vf, cfg.matrix_in, cfg.in_depth, cfg.work_full_range)
    shp = yf.shape
    r, g, b = (jnp.broadcast_to(t, shp) for t in (r, g, b))
    r, g, b = apply_lut_planes(r, g, b, prep, cfg.interp,
                               precision=cfg.lut_precision, operands=ops)
    yo, uo, vo = P.rgb_to_yuv_planes_tpu(
        r, g, b, cfg.matrix_out, cfg.out_depth, cfg.out_full_range)

    # downsample: lane adds per phase FIRST (production order), then phases
    def down(c):
        a = c[..., :, 0::2] + c[..., :, 1::2]          # (..,2,Hc,Wc)
        return (a[..., 0, :, :] + a[..., 1, :, :]) * 0.25

    uq = P.quantize_plane(down(uo), cfg.out_depth, "none")
    vq = P.quantize_plane(down(vo), cfg.out_depth, "none")
    yq = P.quantize_plane(yo, cfg.out_depth, "none")   # (..,2,Hc,W) int

    e, o = yq[..., 0, :, :], yq[..., 1, :, :]
    hc, w = e.shape[-2], e.shape[-1]
    if interleave == "reshape":
        out = jnp.stack([e, o], axis=-2).reshape(e.shape[:-2] + (2 * hc, w))
    elif interleave == "set":
        out = jnp.zeros(e.shape[:-2] + (2 * hc, w), e.dtype)
        out = out.at[..., 0::2, :].set(e).at[..., 1::2, :].set(o)
    else:
        out = row_interleave_pallas(e, o)
    return out, uq, vq


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s[0].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_chain(body, k=8):
    @jax.jit
    def f(y, u, v):
        def step(carry, _):
            return body(*carry), None
        (y, u, v), _ = jax.lax.scan(step, (y, u, v), None, length=k)
        return y, u, v
    return f


import os
ROUTES = tuple(os.environ.get("ROWPHASE_ROUTES", "reshape,pallas").split(","))
CONFIGS = {"8K10": (4320, 7680, 2, 10, "8K10"),
           "4K8": (2160, 3840, 4, 8, "4K8")}
SEL = os.environ.get("ROWPHASE_CFGS", "8K10,4K8").split(",")
RUN_PROD = os.environ.get("ROWPHASE_PROD", "1") == "1"

for (H, W, B, depth, tag) in (CONFIGS[s] for s in SEL):
    hi = (1 << depth) - 1
    dt = np.uint16 if depth > 8 else np.uint8
    cfg = RenderConfig(in_depth=depth, out_depth=depth, interp="tetrahedral",
                       dither="none", lut_strategy="mxu",
                       phase_layout="plain")  # baseline arm: the plain path
                       # (render_yuv_frame defaults to rowphase post-integration)
    y = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (B, H, W)).astype(dt))
    u = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (B, H // 2, W // 2)).astype(dt))
    v = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (B, H // 2, W // 2)).astype(dt))
    K = 8
    nfr = K * B

    if RUN_PROD:
        t = sync_time(scan_chain(
            lambda y, u, v: render_yuv_frame(y, u, v, prep, cfg,
                                             lut_operands=ops), K), y, u, v)
        print(f"{tag} production        : {t/nfr*1e3:7.2f} ms/frame",
              flush=True)

    for route in ROUTES:
        try:
            t = sync_time(scan_chain(functools.partial(
                rowphase_render, cfg=cfg, interleave=route), K), y, u, v)
            print(f"{tag} rowphase/{route:<8}: {t/nfr*1e3:7.2f} ms/frame",
                  flush=True)
        except Exception as e:
            print(f"{tag} rowphase/{route}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    ref = render_yuv_frame(y[0], u[0], v[0], prep, cfg, lut_operands=ops)
    got = rowphase_render(y[0], u[0], v[0], cfg)
    for name, a, b in zip("yuv", ref, got):
        d = int(jnp.max(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))))
        print(f"{tag} parity {name}: max|d| = {d}", flush=True)
