"""Round-3: phase-decomposed 420 pipeline vs production at 8K 10-bit.

The fused pipeline's ~17 ms/frame of pre/post glue at 8K is dominated by
full-res relayouts (chroma 2x2 nearest upsample = lane+sublane interleave
repeat; downsample strided adds are cheap but operate on full-res inputs
that exist only because of the upsample). Idea: express the whole 420
pipeline in HALF-RES PHASE SPACE.

  y (H, W)  ->  4 phase planes y[pr::2, pc::2]  (strided reads, cheap)
  chroma    ->  stays (Hc, Wc); each phase pairs ELEMENTWISE with the
                same chroma sample == exactly "nearest" upsampling
  LUT       ->  order-agnostic over pixels; phases flow through unchanged
  downsample->  2x2 box == mean over the 4 output-chroma phases (free)
  y out     ->  ONE interleave (4, Hc, Wc) -> (H, W), on the quantized
                u16 plane (half the bytes of f32). Two routes measured:
                A) transpose+reshape  B) zeros.at[pr::2, pc::2].set

Measures production render_yuv_frame vs the phase variant with the bench
methodology (lax.scan chain x8, batch 2) at 8K 10-bit dither=none, plus
parity (must be bit-exact: same per-pixel arithmetic, same add grouping
in the box downsample).
"""
import functools
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
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


def phase_render(y, u, v, cfg, interleave="set"):
    """420-nearest phase-space twin of render_yuv_frame (dither none)."""
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    yf, uf, vf = P.range_normalize(
        yf, uf, vf, cfg.in_depth, cfg.in_full_range, cfg.work_full_range)
    if cfg.requantize_intermediate and cfg.in_full_range != cfg.work_full_range:
        maxv = float((1 << cfg.in_depth) - 1)
        yf = jnp.clip(jnp.floor(yf + 0.5), 0, maxv)
        uf = jnp.clip(jnp.floor(uf + 0.5), 0, maxv)
        vf = jnp.clip(jnp.floor(vf + 0.5), 0, maxv)

    # phases: (..., 4, Hc, Wc), order (pr, pc) = 00, 01, 10, 11
    yp = jnp.stack([yf[..., 0::2, 0::2], yf[..., 0::2, 1::2],
                    yf[..., 1::2, 0::2], yf[..., 1::2, 1::2]], axis=-3)
    ub = uf[..., None, :, :]
    vb = vf[..., None, :, :]

    r, g, b = P.yuv_planes_to_rgb(
        yp, ub, vb, cfg.matrix_in, cfg.in_depth, cfg.work_full_range)
    # broadcast happened inside the matrix; ensure concrete (4, Hc, Wc)
    r, g, b = (jnp.broadcast_to(t, yp.shape) for t in (r, g, b))
    r, g, b = apply_lut_planes(r, g, b, prep, cfg.interp,
                               precision=cfg.lut_precision, operands=ops)
    yo, uo, vo = P.rgb_to_yuv_planes_tpu(
        r, g, b, cfg.matrix_out, cfg.out_depth, cfg.out_full_range)

    # box downsample == phase mean, grouping mirrored to production
    # ((c00+c01) + (c10+c11)) * 0.25
    uo_h = ((uo[..., 0, :, :] + uo[..., 1, :, :])
            + (uo[..., 2, :, :] + uo[..., 3, :, :])) * 0.25
    vo_h = ((vo[..., 0, :, :] + vo[..., 1, :, :])
            + (vo[..., 2, :, :] + vo[..., 3, :, :])) * 0.25

    yq = P.quantize_plane(yo, cfg.out_depth, "none")
    uq = P.quantize_plane(uo_h, cfg.out_depth, "none")
    vq = P.quantize_plane(vo_h, cfg.out_depth, "none")

    hc, wc = yq.shape[-2], yq.shape[-1]
    if interleave == "set":
        out = jnp.zeros(yq.shape[:-3] + (2 * hc, 2 * wc), yq.dtype)
        out = out.at[..., 0::2, 0::2].set(yq[..., 0, :, :])
        out = out.at[..., 0::2, 1::2].set(yq[..., 1, :, :])
        out = out.at[..., 1::2, 0::2].set(yq[..., 2, :, :])
        out = out.at[..., 1::2, 1::2].set(yq[..., 3, :, :])
    else:  # transpose+reshape
        t = yq.reshape(yq.shape[:-3] + (2, 2, hc, wc))
        t = jnp.moveaxis(t, (-4, -3), (-3, -1))  # (..., hc, 2, wc, 2)
        out = t.reshape(yq.shape[:-3] + (2 * hc, 2 * wc))
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


cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral",
                   dither="none", lut_strategy="mxu",
                   phase_layout="plain")  # baseline arm stays the plain path

for (H, W, B, tag) in ((4320, 7680, 2, "8K"), (2160, 3840, 4, "4K")):
    hi = 1023
    y = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (B, H, W)).astype(np.uint16))
    u = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (B, H // 2, W // 2)).astype(np.uint16))
    v = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (B, H // 2, W // 2)).astype(np.uint16))
    K = 8
    nfr = K * B

    t = sync_time(scan_chain(
        lambda y, u, v: render_yuv_frame(y, u, v, prep, cfg,
                                         lut_operands=ops), K), y, u, v)
    print(f"{tag} production       : {t/nfr*1e3:7.2f} ms/frame", flush=True)

    for route in ("set", "reshape"):
        try:
            t = sync_time(scan_chain(functools.partial(
                phase_render, cfg=cfg, interleave=route), K), y, u, v)
            print(f"{tag} phase/{route:<8} : {t/nfr*1e3:7.2f} ms/frame",
                  flush=True)
        except Exception as e:
            print(f"{tag} phase/{route}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # parity (single frame, bit-exact expected)
    ref = render_yuv_frame(y[0], u[0], v[0], prep, cfg, lut_operands=ops)
    got = phase_render(y[0], u[0], v[0], cfg)
    for name, a, b in zip("yuv", ref, got):
        d = int(jnp.max(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))))
        print(f"{tag} parity {name}: max|d| = {d}", flush=True)
