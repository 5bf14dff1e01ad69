"""Round-3: fused post-y Pallas kernel prototype at 8K.

The row-phase glue costs ~9.7 ms/frame standalone at 8K vs a <1 ms
traffic floor (r3_glue_standalone). Biggest chunk: the y output path
(matrix_out luma + quantize + row interleave). Prototype ONE Pallas pass:
  in : r,g,b (2,Hc,W) f32 blocks (2,8,bm)
  out: y (H,W) u16 block (16,bm) — interleaved per-sublane stores
vs the XLA route (matrix + quantize_plane + stack/reshape interleave).
Parity must be bit-exact vs the XLA route (same scalar ops).
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
from lut_renderer_tpu.colorcore import matrices as cm
from lut_renderer_tpu.ops import pixel as P

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
B, H, W = 2, 4320, 7680
Hc = H // 2
depth = 10
kr, kg, kb, crv, cbu = cm.yuv_rgb_coeffs("bt709")
y_off, y_scale, c_mid, c_scale = cm._range_params(depth, False)

r = jnp.asarray(rng.uniform(0, 1, (B, 2, Hc, W)).astype(np.float32))
g = jnp.asarray(rng.uniform(0, 1, (B, 2, Hc, W)).astype(np.float32))
b = jnp.asarray(rng.uniform(0, 1, (B, 2, Hc, W)).astype(np.float32))
maxv = float((1 << depth) - 1)


def xla_route(r, g, b):
    yn = kr * r + kg * g + kb * b
    yo = yn * y_scale + y_off
    yq = jnp.clip(jnp.floor(yo + 0.5), 0, maxv).astype(jnp.uint16)
    e, o = yq[..., 0, :, :], yq[..., 1, :, :]
    hc, w = e.shape[-2], e.shape[-1]
    return jnp.stack([e, o], axis=-2).reshape(yq.shape[:-3] + (2 * hc, w))


def _kernel(r_ref, g_ref, b_ref, out_ref):
    yn = kr * r_ref[0] + kg * g_ref[0] + kb * b_ref[0]   # (2, 8, bm)
    yo = yn * y_scale + y_off
    # Mosaic has no f32->u16 cast; go f32 -> i32 -> u16
    yq = (jnp.clip(jnp.floor(yo + 0.5), 0.0, maxv)
          .astype(jnp.int32).astype(jnp.uint16))
    for s in range(8):
        out_ref[0, 2 * s, :] = yq[0, s, :]
        out_ref[0, 2 * s + 1, :] = yq[1, s, :]


def pallas_route(r, g, b, bm=3840):
    shp = r.shape  # (..., 2, Hc, W)
    hc, w = shp[-2], shp[-1]
    rf = r.reshape(-1, 2, hc, w)
    gf = g.reshape(-1, 2, hc, w)
    bf = b.reshape(-1, 2, hc, w)
    nb = rf.shape[0]
    grid = (nb, hc // 8, w // bm)
    spec_in = pl.BlockSpec((1, 2, 8, bm), lambda n, i, j: (n, 0, i, j),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec_in] * 3,
        out_specs=pl.BlockSpec((1, 16, bm), lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 2 * hc, w), jnp.uint16),
    )(rf, gf, bf)
    return out.reshape(shp[:-3] + (2 * hc, w))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s.astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(body, k=4):
    # feed back: slice output to (2,Hc,W)-ish f32 to keep the chain honest
    @jax.jit
    def f(r, g, b):
        for _ in range(k):
            yfull = body(r, g, b)
            t = (yfull.astype(jnp.float32) * (1.0 / maxv)
                 ).reshape(B, Hc, 2, W)
            d = jnp.moveaxis(t, -2, -3)  # (B,2,Hc,W) — same extract cost both
            r = d
        return r
    return f


# parity first (cheap shapes)
rs, gs, bs = (t[:1, :, :64, :256] for t in (r, g, b))
got = np.asarray(pallas_route(rs, gs, bs, bm=256))
want = np.asarray(xla_route(rs, gs, bs))
print("parity:", "OK" if np.array_equal(got, want) else "MISMATCH",
      np.abs(got.astype(int) - want.astype(int)).max(), flush=True)

for bm in (3840, 1920, 7680):
    try:
        t = sync_time(chain(functools.partial(pallas_route, bm=bm)), r, g, b)
        print(f"pallas post-y bm={bm:<5}: {t/4/B*1e3:8.3f} ms/frame",
              flush=True)
    except Exception as e:
        print(f"pallas bm={bm}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)

t = sync_time(chain(xla_route), r, g, b)
print(f"xla route          : {t/4/B*1e3:8.3f} ms/frame", flush=True)
