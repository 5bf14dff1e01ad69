"""Round-4: the i32-select r-TAP build (r6_33_vpu_attack variant A),
integrated into _quad_pass_factors — compiled parity + speed for every
production tier, plus the fused YUV->YUV frame at 4K/8K."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D, max_delta_e76
from lut_renderer_tpu.ops import prepare_lut, RenderConfig
from lut_renderer_tpu.ops.render import render_yuv_frame
import lut_renderer_tpu.ops.lut3d as L

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def make_prep(size):
    lut = Lut3D.identity(size)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.02, 0.02, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


prep33 = make_prep(33)
prep65 = make_prep(65)

# compiled parity on 8192 px for each tier
P = 8192
rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
for prep, prec in ((prep33, "exact"), (prep33, "fast"),
                   (prep33, "int8_fast"), (prep33, "int8_lite"),
                   (prep65, "int8_lite"), (prep65, "coarse2f")):
    f = jax.jit(lambda r, g, b, prep=prep, prec=prec: L.apply_lut_planes(
        r, g, b, prep, "tetrahedral", precision=prec))
    ro, go, bo = f(jnp.asarray(rs), jnp.asarray(gs), jnp.asarray(bs))
    got = np.stack([np.asarray(ro)[0], np.asarray(go)[0],
                    np.asarray(bo)[0]], 1)
    want = np.stack([np.asarray(x)[0] for x in L.apply_lut_planes(
        rs, gs, bs, prep, "tetrahedral", strategy="gather")], 1)
    de = max_delta_e76(np.clip(got[None], 0, 1), np.clip(want[None], 0, 1))
    sim = prep.mode_error("tetrahedral", prec)
    print(f"parity {prep.size}^3 {prec:10s}: measured {float(de):.4f} "
          f"(sim {sim:.4f})", flush=True)
    assert de < 0.4, (prep.size, prec, de)

H, W = 2160, 3840
rj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
gj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
bj = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def sync_time(fn, *args, iters=5):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def bench(label, prep, interp, precision):
    def make(k):
        @jax.jit
        def f(r, g, b):
            for _ in range(k):
                r, g, b = L.apply_lut_planes(r, g, b, prep, interp,
                                             precision=precision)
            return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
        return f
    t1 = sync_time(make(1), rj, gj, bj)
    t5 = sync_time(make(5), rj, gj, bj)
    per = (t5 - t1) / 4
    print(f"{label:44s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)


bench("33 int8_lite tetra (i32 taps)", prep33, "tetrahedral", "int8_lite")
bench("33 int8_lite trilinear (i32 taps)", prep33, "trilinear", "int8_lite")
bench("33 int8_fast tetra (i32 taps)", prep33, "tetrahedral", "int8_fast")
bench("33 fast tetra (i32 taps)", prep33, "tetrahedral", "fast")
bench("33 exact tetra (i32 taps)", prep33, "tetrahedral", "exact")
bench("65 int8_lite tetra (i32 taps)", prep65, "tetrahedral", "int8_lite")
bench("65 int8_lite trilinear (i32 taps)", prep65, "trilinear", "int8_lite")
bench("65 coarse2f tetra (i32 taps)", prep65, "tetrahedral", "coarse2f")


# fused YUV->YUV frame, headline methodology (chained scan inside one jit)
def fused_frame(prep, h, w, batch, depth, chain=8):
    hi = (1 << depth) - 1
    dt = np.uint16 if depth > 8 else np.uint8
    cfg = RenderConfig(in_depth=depth, out_depth=depth, interp="tetrahedral")
    y = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (batch, h, w)).astype(dt))
    u = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (batch, h // 2, w // 2)).astype(dt))
    v = jnp.asarray(rng.integers(hi // 16, hi - hi // 16,
                                 (batch, h // 2, w // 2)).astype(dt))

    @jax.jit
    def stepk(y, u, v):
        def body(carry, _):
            yy, uu, vv = carry
            return render_yuv_frame(yy, uu, vv, prep, cfg), None
        (y, u, v), _ = jax.lax.scan(body, (y, u, v), None, length=chain)
        return y

    float(jnp.sum(stepk(y, u, v).astype(jnp.float32)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(stepk(y, u, v).astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    per = float(np.median(times)) / (chain * batch)
    print(f"fused frame {w}x{h} {depth}-bit: {per*1e3:6.2f} ms = "
          f"{1/per:6.1f} fps", flush=True)


fused_frame(prep33, 2160, 3840, 8, 8)
fused_frame(prep65, 2160, 3840, 8, 8)
fused_frame(prep33, 4320, 7680, 4, 10)
