"""Round-3 65^3 attack, step 3: the direct int4-pair tier on the chip —
compiled parity + speed vs int8_lite, block sweep."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D, max_delta_e76
from lut_renderer_tpu.colorcore.interp import apply_lut as oracle_apply
from lut_renderer_tpu.ops import prepare_lut
import lut_renderer_tpu.ops.lut3d as l3

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
lut = Lut3D.identity(65)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
print("sim tetra int4_fast:", round(prep.mode_error("tetrahedral", "int4_fast"), 4),
      flush=True)

# compiled parity on a small block first (also validates int4 lowering)
P = 8192
rs = rng.uniform(0, 1, (1, P)).astype(np.float32)
gs = rng.uniform(0, 1, (1, P)).astype(np.float32)
bs = rng.uniform(0, 1, (1, P)).astype(np.float32)
f = jax.jit(lambda r, g, b: l3.apply_lut_planes(
    r, g, b, prep, "tetrahedral", precision="int4_fast"))
ro, go, bo = f(jnp.asarray(rs), jnp.asarray(gs), jnp.asarray(bs))
got = np.stack([np.asarray(ro)[0], np.asarray(go)[0], np.asarray(bo)[0]], 1)
want = np.stack(
    [x[0] for x in l3.apply_lut_planes(rs, gs, bs, prep, "tetrahedral",
                                       strategy="gather")], 1)
want = np.asarray(want)
de = max_delta_e76(np.clip(got[None], 0, 1), np.clip(want[None], 0, 1))
print(f"compiled parity dE76 vs gather-exact: {float(de):.4f}", flush=True)

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


def bench(label, interp, precision, bm):
    orig = l3._block_pixels
    l3._block_pixels = lambda nn, mode="exact", n_passes=2, _bm=bm: _bm
    try:
        def make(k):
            @jax.jit
            def f(r, g, b):
                for _ in range(k):
                    r, g, b = l3.apply_lut_planes(r, g, b, prep, interp,
                                                  precision=precision)
                return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)
            return f
        t1 = sync_time(make(1), rj, gj, bj)
        t5 = sync_time(make(5), rj, gj, bj)
        per = (t5 - t1) / 4
        print(f"{label:44s} {per*1e3:7.1f} ms  {1/per:6.1f} fps", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:300]}", flush=True)
    finally:
        l3._block_pixels = orig


bench("int4_fast tetra bm1024", "tetrahedral", "int4_fast", 1024)
bench("int4_fast tetra bm2048", "tetrahedral", "int4_fast", 2048)
bench("int4_fast trilinear bm2048", "trilinear", "int4_fast", 2048)
bench("int4_fast tetra bm512", "tetrahedral", "int4_fast", 512)
