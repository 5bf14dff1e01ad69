"""Round-3: honest per-op costs of the 8K pre/post suspects.

r3_8k_hlo_inspect showed the fused frame accesses 18.2 GB vs the kernel's
3.3 GB, with lane-axis repeat broadcasts (f32[4320,3840,2]) and 16
transposes. The earlier standalone stage timings let XLA elide the work
(crop consumers). Here every variant runs in a chain whose carry is the
MATERIALIZED full-res result, so nothing elides:

  up+down    : full -> 2x2-mean half -> nearest-upsample back to full
  updown_bil : same with bilinear upsample
  quant ord  : full -> ordered quantize -> back to f32 (Bayer tile cost)
  quant rnd  : full -> random (hash) dither quantize -> f32
  quant none : full -> round quantize -> f32
  phases     : full -> 4 phase slices (strided lane+sublane reads) ->
               reassemble via strided interleave (the phase-layout cost)
  transpose  : full -> transpose -> transpose back (relayout calibration)
  fma        : floor (sync tax + 2x plane r/w)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.ops import pixel as P

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
H, W = 4320, 7680
x0 = jnp.asarray(rng.uniform(0, 1023, (H, W)).astype(np.float32))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(body, k=4):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = body(x)
        return x
    return f


def report(name, body):
    t = sync_time(chain(body), x0)
    print(f"{name:<14}: {t/4*1e3:7.2f} ms/frame", flush=True)


report("fma", lambda x: x * 1.0001 + 0.1)
report("up+down", lambda x: P.chroma_upsample_420(
    P.chroma_downsample_420(x), "nearest"))
report("updown_bil", lambda x: P.chroma_upsample_420(
    P.chroma_downsample_420(x), "bilinear"))
report("quant none", lambda x: P.quantize_plane(x, 10, "none").astype(jnp.float32))
report("quant ord", lambda x: P.quantize_plane(x, 10, "ordered").astype(jnp.float32))
report("quant rnd", lambda x: P.quantize_plane(x, 10, "random").astype(jnp.float32))


def phases_body(x):
    p00 = x[0::2, 0::2]
    p01 = x[0::2, 1::2]
    p10 = x[1::2, 0::2]
    p11 = x[1::2, 1::2]
    # touch each phase, then interleave back (strided-write analog via
    # stack+reshape on both axes)
    cols = jnp.stack([p00 + 1.0, p01 + 1.0], axis=-1).reshape(H // 2, W)
    cols2 = jnp.stack([p10 + 1.0, p11 + 1.0], axis=-1).reshape(H // 2, W)
    return jnp.stack([cols, cols2], axis=1).reshape(H, W)


report("phases", phases_body)
report("transpose", lambda x: jnp.transpose(jnp.transpose(x) + 1.0) + 1.0)
