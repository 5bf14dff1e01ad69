"""Round-3: isolate the phase-pipeline primitive costs at 8K.

r3_phase420 showed the assembled phase pipeline is catastrophically slow
(402 ms reshape-interleave / 1709 ms scatter-interleave vs 84 production).
Measure each primitive alone to find the poison and the cheap routes:

  A. strided phase EXTRACT: y (B,H,W) f32 -> stack4 (B,4,Hc,Wc)
  B. row-pair extract: -> stack2 (B,Hc,W) [y[0::2,:], y[1::2,:]]
  C. chroma lane-dup, bitcast route: u16 (B,Hc,Wc) -> (B,Hc,W)
     via u32(c) | u32(c)<<16 -> bitcast u16 -> reshape (minor-most, free)
  D. chroma lane-dup via jnp.repeat axis=-1 (current upsample half)
  E. full 2x2 nearest upsample via jnp.repeat (current production)
  F. row interleave u16: Pallas per-sublane-store kernel (16,bm) out
  G. row interleave u16: .at[0::2].set scatter route (suspected poison)
  H. row interleave u16: reshape route stack(-2)+reshape
  I. lane interleave u16 via bitcast: two (B,H,Wc) -> (B,H,W)

Each timed as x4 jit chain with scalar-readback sync; feed-back-safe
bodies (output sliced/cast back to input shape) so the chain carries.
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

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
B, H, W = 2, 4320, 7680
Hc, Wc = H // 2, W // 2

yf = jnp.asarray(rng.uniform(0, 1023, (B, H, W)).astype(np.float32))
yu = jnp.asarray(rng.integers(0, 1023, (B, H, W)).astype(np.uint16))
cu = jnp.asarray(rng.integers(0, 1023, (B, Hc, Wc)).astype(np.uint16))
eu = jnp.asarray(rng.integers(0, 1023, (B, Hc, W)).astype(np.uint16))
ou = jnp.asarray(rng.integers(0, 1023, (B, Hc, W)).astype(np.uint16))


def sync_time(fn, *args, iters=5):
    s = fn(*args)
    float(jnp.sum(s[0].astype(jnp.float32) if isinstance(s, tuple)
                  else s.astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0].astype(jnp.float32) if isinstance(s, tuple)
                      else s.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(body, k=4):
    @jax.jit
    def f(*args):
        out = args
        for _ in range(k):
            out = body(*out)
            if not isinstance(out, tuple):
                out = (out,)
        return out
    return f


def report(name, body, *args, k=4, per=1):
    try:
        t = sync_time(chain(body, k), *args)
        print(f"{name:<34}: {t/k/per*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:<34}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


# A. strided 4-phase extract (feed back: undo via cheap mean to same shape?
# simplest: slice the stack back apart and re-pad trivially -> instead carry
# the full plane and count extract only: do extract then reduce back via
# p[:, 0] repeated? Keep it honest: extract + elementwise sum back to (B,H,W)
# would need interleave. Chain on the SAME input instead: body returns input
# + tiny function of extract so XLA cannot elide it.
def body_extract4(y):
    p = jnp.stack([y[..., 0::2, 0::2], y[..., 0::2, 1::2],
                   y[..., 1::2, 0::2], y[..., 1::2, 1::2]], axis=-3)
    # consume p at half-res cost (sum over phase axis) and fold a scalar back
    s = (p[..., 0, :, :] + p[..., 1, :, :] + p[..., 2, :, :] + p[..., 3, :, :])
    return y + jnp.mean(s) * 1e-9


report("A stack4 extract f32 (+half sum)", body_extract4, yf)


def body_extract2(y):
    p = jnp.stack([y[..., 0::2, :], y[..., 1::2, :]], axis=-3)
    s = p[..., 0, :, :] + p[..., 1, :, :]
    return y + jnp.mean(s) * 1e-9


report("B stack2 row extract f32", body_extract2, yf)


def lane_dup_bitcast(c):
    w = c.astype(jnp.uint32)
    packed = w | (w << 16)
    pair = jax.lax.bitcast_convert_type(packed, jnp.uint16)  # (..., Wc, 2)
    return pair.reshape(c.shape[:-1] + (2 * c.shape[-1],))


report("C lane-dup bitcast u16",
       lambda c: lane_dup_bitcast(c)[..., ::2], cu)
report("D lane-dup repeat u16",
       lambda c: jnp.repeat(c, 2, axis=-1)[..., ::2], cu)
report("E 2x2 repeat upsample f32",
       lambda c: jnp.repeat(jnp.repeat(c.astype(jnp.float32), 2, axis=-2),
                            2, axis=-1)[..., ::2, ::2].astype(jnp.uint16), cu)

# correctness of C
got = np.asarray(lane_dup_bitcast(cu[0:1]))
want = np.repeat(np.asarray(cu[0:1]), 2, axis=-1)
print("C parity:", "OK" if np.array_equal(got, want) else "MISMATCH",
      flush=True)


# F. Pallas row-interleave kernel: E (8, bm), O (8, bm) -> out (16, bm)
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
        out_shape=jax.ShapeDtypeStruct((2 * rows, bm * grid[1]), e.dtype),
    )(ef, of)
    return out.reshape(shp[:-2] + (2 * hc, w))


report("F row-interleave pallas u16",
       lambda e, o: (row_interleave_pallas(e, o)[..., 0::2, :], o), eu, ou)

got = np.asarray(row_interleave_pallas(eu[0:1], ou[0:1]))
want = np.empty((1, H, W), np.uint16)
want[:, 0::2] = np.asarray(eu[0:1])
want[:, 1::2] = np.asarray(ou[0:1])
print("F parity:", "OK" if np.array_equal(got, want) else "MISMATCH",
      flush=True)

report("G row-interleave at-set u16",
       lambda e, o: (jnp.zeros((B, H, W), jnp.uint16)
                     .at[..., 0::2, :].set(e)
                     .at[..., 1::2, :].set(o)[..., 0::2, :], o), eu, ou)

report("H row-interleave reshape u16",
       lambda e, o: (jnp.stack([e, o], axis=-2)
                     .reshape(B, H, W)[..., 0::2, :], o), eu, ou)


def lane_interleave_bitcast(a, b):
    w = a.astype(jnp.uint32) | (b.astype(jnp.uint32) << 16)
    pair = jax.lax.bitcast_convert_type(w, jnp.uint16)
    return pair.reshape(a.shape[:-1] + (2 * a.shape[-1],))


au = jnp.asarray(rng.integers(0, 1023, (B, H, Wc)).astype(np.uint16))
bu = jnp.asarray(rng.integers(0, 1023, (B, H, Wc)).astype(np.uint16))
report("I lane-interleave bitcast u16",
       lambda a, b: (lane_interleave_bitcast(a, b)[..., 0::2], b), au, bu)
got = np.asarray(lane_interleave_bitcast(au[0:1], bu[0:1]))
want = np.empty((1, H, W), np.uint16)
want[..., 0::2] = np.asarray(au[0:1])
want[..., 1::2] = np.asarray(bu[0:1])
print("I parity:", "OK" if np.array_equal(got, want) else "MISMATCH",
      flush=True)
