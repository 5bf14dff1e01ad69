"""Round-4 follow-up to r6_dither_ed_cost: make the error-diffusion host
pass fast instead of just documented.

The float Floyd-Steinberg recurrence is LATENCY-bound: each pixel's
quantization waits on the previous pixel's 7/16 error share through a
~35-cycle float chain (add, +0.5, f32->int, clamp, int->f32, sub, mul).
ltn_dither_ed_fx (native/src/dither_ed.cpp) restructures it three ways:

 1. int32 fixed point, 12 fractional bits: the serial chain becomes
    add / add / sar / and / sub / (lea,sar)x2 / subs -- ~10 cycles. The
    error term is computed as ((v + HALF) & MASK) - HALF so it never
    waits on the (rare, branch-predicted) clamp. Error is conserved
    EXACTLY per pixel: the carried 7/16 share is the residual
    e - e3 - e5 - e1, so the diffusion cannot drift and mean
    preservation is exact, like the float version.
 2. The row's `input*4096 + error_from_above` pre-add runs as a
    vectorized SSE2 pass (cvtps2dq = round-to-nearest-even = lrintf),
    pulling all float work off the serial loop.
 3. Down-row error contributions are carried in two registers and
    finalized with ONE plain store per pixel (the slot is complete two
    pixels later), replacing three read-modify-writes and the per-row
    memset.

Measured on this host (median of 7, gradient+noise 4K plane, run of this
script):

  ltn_dither_ed    (float): 103.4 ms/4K-luma = 12.5 ns/px
  ltn_dither_ed_fx (fixed): 33.6 ms/4K-luma  =  4.05 ns/px   (3.1x)

  420 4K frame total (y + 2 chroma): 167 ms -> 54 ms
  host ED ceiling: 6.0 fps -> 18.5 fps (ED runs in the encode thread,
  overlapped with device compute, but the box has one core).

Output deltas fx vs float: max |d| = 1 code value, ~14% of pixels toggle
(inherent decision chaos from the 1/4096-code input quantization), mean
error identical to float (9.3e-5 on the test plane), banding metric
unchanged. Saturation (<0 / >max inputs) clamps with correct error
bookkeeping; odd widths/tiny planes covered by the register epilogues
(tests/test_native.py::test_error_diffusion_fx_*).

Not pursued: the classic wavefront-SIMD FS parallelization needs a
raster (non-serpentine) scan and 8-row skewed state; serpentine was kept
for quality (it is what this build has always shipped) and the remaining
gap to the ~2 ns/px integer-chain bound does not justify the rewrite on
a single-core host.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from lut_renderer_tpu.native_ext import (error_diffusion_quantize,
                                         native_available)

print("native:", native_available())
rng = np.random.default_rng(0)
H, W = 2160, 3840
y = (np.linspace(0, 255, W, dtype=np.float32)[None, :]
     + rng.normal(0, 0.3, (H, W)).astype(np.float32))
y = np.clip(y, 0, 255)
c = rng.uniform(0, 255, (H // 2, W // 2)).astype(np.float32)

fx = error_diffusion_quantize(y, 8).astype(int)
fl = error_diffusion_quantize(y, 8, exact_float=True).astype(int)
d = fx - fl
print(f"fx vs float: toggle={np.mean(d != 0):.4f} max|d|={np.abs(d).max()}"
      f" mean_err_fx={abs(fx.mean() - y.mean()):.2e}")

for label, kw in (("float", dict(exact_float=True)), ("fx", {})):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        error_diffusion_quantize(y, 8, **kw)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{label}: {ms:.1f} ms/4K-luma = {ms / (H * W) * 1e6:.2f} ns/px")

t0 = time.perf_counter()
for _ in range(3):
    error_diffusion_quantize(y, 8)
    error_diffusion_quantize(c, 8)
    error_diffusion_quantize(c, 8)
per = (time.perf_counter() - t0) / 3
print(f"420 frame total: {per * 1e3:.1f} ms = {1 / per:.1f} fps host ceiling")
