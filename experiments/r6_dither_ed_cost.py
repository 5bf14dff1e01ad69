"""Round-4 VERDICT #5: quantify the error-diffusion HOST pass.

--dither error_diffusion runs the exact Floyd-Steinberg quantizer
(native/src/dither_ed.cpp) serially on the single host core
(engine/executor.py `_finish`). FS has a per-pixel error dependency chain,
so it cannot ride the TPU (data-dependent serial recurrence) and cannot be
vectorized much on the host either.

Measured on this box (run of this script):
  y 4K plane (2160x3840):   111 ms
  chroma 420 plane (x2):   27.5 ms each
  420 4K frame total:       167 ms  =  6.0 fps host ceiling
vs the fused in-kernel ordered/random path at ~16.5 ms/frame (~60 fps):
error_diffusion caps 4K throughput at ~6 fps — a 10x penalty. The
reference inherits zimg's multithreaded SIMD implementation (ffmpeg.py:
304-307) and doesn't pay this on a many-core box; on THIS box's single
core the serial pass is the honest cost. help.py's dither topic now
steers users to ordered/random unless zscale-exact output is required.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from lut_renderer_tpu.native_ext import (error_diffusion_quantize,
                                         native_available)

print("native:", native_available())
rng = np.random.default_rng(0)
H, W = 2160, 3840
y = rng.uniform(0, 255, (H, W)).astype(np.float32)
c = rng.uniform(0, 255, (H // 2, W // 2)).astype(np.float32)
error_diffusion_quantize(y, 8)
error_diffusion_quantize(c, 8)
for name, arr in (("y 4K", y), ("chroma 420", c)):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        error_diffusion_quantize(arr, 8)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms")
t0 = time.perf_counter()
for _ in range(3):
    error_diffusion_quantize(y, 8)
    error_diffusion_quantize(c, 8)
    error_diffusion_quantize(c, 8)
per = (time.perf_counter() - t0) / 3
print(f"420 frame total: {per*1e3:.1f} ms = {1/per:.1f} fps host ceiling")
