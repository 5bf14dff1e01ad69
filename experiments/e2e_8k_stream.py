"""End-to-end 8K 10-bit streaming through the real pipeline (config 5).

Synthesizes a short 8K 10-bit ProRes clip, then runs ONE render stage
(decode -> TPU fused render -> prores_ks encode) through engine.run_stage,
reporting per-phase throughput. Constant-memory: batches stream; nothing
holds the clip. On this box decode/encode are single-CPU-core-bound; the
device render phase is what the chip contributes.
"""
import sys, time, tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

from lut_renderer_tpu.utils.fixtures import make_10bit_prores_clip
from lut_renderer_tpu.hostio import probe_video
from lut_renderer_tpu.plan.policy import RenderSpec
from lut_renderer_tpu.engine import run_stage
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.colorcore import Lut3D

W, H, FRAMES = 7680, 4320, 8

d = Path(tempfile.mkdtemp(prefix="e2e8k_"))
t0 = time.perf_counter()
clip = make_10bit_prores_clip(d / "src8k.mov", width=W, height=H,
                              fps=24.0, frames=FRAMES)
print(f"fixture: {clip} in {time.perf_counter()-t0:.1f}s "
      f"({clip.stat().st_size/1e6:.0f} MB)", flush=True)
info = probe_video(clip)
print(f"probe: {info.resolution} {info.pix_fmt} {info.bit_depth}bit", flush=True)

rng = np.random.default_rng(1)
lut = Lut3D.identity(33)
lut.table = np.clip(lut.table + rng.uniform(-0.04, 0.04, lut.table.shape
                                            ).astype(np.float32), 0, 1)
prep = prepare_lut(lut)
spec = RenderSpec(source=clip, output=d / "out8k.mov",
                  video_codec="prores_ks", pix_fmt="yuv422p10le",
                  lut_path=None)
res = run_stage(spec, info, prep, log_cb=lambda m: print("  " + m, flush=True))
print(f"ok={res.ok} err={res.error!r}")
print(f"stats: {res.stats.summary()}")
