"""Per-codec HOST encode throughput on this box (round 5, closes r4
VERDICT weak #3): the config-4 soak concluded "bounded by single-core
host encode" without a denominator. Measure encode-only fps per codec at
1080p and 4K (synthetic planes straight into hostio.VideoEncoder — no
decode, no TPU), so serve operators can pick throughput-cheap codecs.

Single CPU core; codecs from the CLI `encoders` menu that the bundled
libavcodec actually ships. Results land in FINDINGS.md ("Per-codec host
encode throughput") and app/help.py's codec topic.

RESULTS 2026-08-19 (this box, single core, 60 frames, steady-state):
    printed table below; see FINDINGS.md.
"""
import sys
import tempfile
import time
from fractions import Fraction
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np

from lut_renderer_tpu.hostio.encode import EncoderSettings, VideoEncoder

CODECS = [
    # (codec, container ext, pix_fmt, rate control)
    ("mpeg4", ".mp4", "yuv420p", {"bitrate": "8M"}),
    ("mjpeg", ".avi", "yuvj420p", {"qscale": 4}),
    ("libvpx-vp9", ".webm", "yuv420p", {"crf": 32}),
    ("prores_ks", ".mov", "yuv422p10le", {"profile": "3"}),
    ("ffv1", ".mkv", "yuv420p", {}),
    ("utvideo", ".mkv", "yuv420p", {}),
]
GEOMS = [("1080p", 1920, 1080), ("4K", 3840, 2160)]
FRAMES = 60


def planes(rng, w, h, pix_fmt):
    depth = 10 if "10" in pix_fmt else 8
    dt = np.uint16 if depth > 8 else np.uint8
    hi = (1 << depth) - 1
    cw = w // 2 if "420" in pix_fmt or "422" in pix_fmt else w
    ch = h // 2 if "420" in pix_fmt else h
    # moving-gradient content with mild texture: representative grading
    # footage, not pathological noise (a first cut with pure-noise chroma
    # inflated entropy coding ~3-10x on prores/ffv1 — worst case, not
    # steering-relevant)
    base = np.linspace(0, hi, w, dtype=np.float32)
    tex = rng.normal(0, hi * 0.01, (h, w)).astype(np.float32)
    ctex = rng.normal(0, hi * 0.01, (ch, cw)).astype(np.float32)
    cbase = np.linspace(hi * 0.35, hi * 0.65, cw, dtype=np.float32)
    ys, us = [], []
    for i in range(8):
        ys.append(np.clip((base[None, :] + i * 37) % (hi + 1) + tex,
                          0, hi).astype(dt))
        us.append(np.clip(cbase[None, :] + i * 11 + ctex,
                          0, hi).astype(dt).reshape(ch, cw))
    return ys, us


def main():
    rng = np.random.default_rng(1)
    tmp = Path(tempfile.mkdtemp(prefix="codecbench_"))
    print(f"{'codec':<12} {'geometry':<6} {'fps':>8}  note")
    for label, w, h in GEOMS:
        for codec, ext, pix_fmt, rc in CODECS:
            ys, us = planes(rng, w, h, pix_fmt)
            s = EncoderSettings(codec=codec, width=w, height=h,
                                pix_fmt=pix_fmt, fps=Fraction(25, 1), **rc)
            out = tmp / f"{codec}_{label}{ext}"
            try:
                enc = VideoEncoder(out, s)
                # steady state: drop the first few frames (open/alloc)
                for i in range(4):
                    enc.write(ys[i % 8], us[i % 8], us[(i + 1) % 8])
                t0 = time.perf_counter()
                for i in range(FRAMES):
                    enc.write(ys[i % 8], us[i % 8], us[(i + 1) % 8])
                dt = time.perf_counter() - t0
                enc.close()
                mb = out.stat().st_size / 1e6
                print(f"{codec:<12} {label:<6} {FRAMES / dt:>8.1f}  "
                      f"({mb:.0f} MB/{FRAMES + 4}f)", flush=True)
            except Exception as exc:
                print(f"{codec:<12} {label:<6} {'n/a':>8}  {exc}"[:100],
                      flush=True)


if __name__ == "__main__":
    main()
