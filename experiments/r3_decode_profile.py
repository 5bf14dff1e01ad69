"""Round-3 (VERDICT #8): profile the host decode path on 4K ProRes.

Questions:
  1. raw libav decode cost vs the Python/ctypes loop overhead;
  2. the plane-copy cost: per-row memmove loop (padded linesize) vs a
     vectorized numpy strided copy vs no copy at all.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pathlib import Path
import numpy as np

import lut_renderer_tpu.hostio.decode as D
from lut_renderer_tpu.hostio.decode import VideoDecoder

CLIP = Path("/tmp/r3_prores_4k.mov")
if not CLIP.exists():
    # 4K ProRes HQ test asset via our own encode layer
    from fractions import Fraction
    from lut_renderer_tpu.hostio.encode import EncoderSettings, VideoEncoder

    rng = np.random.default_rng(0)
    s = EncoderSettings(codec="prores_ks", width=3840, height=2160,
                        pix_fmt="yuv422p10le", fps=Fraction(24, 1),
                        profile="3")
    enc = VideoEncoder(CLIP, s)
    base = rng.integers(64, 940, (2160, 3840), np.uint16)
    for i in range(24):
        y = np.clip(base + i * 4, 0, 1023).astype(np.uint16)
        u = rng.integers(64, 960, (2160, 1920), np.uint16)
        v = rng.integers(64, 960, (2160, 1920), np.uint16)
        enc.write(y, u, v)
    enc.close()
    print(f"made {CLIP} ({CLIP.stat().st_size/1e6:.1f} MB)", flush=True)


def run(label, copy_fn=None):
    orig = D._copy_plane
    if copy_fn:
        D._copy_plane = copy_fn
    try:
        dec = VideoDecoder(CLIP)
        t0 = time.perf_counter()
        n = 0
        lss = None
        for f in dec:
            n += 1
            lss = f.y.shape
        dt = time.perf_counter() - t0
        print(f"{label:36s} {n} frames in {dt:.2f}s = {n/dt:5.2f} fps "
              f"(y {lss})", flush=True)
        dec.close()
        return n / dt
    finally:
        D._copy_plane = orig


def nocopy(data_ptr, linesize, h, w, itemsize):
    dtype = np.uint8 if itemsize == 1 else np.uint16
    return np.empty((h, w), dtype)       # skip the copy entirely


import ctypes
from ctypes import memmove


def npcopy(data_ptr, linesize, h, w, itemsize):
    dtype = np.uint8 if itemsize == 1 else np.uint16
    row_bytes = w * itemsize
    if linesize == row_bytes:
        out = np.empty((h, w), dtype)
        memmove(out.ctypes.data, data_ptr, row_bytes * h)
        return out
    buf = (ctypes.c_ubyte * (linesize * h)).from_address(data_ptr)
    arr = np.frombuffer(buf, np.uint8).reshape(h, linesize)[:, :row_bytes]
    return np.ascontiguousarray(arr).view(dtype).reshape(h, w)


run("baseline (per-row memmove loop)")
run("no-copy (raw decode + ctypes loop)", nocopy)
run("numpy strided copy", npcopy)
run("baseline again (order control)")
