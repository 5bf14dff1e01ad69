"""Probe the bundled swscale's `scale` filter conventions via impulse responses.

Goal: implement the reference's `-s WxH` rescale (ffmpeg.py:312-313 -> FFmpeg's
default scaler, SWS_BICUBIC B=0 C=0.6) as a TPU-native matmul resampler. This
script extracts swscale's ACTUAL per-output-pixel filter weights by scaling
impulse planes through a buffer -> scale=W:H:flags=bicubic -> buffersink graph
(float gray if supported, else 16-bit gray), so the closed-form weights in
ops/pixel.resample_plane can be verified tap-for-tap, including:
  * phase convention (center = (i + 0.5) * in/out - 0.5),
  * downscale anti-alias support widening + argument scaling,
  * edge handling (replicate-clamp),
  * coefficient quantization granularity (swscale uses 14-bit fixed point).

Run CPU-only: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/r4_scale_probe.py
"""
from __future__ import annotations

import sys
from ctypes import POINTER, byref, c_char_p, c_int, c_void_p, memmove

import numpy as np

sys.path.insert(0, ".")
from lut_renderer_tpu.hostio.ffi import (  # noqa: E402
    AVERROR_EAGAIN, MediaError, OFF, _r_i32, _w_i32, _w_i64, _r_ptr, get_ffi,
)


class ScaleProbe:
    """buffer -> scale=<w>:<h>:flags=<flags> -> buffersink on a gray plane."""

    def __init__(self, in_w, in_h, out_w, out_h, pix_fmt="grayf32le",
                 flags="bicubic"):
        self.ffi = ffi = get_ffi()
        af = ffi.avfilter
        af.avfilter_graph_alloc.restype = c_void_p
        af.avfilter_get_by_name.restype = c_void_p
        af.avfilter_get_by_name.argtypes = [c_char_p]
        af.avfilter_graph_create_filter.argtypes = [
            POINTER(c_void_p), c_void_p, c_char_p, c_char_p, c_void_p, c_void_p]
        af.avfilter_graph_create_filter.restype = c_int
        af.avfilter_link.argtypes = [c_void_p, c_int, c_void_p, c_int]
        af.avfilter_link.restype = c_int
        af.avfilter_graph_config.argtypes = [c_void_p, c_void_p]
        af.avfilter_graph_config.restype = c_int
        af.av_buffersrc_add_frame_flags.argtypes = [c_void_p, c_void_p, c_int]
        af.av_buffersrc_add_frame_flags.restype = c_int
        af.av_buffersink_get_frame.argtypes = [c_void_p, c_void_p]
        af.av_buffersink_get_frame.restype = c_int
        af.avfilter_graph_free.argtypes = [POINTER(c_void_p)]

        self.in_w, self.in_h, self.out_w, self.out_h = in_w, in_h, out_w, out_h
        self.fmt_id = ffi.pix_fmt_id(pix_fmt)
        if self.fmt_id < 0:
            raise MediaError(f"unknown pix_fmt {pix_fmt}")
        self.pix_fmt = pix_fmt
        self.itemsize = 4 if "f32" in pix_fmt else 2

        self._graph = c_void_p(af.avfilter_graph_alloc())
        buf = af.avfilter_get_by_name(b"buffer")
        sink = af.avfilter_get_by_name(b"buffersink")
        scale = af.avfilter_get_by_name(b"scale")
        if not (buf and sink and scale):
            raise MediaError("buffer/buffersink/scale missing")
        self._src = c_void_p(0)
        args = (f"video_size={in_w}x{in_h}:pix_fmt={self.fmt_id}:"
                f"time_base=1/25:pixel_aspect=1/1").encode()
        ffi.check(af.avfilter_graph_create_filter(
            byref(self._src), c_void_p(buf), b"in", args, None, self._graph),
            "create buffer source")
        self._scale = c_void_p(0)
        sargs = f"w={out_w}:h={out_h}:flags={flags}".encode()
        ffi.check(af.avfilter_graph_create_filter(
            byref(self._scale), c_void_p(scale), b"sc", sargs, None,
            self._graph), "create scale")
        self._sink = c_void_p(0)
        ffi.check(af.avfilter_graph_create_filter(
            byref(self._sink), c_void_p(sink), b"out", None, None,
            self._graph), "create buffersink")
        ffi.check(af.avfilter_link(self._src, 0, self._scale, 0), "link1")
        ffi.check(af.avfilter_link(self._scale, 0, self._sink, 0), "link2")
        ffi.check(af.avfilter_graph_config(self._graph, None), "config")

        self._frm = ffi.avutil.av_frame_alloc()
        _w_i32(self._frm, OFF["frame_width"], in_w)
        _w_i32(self._frm, OFF["frame_height"], in_h)
        _w_i32(self._frm, OFF["frame_format"], self.fmt_id)
        ffi.check(ffi.avutil.av_frame_get_buffer(c_void_p(self._frm), 0),
                  "frame_get_buffer")
        self._out = ffi.avutil.av_frame_alloc()
        self._pts = 0

    def scale(self, plane: np.ndarray) -> np.ndarray:
        ffi = self.ffi
        h, w = plane.shape
        assert (h, w) == (self.in_h, self.in_w)
        dt = np.float32 if self.itemsize == 4 else np.uint16
        arr = np.ascontiguousarray(plane, dt)
        ffi.check(ffi.avutil.av_frame_make_writable(c_void_p(self._frm)), "mw")
        data = _r_ptr(self._frm, OFF["frame_data"])
        ls = _r_i32(self._frm, OFF["frame_linesize"])
        row = w * self.itemsize
        for r_ in range(h):
            memmove(data + r_ * ls, arr.ctypes.data + r_ * row, row)
        _w_i64(self._frm, OFF["frame_pts"], self._pts)
        self._pts += 1
        ffi.check(ffi.avfilter.av_buffersrc_add_frame_flags(
            self._src, c_void_p(self._frm), 8), "add_frame")
        r = ffi.avfilter.av_buffersink_get_frame(self._sink, c_void_p(self._out))
        if r == AVERROR_EAGAIN:
            raise MediaError("no frame")
        ffi.check(r, "get_frame")
        oh, ow = self.out_h, self.out_w
        out = np.empty((oh, ow), dt)
        data = _r_ptr(self._out, OFF["frame_data"])
        ls = _r_i32(self._out, OFF["frame_linesize"])
        row = ow * self.itemsize
        for r_ in range(oh):
            memmove(out.ctypes.data + r_ * row, data + r_ * ls, row)
        ffi.avutil.av_frame_unref(c_void_p(self._out))
        return out.astype(np.float32)

    def close(self):
        if getattr(self, "_graph", None) and self._graph.value:
            for name in ("_frm", "_out"):
                p = getattr(self, name, None)
                if p:
                    pp = c_void_p(p)
                    self.ffi.avutil.av_frame_free(byref(pp))
                    setattr(self, name, None)
            self.ffi.avfilter.avfilter_graph_free(byref(self._graph))


def impulse_rows(probe, in_w, positions):
    """Feed horizontal impulses -> each output row of weights for those taps."""
    out = {}
    for j in positions:
        plane = np.zeros((probe.in_h, in_w), np.float32)
        plane[:, j] = 1.0
        res = probe.scale(plane)
        out[j] = res[probe.out_h // 2]  # any row; vertical is identity here
    return out


def main():
    # --- check float gray support
    for fmt in ("grayf32le", "gray16le", "gray"):
        try:
            p = ScaleProbe(16, 8, 8, 8, pix_fmt=fmt)
            p.close()
            print(f"pix_fmt {fmt}: OK")
            use_fmt = fmt
            break
        except MediaError as e:
            print(f"pix_fmt {fmt}: {e}")
    else:
        raise SystemExit("no usable gray format")

    scale_val = 1.0 if "f32" in use_fmt else (65535.0 if "16" in use_fmt else 255.0)

    # --- 1. upscale x2: horizontal impulse response (in_w=16 -> out_w=32)
    print("\n== upscale 16->32 (x2), impulse at j=8 ==")
    pr = ScaleProbe(16, 8, 32, 8, pix_fmt=use_fmt)
    rows = impulse_rows(pr, 16, [8, 0, 15])
    pr.close()
    for j, resp in rows.items():
        nz = np.nonzero(resp)[0]
        print(f"impulse j={j}: taps {list(nz)} -> "
              f"{[round(float(resp[k]) / scale_val, 6) for k in nz]}")

    # --- 2. downscale x2: 32 -> 16
    print("\n== downscale 32->16 (x0.5), impulse at j=16 ==")
    pr = ScaleProbe(32, 8, 16, 8, pix_fmt=use_fmt)
    rows = impulse_rows(pr, 32, [16, 0, 31])
    pr.close()
    for j, resp in rows.items():
        nz = np.nonzero(resp)[0]
        print(f"impulse j={j}: taps {list(nz)} -> "
              f"{[round(float(resp[k]) / scale_val, 6) for k in nz]}")

    # --- 3. non-integer ratio 3840->1920 style: 24 -> 10
    print("\n== downscale 24->10, impulses ==")
    pr = ScaleProbe(24, 8, 10, 8, pix_fmt=use_fmt)
    rows = impulse_rows(pr, 24, [12])
    pr.close()
    for j, resp in rows.items():
        nz = np.nonzero(resp)[0]
        print(f"impulse j={j}: taps {list(nz)} -> "
              f"{[round(float(resp[k]) / scale_val, 6) for k in nz]}")

    # --- 4. upscale non-integer 10 -> 24
    print("\n== upscale 10->24, impulse j=5 ==")
    pr = ScaleProbe(10, 8, 24, 8, pix_fmt=use_fmt)
    rows = impulse_rows(pr, 10, [5])
    pr.close()
    for j, resp in rows.items():
        nz = np.nonzero(resp)[0]
        print(f"impulse j={j}: taps {list(nz)} -> "
              f"{[round(float(resp[k]) / scale_val, 6) for k in nz]}")


if __name__ == "__main__":
    main()
