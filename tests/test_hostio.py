"""hostio tests: FFI layout, probe, decode, encode roundtrips.

These exercise the real bundled FFmpeg libraries (no mocks) against
deterministic synthetic fixtures.
"""

from fractions import Fraction

import numpy as np
import pytest

from lut_renderer_tpu.hostio import (
    EncoderSettings,
    VideoDecoder,
    VideoEncoder,
    list_encoders,
    probe_video,
)
from lut_renderer_tpu.hostio.encode import EncoderUnavailable, bitrate_to_bits
from lut_renderer_tpu.hostio.ffi import get_ffi
from lut_renderer_tpu.utils.fixtures import make_gradient_clip


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    return make_gradient_clip(d / "fix.mp4", 320, 240, fps=25.0, frames=50)


def test_ffi_layout_verifies():
    ffi = get_ffi()
    assert ffi._verified


def test_probe_fields(clip):
    info = probe_video(clip)
    assert (info.width, info.height) == (320, 240)
    assert info.pix_fmt == "yuv420p"
    assert info.codec_name == "mpeg4"
    assert abs(info.fps - 25.0) < 0.01
    assert abs(info.duration - 2.0) < 0.1
    assert info.nb_frames == 50
    assert info.bitrate and info.bitrate.endswith("k")
    assert not info.is_vfr
    assert info.file_size > 0
    assert info.format_name and "mp4" in info.format_name


def test_probe_missing_file():
    with pytest.raises(FileNotFoundError):
        probe_video("/nonexistent/file.mp4")


def test_decode_all_frames(clip):
    with VideoDecoder(clip) as dec:
        frames = list(dec)
    assert len(frames) == 50
    f0 = frames[0]
    assert f0.y.shape == (240, 320)
    assert f0.u.shape == (120, 160)
    assert f0.bit_depth == 8
    assert f0.pix_fmt == "yuv420p"
    assert f0.pts == 0 and frames[1].pts > 0
    assert [f.index for f in frames] == list(range(50))
    # gradient content: Y increases left-to-right on average (R ramp)
    assert f0.y[:, -10:].mean() > f0.y[:, :10].mean()


def test_encode_prores_roundtrip(clip, tmp_path):
    with VideoDecoder(clip) as dec:
        frames = [dec.read_frame() for _ in range(10)]
    out = tmp_path / "master.mov"
    st = EncoderSettings(
        codec="prores_ks", width=320, height=240, pix_fmt="yuv422p10le",
        fps=Fraction(25), profile="3",
        color_primaries="bt709", color_trc="bt709",
        colorspace="bt709", color_range="tv",
    )
    with VideoEncoder(out, st) as enc:
        for fr in frames:
            y10 = fr.y.astype(np.uint16) << 2
            u10 = np.repeat(fr.u, 2, axis=0).astype(np.uint16) << 2
            v10 = np.repeat(fr.v, 2, axis=0).astype(np.uint16) << 2
            enc.write(y10, u10, v10)
    info = probe_video(out)
    assert info.codec_name == "prores"
    assert info.pix_fmt == "yuv422p10le"
    assert info.bit_depth == 10
    assert info.profile == "HQ"
    assert info.color_primaries == "bt709"
    assert info.color_range == "tv"
    assert abs(info.fps - 25.0) < 0.05  # packet durations stamped

    # 10-bit decode path, lossless luma (ProRes HQ at this size)
    with VideoDecoder(out) as dec:
        f2 = dec.read_frame()
    assert f2.bit_depth == 10 and f2.y.dtype == np.uint16
    assert np.mean(np.abs(f2.y.astype(int) - (frames[0].y.astype(int) << 2))) < 4.0


def test_encode_unavailable_codec(tmp_path):
    st = EncoderSettings(codec="libx264", width=64, height=64,
                         pix_fmt="yuv420p", fps=Fraction(25))
    with pytest.raises(EncoderUnavailable):
        VideoEncoder(tmp_path / "x.mp4", st)


def test_encoder_list_contains_prores():
    encs = list_encoders()
    assert "prores_ks" in encs
    assert "libx264" not in encs


def test_bitrate_to_bits():
    assert bitrate_to_bits("8000k") == 8_000_000
    assert bitrate_to_bits("7.5M") == 7_500_000
    assert bitrate_to_bits("") is None
    assert bitrate_to_bits("abc") is None


def test_encode_mpeg4_8bit_and_reDecode(tmp_path, clip):
    with VideoDecoder(clip) as dec:
        frames = [dec.read_frame() for _ in range(8)]
    out = tmp_path / "out.mp4"
    st = EncoderSettings(codec="mpeg4", width=320, height=240,
                         pix_fmt="yuv420p", fps=Fraction(25),
                         bitrate="2M", gop=12, faststart=True)
    with VideoEncoder(out, st) as enc:
        for fr in frames:
            enc.write(fr.y, fr.u, fr.v)
    info = probe_video(out)
    assert info.codec_name == "mpeg4"
    assert info.nb_frames == 8
    with VideoDecoder(out) as dec:
        f2 = dec.read_frame()
    assert np.mean(np.abs(f2.y.astype(int) - frames[0].y.astype(int))) < 8.0


def test_encode_with_audio_copy_no_audio_source(tmp_path, clip):
    """audio_from pointing at a source with no audio stream degrades cleanly."""
    out = tmp_path / "av.mov"
    st = EncoderSettings(codec="prores_ks", width=320, height=240,
                         pix_fmt="yuv422p10le", fps=Fraction(25))
    with VideoDecoder(clip) as dec:
        fr = dec.read_frame()
    with VideoEncoder(out, st, audio_from=clip) as enc:
        y10 = fr.y.astype(np.uint16) << 2
        u10 = np.repeat(fr.u, 2, axis=0).astype(np.uint16) << 2
        v10 = np.repeat(fr.v, 2, axis=0).astype(np.uint16) << 2
        enc.write(y10, u10, v10)
    assert probe_video(out).codec_name == "prores"


def test_encode_webm_vp9_and_mkv_ffv1_containers(tmp_path, clip):
    """Container breadth: the reference accepts webm/mkv sources
    (VIDEO_EXTS, main_window.py:76) — our mux/demux handles them too:
    vp9-in-webm and lossless ffv1-in-mkv round-trip through probe+decode."""
    with VideoDecoder(clip) as dec:
        frames = [dec.read_frame() for _ in range(4)]

    out_webm = tmp_path / "o.webm"
    st = EncoderSettings(codec="libvpx-vp9", width=320, height=240,
                         pix_fmt="yuv420p", fps=Fraction(25), bitrate="1M")
    with VideoEncoder(out_webm, st) as enc:
        for fr in frames:
            enc.write(fr.y, fr.u, fr.v)
    info = probe_video(out_webm)
    assert info.codec_name in ("vp9", "libvpx-vp9")
    with VideoDecoder(out_webm) as dec:
        f2 = dec.read_frame()
    assert f2.y.shape == frames[0].y.shape

    out_mkv = tmp_path / "o.mkv"
    st = EncoderSettings(codec="ffv1", width=320, height=240,
                         pix_fmt="yuv420p", fps=Fraction(25))
    with VideoEncoder(out_mkv, st) as enc:
        for fr in frames:
            enc.write(fr.y, fr.u, fr.v)
    info = probe_video(out_mkv)
    assert info.codec_name == "ffv1"
    with VideoDecoder(out_mkv) as dec:
        f3 = dec.read_frame()
    # ffv1 is lossless: bit-exact round trip
    np.testing.assert_array_equal(f3.y, frames[0].y)
