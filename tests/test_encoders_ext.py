"""Extended encoder menu: bundled pro-mastering video codecs and the widened
audio transcode set.

The reference's menu is prores/mpeg4/libx264/videotoolbox + aac/mp3/copy
(src/lut_renderer/main_window.py:748-763). The bundled libav* here also ship
DNxHR, CineForm, v210, mpeg2video, utvideo, VP8 and seven audio encoders —
all are exposed through the same name-generic encode layer and verified
end-to-end below (encode -> probe round-trips).
"""

from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

from lut_renderer_tpu.hostio import (
    EncoderSettings,
    VideoEncoder,
    probe_video,
)
from lut_renderer_tpu.hostio.audio import free_audio_ctx, transcode_audio_packets
from lut_renderer_tpu.hostio.encode import encoder_available, list_encoders
from lut_renderer_tpu.models import ProcessingParams, VideoInfo
from lut_renderer_tpu.plan import build_render_spec
from lut_renderer_tpu.utils.fixtures import make_av_clip

W, H = 256, 144


@pytest.fixture(scope="module")
def av_clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("encext")
    return make_av_clip(d / "av.mov", frames=5, audio_seconds=1.0)


def _planes(pix_fmt: str):
    depth10 = "10le" in pix_fmt
    dt = np.uint16 if depth10 else np.uint8
    mx = 1023 if depth10 else 255
    rng = np.random.default_rng(7)
    cw = W if "444" in pix_fmt else W // 2
    ch = H // 2 if "420" in pix_fmt else H
    y = (rng.random((H, W)) * mx).astype(dt)
    u = (rng.random((ch, cw)) * mx).astype(dt)
    v = (rng.random((ch, cw)) * mx).astype(dt)
    return y, u, v


@pytest.mark.parametrize(
    "codec,profile,pix_fmt,expect_pix",
    [
        ("dnxhd", "dnxhr_hq", "yuv422p", "yuv422p"),
        ("dnxhd", "dnxhr_hqx", "yuv422p10le", "yuv422p10le"),
        ("dnxhd", "dnxhr_444", "yuv444p10le", "yuv444p10le"),
        ("cfhd", None, "yuv422p10le", "yuv422p10le"),
        ("v210", None, "yuv422p10le", "yuv422p10le"),
        ("mpeg2video", None, "yuv422p", "yuv422p"),
        ("utvideo", None, "yuv422p", "yuv422p"),
        ("libvpx", None, "yuv420p", "yuv420p"),
    ],
)
def test_video_encoder_roundtrip(tmp_path, codec, profile, pix_fmt, expect_pix):
    if not encoder_available(codec):
        pytest.skip(f"{codec} not bundled")
    ext = ".webm" if codec == "libvpx" else ".mov"
    out = tmp_path / f"t_{codec}_{profile or 'def'}{ext}"
    st = EncoderSettings(codec=codec, width=W, height=H, pix_fmt=pix_fmt,
                         fps=Fraction(25), profile=profile)
    y, u, v = _planes(pix_fmt)
    with VideoEncoder(out, st) as enc:
        for _ in range(3):
            enc.write(y, u, v)
    info = probe_video(out)
    assert info.width == W and info.height == H
    assert info.pix_fmt == expect_pix
    assert out.stat().st_size > 1000


@pytest.mark.parametrize(
    "codec", ["flac", "alac", "ac3", "eac3", "mp2", "opus", "vorbis"]
)
def test_audio_transcode_widened(av_clip, codec):
    """Sample-format negotiation (alac wants s16p/s32p, ac3/opus/vorbis want
    fltp) plus the strict=experimental gate for the native opus/vorbis
    encoders — the two failure modes the aac-only path hid."""
    res = transcode_audio_packets(av_clip, codec, 128000)
    assert res is not None, f"{codec} transcode returned None"
    ctx, pkts, tb = res
    free_audio_ctx(ctx)
    assert tb == (1, 48000)
    assert len(pkts) >= 10
    pts = [p[1] for p in pkts]
    assert pts == sorted(pts)
    assert sum(len(p[0]) for p in pkts) > 500


@pytest.mark.parametrize(
    "codec,ext", [("ac3", ".mp4"), ("alac", ".mov"), ("flac", ".mkv")]
)
def test_mux_audio_end_to_end(av_clip, tmp_path, codec, ext):
    out = tmp_path / f"mux_{codec}{ext}"
    st = EncoderSettings(codec="mpeg4", width=128, height=96,
                         pix_fmt="yuv420p", fps=Fraction(25))
    y = np.zeros((96, 128), np.uint8)
    u = np.full((48, 64), 128, np.uint8)
    v = np.full((48, 64), 128, np.uint8)
    with VideoEncoder(out, st, audio_from=Path(av_clip), audio_mode=codec,
                      audio_bitrate="96k") as enc:
        for _ in range(5):
            enc.write(y, u, v)
    info = probe_video(out)
    assert info.audio_codec == codec
    assert info.audio_sample_rate == 48000


@pytest.mark.parametrize(
    "codec,sr,ch,expect_sr",
    [
        ("aac", 44100, None, 44100),     # resample down
        ("aac", None, 1, 48000),         # remix stereo -> mono
        ("opus", 44100, None, 48000),    # snaps to the encoder's rate set
        ("flac", 96000, 2, 96000),       # resample up
    ],
)
def test_audio_sample_rate_channel_overrides(av_clip, codec, sr, ch, expect_sr):
    """The reference's -ar/-ac overrides (ffmpeg.py:400-408): the filter
    graph resamples/remixes; rates outside the encoder's supported set snap
    to the nearest (ffmpeg CLI behavior)."""
    res = transcode_audio_packets(av_clip, codec, 128000,
                                  sample_rate=sr, channels=ch)
    assert res is not None
    ctx, pkts, tb = res
    free_audio_ctx(ctx)
    assert tb == (1, expect_sr)
    dur = sum(p[3] for p in pkts) / tb[1]
    assert 0.9 < dur < 1.15


def test_mux_ar_ac_end_to_end(av_clip, tmp_path):
    out = tmp_path / "arac.mp4"
    st = EncoderSettings(codec="mpeg4", width=128, height=96,
                         pix_fmt="yuv420p", fps=Fraction(25))
    y = np.zeros((96, 128), np.uint8)
    u = np.full((48, 64), 128, np.uint8)
    with VideoEncoder(out, st, audio_from=Path(av_clip), audio_mode="aac",
                      audio_bitrate="96k", audio_sample_rate=32000,
                      audio_channels=1) as enc:
        for _ in range(5):
            enc.write(y, u, u)
    info = probe_video(out)
    assert info.audio_codec == "aac"
    assert info.audio_sample_rate == 32000
    assert info.audio_channels == 1


def test_engine_stage_audio_overrides(av_clip, tmp_path):
    """spec.sample_rate/channels flow policy -> executor -> encoder."""
    from lut_renderer_tpu.engine import run_stage
    from lut_renderer_tpu.hostio import probe_video as probe

    info = probe(av_clip)
    out = tmp_path / "eng_arac.mp4"
    spec = build_render_spec(
        Path(av_clip), out,
        ProcessingParams(video_codec="mpeg4", audio_codec="aac",
                         audio_bitrate="96k", sample_rate="32000",
                         channels="1"),
        None, info,
    )
    res = run_stage(spec, info, None)
    assert res.ok, res.error
    oinfo = probe(out)
    assert oinfo.audio_sample_rate == 32000
    assert oinfo.audio_channels == 1


def test_list_encoders_includes_new_set():
    names = set(list_encoders())
    for codec in ("dnxhd", "cfhd", "v210", "mpeg2video", "utvideo",
                  "flac", "alac", "ac3", "mp2", "opus", "vorbis"):
        assert codec in names, codec
    assert "mp3" not in names  # absent from the bundled libs


# ---- policy-level rules ----------------------------------------------------

def _info(bit_depth=8, pix_fmt="yuv420p"):
    return VideoInfo(width=W, height=H, fps=25.0, pix_fmt=pix_fmt,
                     bit_depth=bit_depth, codec_name="prores")


def test_policy_dnxhd_defaults_to_dnxhr_hq(tmp_path):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mov",
        ProcessingParams(video_codec="dnxhd"), None, _info(),
    )
    assert spec.profile == "dnxhr_hq"
    assert spec.pix_fmt == "yuv422p"
    assert any("dnxhr_hq" in n for n in spec.notes)


def test_policy_dnxhd_small_source_warns(tmp_path):
    info = VideoInfo(width=128, height=96, fps=25.0, pix_fmt="yuv420p",
                     bit_depth=8, codec_name="mpeg4")
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mov",
        ProcessingParams(video_codec="dnxhd"), None, info,
    )
    assert any("256x120" in n for n in spec.notes)


def test_policy_dnxhd_10bit_preserve_upgrades_to_hqx(tmp_path):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mov",
        ProcessingParams(video_codec="dnxhd", bit_depth_policy="preserve"),
        None, _info(bit_depth=10, pix_fmt="yuv422p10le"),
    )
    assert spec.profile == "dnxhr_hqx"
    assert spec.pix_fmt == "yuv422p10le"


def test_policy_dnxhd_444_profile_sets_444_fmt(tmp_path):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mov",
        ProcessingParams(video_codec="dnxhd", profile="dnxhr_444"),
        None, _info(),
    )
    assert spec.pix_fmt == "yuv444p10le"


@pytest.mark.parametrize("codec", ["cfhd", "v210"])
def test_policy_10bit_preserve_422_native_codecs(tmp_path, codec):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mov",
        ProcessingParams(video_codec=codec, bit_depth_policy="preserve"),
        None, _info(bit_depth=10, pix_fmt="yuv422p10le"),
    )
    assert spec.pix_fmt == "yuv422p10le"


def test_policy_audio_note_still_names_missing_codec(tmp_path):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mov",
        ProcessingParams(video_codec="mpeg4", audio_codec="mp3"),
        None, _info(),
    )
    assert any("mp3" in n and "COPIED" in n for n in spec.notes)


def test_policy_audio_no_note_for_bundled_codec(tmp_path):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mkv",
        ProcessingParams(video_codec="mpeg4", audio_codec="flac"),
        None, _info(),
    )
    assert not any("COPIED" in n for n in spec.notes)


@pytest.mark.parametrize(
    "out_name,vcodec,acodec,needle",
    [
        ("o.mov", "mpeg4", "flac", "cannot carry flac"),
        ("o.mov", "mpeg4", "opus", "cannot carry opus"),
        ("o.webm", "libvpx", "aac", "cannot carry aac"),
        ("o.webm", "mpeg4", "opus", "WebM only carries VP8/VP9/AV1"),
    ],
)
def test_policy_container_compat_warnings(tmp_path, out_name, vcodec, acodec,
                                          needle):
    spec = build_render_spec(
        Path("in.mov"), tmp_path / out_name,
        ProcessingParams(video_codec=vcodec, audio_codec=acodec),
        None, _info(),
    )
    assert any(needle in n for n in spec.notes), spec.notes


def test_policy_webm_warning_resolves_default_codec(tmp_path):
    """ADVICE r3: a BLANK video codec resolves via the mode template (mpeg4
    on this box — libx264 absent) and still fails webm mux — the preflight
    must name it rather than pass the blank through."""
    spec = build_render_spec(
        Path("in.webm"), tmp_path / "o.webm",
        ProcessingParams(video_codec="", audio_codec="opus"),
        None, _info(),
    )
    assert any("WebM only carries" in n and "mode default" in n
               for n in spec.notes), spec.notes


def test_policy_webm_warning_resolves_copied_audio(tmp_path):
    """ADVICE r3: audio 'copy' carries the SOURCE codec into the muxer; a
    copied AAC track fails webm write_header like an explicit one."""
    info = _info()
    info.audio_codec = "aac"
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.webm",
        ProcessingParams(video_codec="libvpx-vp9", audio_codec="copy"),
        None, info,
    )
    assert any("cannot carry aac" in n and "copied from the source" in n
               for n in spec.notes), spec.notes
    # a copied Opus track is fine — no warning
    info2 = _info()
    info2.audio_codec = "opus"
    spec2 = build_render_spec(
        Path("in.mov"), tmp_path / "o.webm",
        ProcessingParams(video_codec="libvpx-vp9", audio_codec="copy"),
        None, info2,
    )
    assert not any("cannot carry" in n for n in spec2.notes), spec2.notes


def test_policy_channels_note_for_unmappable_count(tmp_path):
    """ADVICE r3: counts with no named layout note the kept source layout;
    newly-added counts (3..8) pass silently."""
    info = _info()
    info.audio_codec = "pcm_s16le"
    spec = build_render_spec(
        Path("in.mov"), tmp_path / "o.mkv",
        ProcessingParams(video_codec="mpeg4", audio_codec="flac",
                         channels="12"),
        None, info,
    )
    assert any("no named layout" in n for n in spec.notes), spec.notes
    spec2 = build_render_spec(
        Path("in.mov"), tmp_path / "o.mkv",
        ProcessingParams(video_codec="mpeg4", audio_codec="flac",
                         channels="3"),
        None, info,
    )
    assert not any("no named layout" in n for n in spec2.notes), spec2.notes


def test_policy_no_compat_warning_for_good_combos(tmp_path):
    for out_name, vcodec, acodec in [
        ("o.mov", "mpeg4", "alac"),
        ("o.mp4", "mpeg4", "flac"),
        ("o.webm", "libvpx", "opus"),
        ("o.mkv", "mpeg4", "opus"),
    ]:
        spec = build_render_spec(
            Path("in.mov"), tmp_path / out_name,
            ProcessingParams(video_codec=vcodec, audio_codec=acodec),
            None, _info(),
        )
        assert not any("Warning: " in n and "carr" in n for n in spec.notes), \
            (out_name, acodec, spec.notes)
