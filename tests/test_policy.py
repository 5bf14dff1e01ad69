"""Policy-engine tests.

The first three tests mirror the reference's smoke test exactly
(src/lut_renderer/smoke.py:15-45); the rest cover the behavioral contract in
SURVEY.md Appendix A.
"""

from pathlib import Path

import pytest

from lut_renderer_tpu.models import ProcessingParams, Task, VideoInfo
from lut_renderer_tpu.plan import (
    StreamcopyFilterError,
    build_master_params,
    build_pipeline,
    build_render_spec,
)

SRC = Path("/in/a.mov")
OUT = Path("/out/a_out.mp4")
LUT = Path("/luts/look.cube")


def spec_for(params=None, lut=LUT, info=None, **kw):
    params = params or ProcessingParams(**kw)
    return build_render_spec(SRC, OUT, params, lut_path=lut, source_info=info)


# ---- reference smoke.py parity ---------------------------------------------

def test_streamcopy_with_lut_raises():
    """smoke.py:21-27 — copy codec + LUT must raise."""
    with pytest.raises(StreamcopyFilterError):
        spec_for(video_codec="copy")


def test_preserve_10bit_x265():
    """smoke.py:29-34 — preserve + 10-bit source + libx265 => yuv420p10le."""
    info = VideoInfo(bit_depth=10, pix_fmt="yuv420p10le")
    spec = spec_for(video_codec="libx265", bit_depth_policy="preserve", info=info)
    assert spec.pix_fmt == "yuv420p10le"


def test_lut_output_tagged_bt709_tv():
    """smoke.py:36-43 — LUT enabled => bt709/bt709/bt709 + tv tags."""
    spec = spec_for()
    t = spec.color_tags
    assert (t.primaries, t.trc, t.colorspace, t.range) == (
        "bt709", "bt709", "bt709", "tv",
    )


# ---- appendix A contract ----------------------------------------------------

def test_prores_gets_422p10le():
    info = VideoInfo(bit_depth=10, pix_fmt="yuv422p10le")
    spec = spec_for(video_codec="prores_ks", info=info)
    assert spec.pix_fmt == "yuv422p10le"


def test_10bit_source_incapable_codec_falls_back():
    info = VideoInfo(bit_depth=10, pix_fmt="yuv420p10le")
    spec = spec_for(video_codec="libx264", info=info)
    assert spec.pix_fmt == "yuv420p"
    assert any("lacks 10-bit" in n for n in spec.notes)


def test_force_8bit():
    info = VideoInfo(bit_depth=10, pix_fmt="yuv420p10le")
    spec = spec_for(video_codec="libx265", bit_depth_policy="force_8bit", info=info)
    assert spec.pix_fmt == "yuv420p"


def test_explicit_pix_fmt_wins_over_policy():
    info = VideoInfo(bit_depth=10, pix_fmt="yuv420p10le")
    spec = spec_for(video_codec="libx265", pix_fmt="yuv444p", info=info)
    assert spec.pix_fmt == "yuv444p"


def test_interp_fallback_unknown():
    spec = spec_for(lut_interp="bogus")
    assert spec.lut_interp == "tetrahedral"


def test_interp_accepted_but_unimplemented_maps_to_tetrahedral():
    """'cubic' is in the reference's accepted list (ffmpeg.py:243) but
    FFmpeg's lut3d rejects it at runtime; here it degrades to tetrahedral
    with a note instead of failing."""
    spec = spec_for(lut_interp="cubic")
    assert spec.lut_interp == "tetrahedral"
    assert any("not implemented natively" in n for n in spec.notes)


def test_interp_pyramid_prism_native():
    for interp in ("pyramid", "prism"):
        assert spec_for(lut_interp=interp).lut_interp == interp


def test_trilinear_kept():
    spec = spec_for(lut_interp="trilinear")
    assert spec.lut_interp == "trilinear"


def test_full_range_normalization_yuvj():
    info = VideoInfo(pix_fmt="yuvj420p", color_range=None)
    spec = spec_for(info=info)
    steps = {f.kind: f for f in spec.filters}
    assert "range_normalize" in steps
    assert steps["range_normalize"].args["out_range"] == "tv"
    assert steps["range_normalize"].args["format"] == "yuv420p"


def test_full_range_normalization_chroma_preserved():
    info = VideoInfo(pix_fmt="yuvj422p", color_range="pc")
    spec = spec_for(info=info)
    step = next(f for f in spec.filters if f.kind == "range_normalize")
    assert step.args["format"] == "yuv422p"


def test_full_range_inherit_keeps_pc():
    info = VideoInfo(pix_fmt="yuvj420p", color_range="pc")
    spec = spec_for(lut_output_tags="inherit", info=info)
    step = next(f for f in spec.filters if f.kind == "range_normalize")
    assert step.args["out_range"] == "pc"


def test_no_range_normalize_for_tv_source():
    info = VideoInfo(pix_fmt="yuv420p", color_range="tv")
    spec = spec_for(info=info)
    assert "range_normalize" not in spec.filter_kinds()


def test_matrix_auto_uses_source_colorspace():
    info = VideoInfo(pix_fmt="yuv420p", colorspace="bt2020nc")
    spec = spec_for(info=info)
    assert spec.lut_input_matrix == "bt2020nc"


def test_matrix_auto_unrecognized_is_none():
    info = VideoInfo(pix_fmt="yuv420p", colorspace="fcc")
    spec = spec_for(info=info)
    assert spec.lut_input_matrix is None


def test_matrix_forced_bt709():
    spec = spec_for(lut_input_matrix="bt709")
    assert spec.lut_input_matrix == "bt709"


def test_matrix_none():
    info = VideoInfo(pix_fmt="yuv420p", colorspace="bt709")
    spec = spec_for(lut_input_matrix="none", info=info)
    assert spec.lut_input_matrix is None


def test_fps_explicit_forces_cfr():
    spec = spec_for(fps="30")
    assert spec.fps_mode == "cfr"
    assert spec.output_fps == "30"
    assert spec.gop == 30


def test_vfr_source_forced_cfr_with_source_rate():
    info = VideoInfo(fps=29.97, avg_fps=29.97, r_fps=60.0, is_vfr=True)
    spec = spec_for(force_cfr=True, info=info)
    assert spec.fps_mode == "cfr"
    assert spec.output_fps == "29.97"


def test_vfr_source_without_force_cfr_passthrough():
    info = VideoInfo(fps=29.97, avg_fps=29.97, r_fps=60.0, is_vfr=True)
    spec = spec_for(force_cfr=False, info=info)
    assert spec.fps_mode == "passthrough"


def test_no_info_force_cfr_conservative():
    spec = spec_for(force_cfr=True, info=None)
    assert spec.fps_mode == "cfr"
    assert spec.output_fps is None


def test_cfr_source_passthrough():
    info = VideoInfo(fps=24.0, avg_fps=24.0, r_fps=24.0, is_vfr=False)
    spec = spec_for(info=info)
    assert spec.fps_mode == "passthrough"


def test_auto_gop_from_source_fps():
    info = VideoInfo(fps=23.976, avg_fps=23.976, r_fps=23.976)
    spec = spec_for(info=info)
    assert spec.gop == 24
    assert any("Auto GOP=24" in n for n in spec.notes)


def test_explicit_gop_wins():
    info = VideoInfo(fps=25.0)
    spec = spec_for(gop="12", info=info)
    assert spec.gop == 12


def test_bitrate_stabilization():
    spec = spec_for(bitrate="8000k")
    assert spec.maxrate == "8000k"
    assert spec.bufsize == "16000k"


def test_bitrate_stabilization_fractional():
    spec = spec_for(bitrate="7.5M")
    assert spec.bufsize == "15M"


def test_no_bitrate_no_stabilization():
    spec = spec_for()
    assert spec.maxrate is None and spec.bufsize is None


def test_lut_output_tags_none():
    spec = spec_for(lut_output_tags="none")
    assert not spec.color_tags.any()


def test_lut_output_tags_unknown_falls_back():
    spec = spec_for(lut_output_tags="wat")
    assert spec.color_tags.range == "tv"
    assert any("fallback" in n for n in spec.notes)


def test_inherit_tags_from_source():
    info = VideoInfo(
        color_primaries="bt2020", color_trc="arib-std-b67",
        colorspace="bt2020nc", color_range="tv",
    )
    spec = spec_for(lut_output_tags="inherit", inherit_color_metadata=True, info=info)
    assert spec.color_tags.primaries == "bt2020"
    assert spec.color_tags.trc == "arib-std-b67"


def test_inherit_disabled_writes_nothing():
    info = VideoInfo(color_primaries="bt2020")
    spec = spec_for(lut_output_tags="inherit", inherit_color_metadata=False, info=info)
    assert not spec.color_tags.any()


def test_no_lut_inherits_source_metadata():
    info = VideoInfo(color_primaries="bt709", colorspace="bt709", color_range="tv")
    spec = spec_for(lut=None, info=info)
    assert spec.color_tags.primaries == "bt709"
    assert spec.lut_path is None
    assert spec.filters == []


def test_dither_step_for_error_diffusion():
    spec = spec_for(zscale_dither="error_diffusion", bit_depth_policy="force_8bit")
    kinds = spec.filter_kinds()
    assert "dither" in kinds
    # dither precedes the final format conversion, mirroring the reference
    # chain order scale -> [zscale dither] -> lut3d? No: reference appends
    # dither then format (ffmpeg.py:304-310) — format is last either way.
    assert kinds.index("dither") < kinds.index("format")


def test_videotoolbox_high_bitrate_note():
    spec = spec_for(video_codec="h264_videotoolbox", bitrate="60000k")
    assert any("hardware H.264" in n.lower() or "cadence" in n for n in spec.notes)


def test_audio_params_only_when_encoding_audio():
    spec = spec_for(audio_codec="copy", audio_bitrate="192k")
    assert spec.audio_bitrate is None
    spec = spec_for(audio_codec="aac", audio_bitrate="192k")
    assert spec.audio_bitrate == "192k"


def test_notes_accumulate_into_caller_list():
    notes = ["pre-existing"]
    build_render_spec(SRC, OUT, ProcessingParams(), lut_path=LUT, notes=notes)
    assert notes[0] == "pre-existing" and len(notes) > 1


# ---- pipeline builder -------------------------------------------------------

def _task(mode="fast", intermediate=None):
    return Task(
        task_id="t1",
        source_path=SRC,
        output_path=OUT,
        lut_path=LUT,
        cover_path=None,
        params=ProcessingParams(processing_mode=mode),
        intermediate_path=intermediate,
    )


def test_fast_pipeline_single_stage():
    stages = build_pipeline(_task())
    assert len(stages) == 1
    s = stages[0]
    assert s.lut_path == LUT and not s.cleanup_on_success and not s.probe_source


def test_pro_pipeline_two_stages():
    stages = build_pipeline(_task("pro", Path("/tmp/a_master.mov")))
    assert len(stages) == 2
    master, dist = stages
    assert master.params.video_codec == "prores_ks"
    assert master.params.pix_fmt == "yuv422p10le"
    assert master.params.profile == "3"
    assert master.params.audio_codec == "copy"
    assert master.cleanup_on_success and master.lut_path == LUT
    assert dist.lut_path is None and dist.probe_source
    assert dist.source_path == master.output_path


def test_pro_without_intermediate_raises():
    with pytest.raises(ValueError):
        build_pipeline(_task("pro", None))


def test_master_params_resets_rate_controls():
    p = ProcessingParams(bitrate="10M", crf="18", preset="slow", faststart=True)
    m = build_master_params(p)
    assert m.bitrate == "" and m.crf == "" and m.preset == "" and not m.faststart
    assert m.bit_depth_policy == "preserve"


def test_master_spec_end_to_end():
    """Master stage through the policy engine: no bitrate caps, 10-bit kept."""
    info = VideoInfo(bit_depth=10, pix_fmt="yuv422p10le", fps=25.0)
    task = _task("pro", Path("/tmp/m.mov"))
    master = build_pipeline(task)[0]
    spec = build_render_spec(
        master.source_path, master.output_path, master.params,
        lut_path=master.lut_path, source_info=info, notes=master.notes,
    )
    assert spec.pix_fmt == "yuv422p10le"
    assert spec.maxrate is None
    assert spec.color_tags.range == "tv"  # LUT => bt709 tagging on master too


def test_mp3_audio_degradation_note():
    """The reference offers aac/mp3/copy with no preflight; mp3 is absent
    from the bundled libs, so the policy names the copy fallback up front
    (degradation-notes honesty), while aac stays silent."""
    notes = []
    p = ProcessingParams(video_codec="mpeg4", audio_codec="mp3")
    build_render_spec(Path("a.mp4"), Path("b.mp4"), p, notes=notes)
    assert any("mp3" in n and "COPIED" in n for n in notes), notes
    notes = []
    p = ProcessingParams(video_codec="mpeg4", audio_codec="aac")
    build_render_spec(Path("a.mp4"), Path("b.mp4"), p, notes=notes)
    assert not any("COPIED" in n for n in notes), notes
