"""Differential fuzz: our policy engine vs the reference's REAL command builder.

The strongest possible parity oracle for the planning layer: import the
reference's own `build_command` (src/lut_renderer/ffmpeg.py:179-414) from the
read-only checkout, feed the SAME randomized ProcessingParams + VideoInfo into
both builders, parse the reference argv back into semantic decisions, and
assert our RenderSpec made the same call on every axis:

  pix_fmt / fps_mode / -r / auto-GOP / maxrate+bufsize strings / crf / preset /
  tune / profile / level / threads / color tags / faststart / audio opts /
  the -vf chain (range normalization + matrix + lut3d interp + dither +
  output format) / the streamcopy+filters hard error / pro-mode master params.

Documented intentional deltas (each asserted in its adjusted form rather than
skipped silently):

  * interp "cubic": the reference passes it through and FFmpeg's lut3d then
    rejects it at runtime; we degrade to tetrahedral at plan time
    (plan/policy.py KERNEL_INTERP).
  * params.gop that doesn't parse as a number: the reference emits the raw
    string (FFmpeg later errors); we validate to None at plan time.
  * codecs outside the reference's menu (dnxhd/cfhd/v210...) have extended
    policy here (10-bit set, profile defaulting) — excluded from the fuzz
    pool; covered by tests/test_encoders_ext.py instead.

The test is skipped when /root/reference is not present (it is an oracle for
development parity, not a runtime dependency).
"""

from __future__ import annotations

import importlib
import random
import sys
from pathlib import Path

import pytest

from lut_renderer_tpu.models import ProcessingParams, VideoInfo
from lut_renderer_tpu.plan.pipeline import build_master_params
from lut_renderer_tpu.plan.policy import (
    StreamcopyFilterError,
    build_render_spec,
)

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not (REF_SRC / "lut_renderer" / "ffmpeg.py").exists(),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference package headlessly (ffmpeg/models/media_info only)."""
    sys.path.insert(0, str(REF_SRC))
    try:
        mod = importlib.import_module("lut_renderer.ffmpeg")
        models = importlib.import_module("lut_renderer.models")
        media = importlib.import_module("lut_renderer.media_info")
    finally:
        sys.path.remove(str(REF_SRC))
    return mod, models, media


# ---------------------------------------------------------------------------
# semantic extraction
# ---------------------------------------------------------------------------


def _opt(cmd, flag):
    return cmd[cmd.index(flag) + 1] if flag in cmd else None


def _parse_vf(vf):
    """Reference -vf chain -> {range_norm, matrix, interp, dither_ed, out_format}."""
    sem = {
        "range_norm": None,  # {"out_range","intermediate"} when full-range scale
        "matrix": None,
        "interp": None,
        "dither_ed": False,
        "out_format": None,
    }
    if not vf:
        return sem
    steps = vf.split(",")
    i = 0
    while i < len(steps):
        step = steps[i]
        if step.startswith("scale="):
            kv = dict(p.split("=", 1) for p in step[len("scale="):].split(":"))
            if "in_range" in kv:
                intermediate = None
                if i + 1 < len(steps) and steps[i + 1].startswith("format="):
                    intermediate = steps[i + 1][len("format="):]
                    i += 1
                sem["range_norm"] = {
                    "out_range": kv.get("out_range"),
                    "intermediate": intermediate,
                }
            if "in_color_matrix" in kv:
                assert kv.get("in_color_matrix") == kv.get("out_color_matrix")
                sem["matrix"] = kv["in_color_matrix"]
        elif step.startswith("lut3d="):
            kv = dict(
                p.split("=", 1) for p in step[len("lut3d="):].split(":")
            )
            sem["interp"] = kv.get("interp")
        elif step == "zscale=dither=error_diffusion":
            sem["dither_ed"] = True
        elif step.startswith("format="):
            sem["out_format"] = step[len("format="):]
        else:  # pragma: no cover - unknown filter would be a parity bug itself
            raise AssertionError(f"unparsed reference filter step: {step}")
        i += 1
    return sem


def ref_semantics(cmd):
    sem = {
        "overwrite": "-y" in cmd,
        "vcodec": _opt(cmd, "-c:v"),
        "acodec": _opt(cmd, "-c:a"),
        "fps_mode": _opt(cmd, "-fps_mode"),
        "r": _opt(cmd, "-r"),
        "pix_fmt": _opt(cmd, "-pix_fmt"),
        "resolution": _opt(cmd, "-s"),
        "bitrate": _opt(cmd, "-b:v"),
        "maxrate": _opt(cmd, "-maxrate"),
        "bufsize": _opt(cmd, "-bufsize"),
        "crf": _opt(cmd, "-crf"),
        "preset": _opt(cmd, "-preset"),
        "tune": _opt(cmd, "-tune"),
        "gop": _opt(cmd, "-g"),
        "profile": _opt(cmd, "-profile:v"),
        "level": _opt(cmd, "-level"),
        "threads": _opt(cmd, "-threads"),
        "tags": (
            _opt(cmd, "-color_primaries"),
            _opt(cmd, "-color_trc"),
            _opt(cmd, "-colorspace"),
            _opt(cmd, "-color_range"),
        ),
        "faststart": _opt(cmd, "-movflags") == "+faststart",
        "audio_bitrate": _opt(cmd, "-b:a"),
        "sample_rate": _opt(cmd, "-ar"),
        "channels": _opt(cmd, "-ac"),
    }
    sem.update(_parse_vf(_opt(cmd, "-vf")))
    return sem


def spec_semantics(spec, params):
    """Our RenderSpec -> the same semantic dict (argv-free)."""
    steps = {f.kind: f.args for f in spec.filters}
    has_lut = "lut3d" in steps
    range_norm = None
    if "range_normalize" in steps:
        range_norm = {
            "out_range": steps["range_normalize"]["out_range"],
            "intermediate": steps["range_normalize"]["format"],
        }
    dither = steps.get("dither", {}).get("mode")
    encode_side = bool(params.video_codec and params.video_codec != "copy")
    return {
        "overwrite": spec.overwrite,
        "vcodec": params.video_codec or None,
        "acodec": params.audio_codec or None,
        # the reference always emits -fps_mode on the encode side; we store
        # the same two-valued decision
        "fps_mode": spec.fps_mode if encode_side else None,
        "r": spec.output_fps if encode_side else None,
        "pix_fmt": spec.pix_fmt if encode_side else None,
        "resolution": spec.resolution if encode_side else None,
        "bitrate": spec.bitrate if encode_side else None,
        "maxrate": spec.maxrate if encode_side else None,
        "bufsize": spec.bufsize if encode_side else None,
        "crf": spec.crf if encode_side else None,
        "preset": spec.preset if encode_side else None,
        "tune": spec.tune if encode_side else None,
        "gop": str(spec.gop) if (encode_side and spec.gop is not None) else None,
        "profile": spec.profile if encode_side else None,
        "level": spec.level if encode_side else None,
        "threads": spec.threads if encode_side else None,
        "tags": (
            spec.color_tags.primaries,
            spec.color_tags.trc,
            spec.color_tags.colorspace,
            spec.color_tags.range,
        ),
        "faststart": spec.faststart,
        "audio_bitrate": spec.audio_bitrate,
        "sample_rate": spec.sample_rate,
        "channels": spec.channels,
        "range_norm": range_norm,
        "matrix": spec.lut_input_matrix if has_lut else None,
        "interp": spec.lut_interp if has_lut else None,
        "dither_ed": dither == "error_diffusion",
        "out_format": steps.get("format", {}).get("pix_fmt")
        if (has_lut and "format" in steps)
        else None,
    }


def _apply_documented_deltas(rsem, params):
    """Adjust the reference semantics for the intentional plan-time deltas."""
    if rsem["interp"] == "cubic":
        rsem["interp"] = "tetrahedral"
    if rsem["gop"] is not None:
        # ours validates gop through int(float(.)); the reference passes the
        # raw string. Normalize both to the numeric form when parseable.
        try:
            rsem["gop"] = str(int(float(rsem["gop"])))
        except ValueError:
            rsem["gop"] = None
    return rsem


# ---------------------------------------------------------------------------
# fuzz input generation
# ---------------------------------------------------------------------------

_VIDEO_CODECS = ["", "copy", "libx264", "libx265", "prores_ks", "mpeg4",
                 "libvpx-vp9", "h264_videotoolbox", "hevc_videotoolbox"]
_AUDIO_CODECS = ["", "copy", "aac", "mp3", "flac", "opus"]
_FPS = ["", "25", "30000/1001", "23.976", "60", "0/0", "abc"]
_BITRATES = ["", "8M", "3.5M", "800k", "50M", "0", "12", "abc", " 6M "]
_PIXFMTS = ["", "yuv420p", "yuv422p10le", "yuv444p"]
_INTERP = ["", "tetrahedral", "trilinear", "nearest", "pyramid", "prism",
           "cubic", "garbage"]
_TAGS = ["", "bt709", "inherit", "none", "BT709 ", "weird"]
_MATRIX = ["", "auto", "bt709", "none", "bt2020nc", "smpte170m", "junk",
           " BT470BG "]
_DITHER = ["none", "error_diffusion"]
_GOPS = ["", "12", "48.0", "abc", "250"]


def _random_params(rng: random.Random) -> dict:
    return dict(
        video_codec=rng.choice(_VIDEO_CODECS),
        audio_codec=rng.choice(_AUDIO_CODECS),
        pix_fmt=rng.choice(_PIXFMTS),
        resolution=rng.choice(["", "1920x1080", "3840x2160"]),
        bitrate=rng.choice(_BITRATES),
        fps=rng.choice(_FPS),
        crf=rng.choice(["", "18", "23", "35"]),
        preset=rng.choice(["", "slow", "veryfast"]),
        tune=rng.choice(["", "film"]),
        gop=rng.choice(_GOPS),
        profile=rng.choice(["", "3", "high"]),
        level=rng.choice(["", "4.1"]),
        threads=rng.choice(["", "4"]),
        audio_bitrate=rng.choice(["", "192k", "320k"]),
        sample_rate=rng.choice(["", "44100", "48000"]),
        channels=rng.choice(["", "2", "6"]),
        faststart=rng.random() < 0.5,
        overwrite=rng.random() < 0.8,
        bit_depth_policy=rng.choice(["preserve", "auto", "force_8bit"]),
        force_cfr=rng.random() < 0.5,
        inherit_color_metadata=rng.random() < 0.5,
        lut_interp=rng.choice(_INTERP),
        zscale_dither=rng.choice(_DITHER),
        lut_input_matrix=rng.choice(_MATRIX),
        lut_output_tags=rng.choice(_TAGS),
    )


def _random_info(rng: random.Random):
    """One shared kwargs dict for both VideoInfo classes, or None."""
    shape = rng.randrange(6)
    if shape == 0:
        return None
    kw = dict(width=3840, height=2160)
    kw["pix_fmt"] = rng.choice(
        ["yuv420p", "yuvj420p", "yuv422p10le", "yuvj444p", "yuv444p12le", None]
    )
    kw["color_range"] = rng.choice([None, "tv", "pc", "PC "])
    kw["colorspace"] = rng.choice(
        [None, "bt709", "bt2020nc", "smpte170m", "reserved", "BT470BG"]
    )
    kw["color_primaries"] = rng.choice([None, "bt709", "bt2020"])
    kw["color_trc"] = rng.choice([None, "bt709", "arib-std-b67"])
    kw["fps"] = rng.choice([None, 25.0, 29.97002997, 59.94, 23.976])
    kw["is_vfr"] = rng.random() < 0.4
    kw["bit_depth"] = {"yuv420p": 8, "yuvj420p": 8, "yuv422p10le": 10,
                       "yuvj444p": 8, "yuv444p12le": 12, None: None}[kw["pix_fmt"]]
    kw["bitrate"] = rng.choice([None, "60000k", "120M"])
    return kw


def _build_both(ref, params_dict, info_kw, lut: bool, tmp_path):
    ref_ffmpeg, ref_models, ref_media = ref
    rp = ref_models.ProcessingParams(**params_dict)
    op = ProcessingParams(**params_dict)
    ri = ref_media.VideoInfo(**info_kw) if info_kw else None
    oi = VideoInfo(**info_kw) if info_kw else None
    lut_path = (tmp_path / "look.cube") if lut else None
    src = tmp_path / "in.mov"
    out = tmp_path / "out.mov"

    ref_err = our_err = None
    cmd = spec = None
    try:
        cmd = ref_ffmpeg.build_command(
            src, out, rp, lut_path=lut_path, source_info=ri
        )
    except ValueError as e:
        ref_err = e
    try:
        spec = build_render_spec(src, out, op, lut_path=lut_path, source_info=oi)
    except StreamcopyFilterError as e:
        our_err = e
    return cmd, spec, ref_err, our_err, op


def _check_case(ref, params_dict, info_kw, lut, tmp_path):
    cmd, spec, ref_err, our_err, op = _build_both(
        ref, params_dict, info_kw, lut, tmp_path
    )
    ctx = f"params={params_dict}\ninfo={info_kw}\nlut={lut}"
    assert (ref_err is None) == (our_err is None), (
        f"error-path divergence: ref={ref_err} ours={our_err}\n{ctx}"
    )
    if ref_err is not None:
        return
    rsem = _apply_documented_deltas(ref_semantics(cmd), op)
    osem = spec_semantics(spec, op)
    for key in rsem:
        assert osem[key] == rsem[key], (
            f"decision divergence on '{key}': ref={rsem[key]!r} "
            f"ours={osem[key]!r}\nref argv: {cmd}\n{ctx}"
        )


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_differential_fuzz(ref, tmp_path):
    rng = random.Random(0xC0FFEE)
    for case in range(600):
        params_dict = _random_params(rng)
        info_kw = _random_info(rng)
        lut = rng.random() < 0.7
        _check_case(ref, params_dict, info_kw, lut, tmp_path)


def test_differential_corpus(ref, tmp_path):
    """Hand-picked tricky combos (kept explicit for fast repro on failure)."""
    cases = [
        # full-range source + inherit tags + matrix auto on a whitelisted csp
        (dict(video_codec="libx264", lut_output_tags="inherit",
              lut_input_matrix="auto", bit_depth_policy="preserve"),
         dict(pix_fmt="yuvj420p", color_range="pc", colorspace="bt470bg",
              bit_depth=8, fps=25.0, is_vfr=False), True),
        # 10-bit source + prores => 422p10le + auto GOP from fractional fps
        (dict(video_codec="prores_ks", bit_depth_policy="preserve", fps=""),
         dict(pix_fmt="yuv422p10le", bit_depth=10, fps=29.97002997,
              is_vfr=True), True),
        # VFR + force_cfr without known rate
        (dict(video_codec="mpeg4", force_cfr=True),
         dict(pix_fmt="yuv420p", bit_depth=8, fps=None, is_vfr=True), True),
        # force_cfr with no probe at all
        (dict(video_codec="mpeg4", force_cfr=True), None, True),
        # streamcopy + LUT => both raise
        (dict(video_codec="copy"), None, True),
        # streamcopy without LUT => no encode-side options at all
        (dict(video_codec="copy", crf="23", gop="12", faststart=True),
         dict(pix_fmt="yuv420p", bit_depth=8, fps=25.0), False),
        # dither without LUT (pix_fmt forced): zscale only, no format step
        (dict(video_codec="libx264", pix_fmt="yuv420p",
              zscale_dither="error_diffusion"), None, False),
        # junk tag policy => bt709 fallback tags
        (dict(video_codec="libx264", lut_output_tags="weird"), None, True),
        # explicit matrix name policy, full-range 444 source
        (dict(video_codec="libx264", lut_input_matrix="bt2020nc",
              lut_output_tags="none"),
         dict(pix_fmt="yuvj444p", color_range="pc", bit_depth=8), True),
        # bitrate with fractional maxrate scaling
        (dict(video_codec="libx264", bitrate="3.5M"), None, True),
    ]
    for params_over, info_kw, lut in cases:
        params_dict = _random_params(random.Random(1))
        params_dict.update(params_over)
        _check_case(ref, params_dict, info_kw, lut, tmp_path)


def test_probe_derivation_rules_differential(ref):
    """Probe derivation helpers vs the reference's media_info internals.

    The reference's `probe_video` shells out to an ffprobe binary we don't
    have, but the pure derivation rules it applies to the raw strings are
    importable — fuzz them directly (media_info.py:85-110 fraction parse,
    77-83 color normalize, 86-110 bit-depth inference, 138 VFR rule,
    161-167 kbps formatting).
    """
    from lut_renderer_tpu.models.video_info import (
        detect_vfr,
        infer_bit_depth,
        kbps_string,
        normalize_color,
        parse_fraction,
    )

    ref_media = ref[2]
    rng = random.Random(42)
    fractions = ["", "0/0", "30000/1001", "25", "23.976", "x/y", "1/0",
                 " 24000/1001 ", "60", "abc", "5/2/1", "-30/1", "1e3"]
    for v in fractions:
        assert parse_fraction(v) == ref_media._parse_fraction(v), v
    colors = [None, "", "unknown", "Unspecified", "UNKNOWN/UNKNOWN", "bt709",
              " bt2020nc ", "reserved", "pc"]
    for v in colors:
        assert normalize_color(v) == ref_media._normalize_color(v), v
    pix_fmts = [None, "", "yuv420p", "yuv420p10le", "yuv422p10le",
                "yuv444p12le", "yuvj420p", "gbrp16le", "rgb24", "p010le",
                "yuv420p9", "nv12", "monob", "yuva444p10le", "gray10le"]
    bits_raw = [None, "", "10", "8.0", "0", "-2", "abc", "12"]
    for pf in pix_fmts:
        for br in bits_raw:
            assert infer_bit_depth(pf, br) == ref_media._infer_bit_depth(pf, br), (
                pf, br)
    for _ in range(200):
        avg = rng.choice([None, 0.0, 23.976, 25.0, 29.97, 59.94,
                          rng.uniform(1, 120)])
        r = rng.choice([None, 0.0, 24.0, 25.0, 30.0, rng.uniform(1, 120)])
        assert detect_vfr(avg, r) == bool(
            avg and r and abs(avg - r) > ref_media._FPS_EPSILON
        ), (avg, r)
    # kbps formatting rule as written inline in probe_video (161-167)
    for raw in ["", None, "0", "999", "1000", "1499", "1500", "60000000",
                "abc", "8.5e6", "-5"]:
        if raw in ("", None, "abc"):
            expect = None
        else:
            bits = int(float(raw))
            expect = f"{max(1, round(bits / 1000))}k" if bits > 0 else None
        assert kbps_string(raw) == expect, raw


def test_master_params_differential(ref):
    """Pro-mode master params: field-for-field against the reference."""
    _, ref_models, _ = ref
    ref_ffmpeg = ref[0]
    rng = random.Random(7)
    for _ in range(50):
        d = _random_params(rng)
        ours = build_master_params(ProcessingParams(**d)).to_dict()
        theirs = ref_ffmpeg._build_master_params(
            ref_models.ProcessingParams(**d)
        ).to_dict()
        assert ours == theirs
