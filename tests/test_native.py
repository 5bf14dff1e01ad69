"""Native C++ helpers: cube parser parity, error-diffusion quality, engine
integration of the exact-dither path."""

import numpy as np
import pytest

from lut_renderer_tpu.colorcore import Lut3D, parse_cube, parse_cube_file, write_cube_file
from lut_renderer_tpu.colorcore.cube import CubeParseError
from lut_renderer_tpu.native_ext import (
    error_diffusion_quantize,
    native_available,
    parse_cube_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


@needs_native
def test_native_parse_matches_python(tmp_path, random_lut):
    path = write_cube_file(tmp_path / "x.cube", random_lut)
    table, dmin, dmax = parse_cube_native(path)
    np.testing.assert_allclose(table, random_lut.table, atol=1e-5)
    np.testing.assert_allclose(dmin, [0, 0, 0])
    np.testing.assert_allclose(dmax, [1, 1, 1])


@needs_native
def test_native_parse_domain(tmp_path):
    lut = Lut3D.identity(3)
    lut.domain_min = np.array([0.0, 0.1, 0.2], np.float32)
    lut.domain_max = np.array([0.9, 1.0, 2.0], np.float32)
    path = write_cube_file(tmp_path / "d.cube", lut)
    table, dmin, dmax = parse_cube_native(path)
    np.testing.assert_allclose(dmin, [0.0, 0.1, 0.2], atol=1e-6)
    np.testing.assert_allclose(dmax, [0.9, 1.0, 2.0], atol=1e-6)


@needs_native
def test_native_parse_errors(tmp_path):
    bad = tmp_path / "bad.cube"
    bad.write_text("LUT_3D_SIZE 2\n0 0 0\n")
    with pytest.raises(CubeParseError):
        parse_cube_native(bad)
    one_d = tmp_path / "1d.cube"
    one_d.write_text("LUT_1D_SIZE 2\n0\n1\n")
    with pytest.raises(CubeParseError):
        parse_cube_native(one_d)
    with pytest.raises(FileNotFoundError):
        parse_cube_native(tmp_path / "missing.cube")


@needs_native
def test_parse_cube_file_uses_native_transparently(tmp_path, random_lut):
    """Public parse_cube_file gives identical tables either path."""
    path = write_cube_file(tmp_path / "y.cube", random_lut)
    via_file = parse_cube_file(path)
    via_python = parse_cube(path.read_text())
    np.testing.assert_allclose(via_file.table, via_python.table, atol=1e-6)


@needs_native
def test_error_diffusion_mean_preservation():
    x = np.full((128, 128), 57.42, np.float32)
    q = error_diffusion_quantize(x, 8)
    assert q.dtype == np.uint8
    assert abs(float(q.astype(float).mean()) - 57.42) < 0.01
    assert set(np.unique(q)).issubset({57, 58})


@needs_native
def test_error_diffusion_beats_plain_rounding_on_gradients():
    """The banding metric: per-column mean error on a shallow ramp."""
    ramp = np.linspace(20.0, 22.0, 512)[None, :].repeat(128, 0).astype(np.float32)
    ed = error_diffusion_quantize(ramp, 8).astype(float)
    plain = np.floor(ramp + 0.5)
    ed_err = np.abs(ed.mean(axis=0) - ramp[0]).mean()
    plain_err = np.abs(plain.mean(axis=0) - ramp[0]).mean()
    assert ed_err < 0.06
    assert ed_err < plain_err / 3


@needs_native
def test_error_diffusion_fx_matches_float_recurrence():
    """The fixed-point fast path is FS with 1/4096-code input resolution:
    vs the float recurrence, pixels toggle by at most one code value at a
    low rate and the diffused mean is identical (error conserved exactly)."""
    rng = np.random.default_rng(7)
    x = np.clip(
        np.linspace(0, 255, 512, dtype=np.float32)[None, :]
        + rng.normal(0, 0.4, (96, 512)).astype(np.float32),
        0, 255,
    )
    fx = error_diffusion_quantize(x, 8).astype(int)
    fl = error_diffusion_quantize(x, 8, exact_float=True).astype(int)
    d = fx - fl
    assert np.abs(d).max() <= 1
    assert (d != 0).mean() < 0.25
    assert abs(fx.mean() - x.mean()) < 0.01
    assert abs(fl.mean() - x.mean()) < 0.01


@needs_native
def test_error_diffusion_fx_saturation_and_odd_shapes():
    """Out-of-range inputs clamp with correct error bookkeeping; the
    register-carried row epilogues cover every error slot at any width."""
    xs = np.array(
        [[-3.0, 0.2, 254.9, 258.0, 300.0, -50.0, 12.5, 255.0]], np.float32
    ).repeat(5, 0)
    q = error_diffusion_quantize(xs, 8)
    assert q.min() == 0 and q.max() == 255
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (2, 3), (3, 5), (7, 2), (5, 257)]:
        xo = rng.uniform(0, 255, shape).astype(np.float32)
        qo = error_diffusion_quantize(xo, 8)
        assert qo.shape == shape
        assert 0 <= qo.min() and qo.max() <= 255
        # mean preservation within the edge-loss bound for tiny planes
        assert abs(qo.astype(float).mean() - xo.mean()) < 2.0


@needs_native
def test_error_diffusion_10bit():
    x = np.full((64, 64), 800.3, np.float32)
    q = error_diffusion_quantize(x, 10)
    assert q.dtype == np.uint16
    assert abs(float(q.astype(float).mean()) - 800.3) < 0.02


@needs_native
def test_engine_exact_dither_path(tmp_path):
    from pathlib import Path

    from lut_renderer_tpu.engine import run_stage
    from lut_renderer_tpu.engine.config import derive_render_config
    from lut_renderer_tpu.hostio import probe_video
    from lut_renderer_tpu.models import ProcessingParams
    from lut_renderer_tpu.plan import build_render_spec
    from lut_renderer_tpu.utils.fixtures import make_gradient_clip

    clip = make_gradient_clip(tmp_path / "c.mp4", 64, 64, frames=6)
    info = probe_video(clip)
    out = tmp_path / "ed.mp4"
    spec = build_render_spec(
        Path(clip), out,
        ProcessingParams(video_codec="mpeg4",
                         zscale_dither="error_diffusion",
                         bit_depth_policy="force_8bit"),
        None, info,
    )
    cfg = derive_render_config(spec, info)
    assert cfg.dither == "error_diffusion_host"
    res = run_stage(spec, info, None)
    assert res.ok, res.error
    assert probe_video(out).nb_frames == 6
