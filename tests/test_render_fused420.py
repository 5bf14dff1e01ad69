"""Fully-fused 420->420 kernel (ops.fused420): equivalence vs the plain
XLA layout, for every production tier / depth / range / dither / interp.

The fused kernel runs the same scalar ops on the same values as the plain
pipeline, but as one compiled unit — the compiler may contract mul+add
into FMA differently than the op-by-op path (the environment pins
--xla_allow_excess_precision=true), so the contract is max |d| <= 1 output
code value at a tiny pixel rate (measured ~1e-4 under interpret on CPU,
~1e-5 on the chip — experiments/r5_fused_yuv.py), far inside every tier's
dE76 budget. The bound is asserted here exactly as documented in PARITY.md.
"""

import numpy as np
import pytest
from dataclasses import replace

import jax.numpy as jnp

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.fused420 import (
    _hash_offsets_row,
    _lane_chunk,
    fused420_applicable,
)
from lut_renderer_tpu.ops.pixel import hash_noise_offsets_jnp
from lut_renderer_tpu.ops.render import (
    RenderConfig,
    _fused420_applicable,
    render_yuv_frame,
)


@pytest.fixture(scope="module")
def prep():
    rng = np.random.default_rng(3)
    lut = Lut3D.identity(17)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.05, 0.05, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


@pytest.fixture(scope="module")
def prep65():
    rng = np.random.default_rng(5)
    lut = Lut3D.identity(65)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.03, 0.03, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


def _planes(rng, b, h, w, depth, in_sub="420"):
    hi = (1 << depth) - 1
    dt = np.uint16 if depth > 8 else np.uint8
    hc = h // 2 if in_sub == "420" else h
    wc = w // 2 if in_sub in ("420", "422") else w
    shape_y = (b, h, w) if b else (h, w)
    shape_c = (b, hc, wc) if b else (hc, wc)
    y = rng.integers(0, hi + 1, shape_y).astype(dt)
    u = rng.integers(0, hi + 1, shape_c).astype(dt)
    v = rng.integers(0, hi + 1, shape_c).astype(dt)
    return y, u, v


def _assert_fused_equals_plain(prep, cfg, b=2, h=32, w=128):
    rng = np.random.default_rng(7)
    y, u, v = _planes(rng, b, h, w, cfg.in_depth, cfg.in_subsampling)
    fused_cfg = replace(cfg, phase_layout="fused")
    assert _fused420_applicable(jnp.asarray(y), jnp.asarray(u), fused_cfg,
                                prep)
    got = render_yuv_frame(y, u, v, prep, fused_cfg, interpret=True)
    want = render_yuv_frame(y, u, v, prep, replace(cfg, phase_layout="plain"),
                            interpret=True)
    for name, a, e in zip("yuv", got, want):
        assert a.shape == e.shape and a.dtype == e.dtype, (cfg, name)
        d = np.abs(np.asarray(a).astype(np.int64)
                   - np.asarray(e).astype(np.int64))
        assert d.max() <= 1, f"plane {name} max|d|={d.max()} cfg={cfg}"
        frac = float(np.mean(d > 0))
        assert frac <= 0.002, f"plane {name} frac|d|>0={frac} cfg={cfg}"


@pytest.mark.parametrize("tier", ["int8_lite", "int8_fast", "fast", "exact"])
def test_fused_matches_plain_tiers(prep, tier):
    _assert_fused_equals_plain(
        prep, RenderConfig(lut_precision=tier, dither="ordered"))


@pytest.mark.parametrize("dither", ["none", "ordered", "random"])
def test_fused_matches_plain_dithers(prep, dither):
    _assert_fused_equals_plain(prep, RenderConfig(dither=dither))


@pytest.mark.parametrize("interp", ["nearest", "trilinear", "tetrahedral",
                                    "pyramid", "prism"])
def test_fused_matches_plain_interps(prep, interp):
    _assert_fused_equals_plain(prep, RenderConfig(interp=interp))


def test_fused_matches_plain_10bit_full_range(prep):
    _assert_fused_equals_plain(prep, RenderConfig(
        in_depth=10, out_depth=10, in_full_range=True,
        work_full_range=False, out_full_range=False, dither="ordered"))


def test_fused_matches_plain_depth_change(prep):
    _assert_fused_equals_plain(prep, RenderConfig(
        in_depth=10, out_depth=8, dither="random"))


def test_fused_matches_plain_unbatched(prep):
    _assert_fused_equals_plain(prep, RenderConfig(), b=0)


# ---- generalized geometries (round 4): the pro-mastering 422p10le class ----

def test_fused_matches_plain_422in_422out_10bit(prep):
    """Stage-1 pro master geometry: 422p10 source -> yuv422p10le master."""
    _assert_fused_equals_plain(prep, RenderConfig(
        in_depth=10, out_depth=10, in_subsampling="422",
        out_subsampling="422"))


def test_fused_matches_plain_422in_420out_dither(prep):
    """Stage-2 distribution geometry: 422p10le master -> 420p8 + dither."""
    _assert_fused_equals_plain(prep, RenderConfig(
        in_depth=10, out_depth=8, in_subsampling="422",
        out_subsampling="420", dither="ordered"))


def test_fused_matches_plain_420in_422out(prep):
    """420 source mastered to 422p10le (the reference forces the master's
    pix_fmt regardless of source subsampling, ffmpeg.py:419-421)."""
    _assert_fused_equals_plain(prep, RenderConfig(
        in_depth=8, out_depth=10, in_subsampling="420",
        out_subsampling="422", dither="random"))


def test_fused_matches_plain_444_roundtrip(prep):
    _assert_fused_equals_plain(prep, RenderConfig(
        in_subsampling="444", out_subsampling="444", dither="ordered"))


def test_fused_matches_plain_420in_444out(prep):
    _assert_fused_equals_plain(prep, RenderConfig(
        in_subsampling="420", out_subsampling="444"))


def test_fused_matches_plain_444in_420out(prep):
    _assert_fused_equals_plain(prep, RenderConfig(
        in_subsampling="444", out_subsampling="420"))


def test_fused_pad_and_crop_dci_width(prep):
    """Non-128-multiple width (the DCI 3996/1998 class, VERDICT r3 #4):
    stays on the fused path via edge pad + crop, same parity contract."""
    _assert_fused_equals_plain(prep, RenderConfig(dither="ordered"),
                               b=1, h=16, w=160)
    _assert_fused_equals_plain(prep, RenderConfig(
        in_depth=10, out_depth=10, in_subsampling="422",
        out_subsampling="422", dither="random"), b=1, h=16, w=160)


def test_fused_matches_plain_coarse2(prep65):
    _assert_fused_equals_plain(
        prep65, RenderConfig(lut_precision="coarse2f"), b=1, h=16, w=128)


def test_fused_matches_plain_65cube_lite(prep65):
    _assert_fused_equals_plain(
        prep65, RenderConfig(lut_precision="int8_lite"), b=1, h=16, w=128)


def test_auto_prefers_fused_when_applicable(prep):
    y = jnp.zeros((2, 32, 128), jnp.uint8)
    u = jnp.zeros((2, 16, 64), jnp.uint8)
    cfg = RenderConfig()
    assert _fused420_applicable(y, u, cfg, prep)
    # non-lane-aligned widths now pad-and-crop INSIDE the fused kernel
    # (DCI 3996/1998-class frames stay fused)
    y2 = jnp.zeros((2, 32, 64), jnp.uint8)
    u2 = jnp.zeros((2, 16, 32), jnp.uint8)
    assert _fused420_applicable(y2, u2, cfg, prep)
    # error-diffusion host output needs float planes -> not fused
    assert not fused420_applicable(
        y, u, replace(cfg, dither="error_diffusion_host"), prep)
    # no LUT -> nothing for the kernel to do
    assert not fused420_applicable(y, u, cfg, None)
    # gather strategy (CPU-exact path) stays in XLA
    assert not fused420_applicable(
        y, u, replace(cfg, lut_strategy="gather"), prep)
    # forcing rowphase/plain disables it
    assert not _fused420_applicable(
        y, u, replace(cfg, phase_layout="rowphase"), prep)
    assert not _fused420_applicable(
        y, u, replace(cfg, phase_layout="plain"), prep)
    with pytest.raises(ValueError):
        _fused420_applicable(y, u, replace(cfg, phase_layout="bogus"), prep)


def test_forced_fused_raises_when_inapplicable(prep):
    """ADVICE r3: an explicitly forced 'fused' layout must never silently
    fall through to the plain path — it raises with the reason."""
    y = jnp.zeros((2, 32, 128), jnp.uint8)
    u = jnp.zeros((2, 16, 64), jnp.uint8)
    bad = RenderConfig(phase_layout="fused", dither="error_diffusion_host")
    with pytest.raises(ValueError, match="forced"):
        _fused420_applicable(y, u, bad, prep)
    with pytest.raises(ValueError, match="forced"):
        render_yuv_frame(y, u, u, prep, replace(bad, lut_strategy="gather"),
                         interpret=True)


def test_hash_offsets_row_twin():
    """The in-kernel i32 murmur twin must produce bit-identical offsets to
    pixel.hash_noise_offsets_jnp for any row/column window."""
    full = np.asarray(hash_noise_offsets_jnp(24, 256, plane_seed=1))
    for row in (0, 7, 23):
        for col0 in (0, 128):
            got = np.asarray(_hash_offsets_row(jnp.int32(row), 128, col0,
                                               plane_seed=1))
            np.testing.assert_array_equal(got[0], full[row, col0:col0 + 128])


def test_lane_chunk():
    assert _lane_chunk(3840, 4096) == 3840
    assert _lane_chunk(7680, 4096) == 3840
    assert _lane_chunk(3840, 2048) == 1920
    assert _lane_chunk(1920, 4096) == 1920
    assert _lane_chunk(128, 4096) == 128
    assert _lane_chunk(7680, 2048) == 1920
