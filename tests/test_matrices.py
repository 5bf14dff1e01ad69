import numpy as np
import pytest

from lut_renderer_tpu.colorcore import (
    range_normalize_yuv,
    rgb_to_yuv_planes,
    yuv_to_rgb_planes,
)
from lut_renderer_tpu.colorcore.matrices import MATRIX_COEFFS, yuv_rgb_coeffs


@pytest.mark.parametrize("matrix", sorted(MATRIX_COEFFS))
@pytest.mark.parametrize("depth,full", [(8, False), (8, True), (10, False), (10, True)])
def test_yuv_rgb_roundtrip(matrix, depth, full, rng):
    """RGB -> YUV -> RGB is identity (within float rounding) for in-gamut RGB."""
    rgb = rng.uniform(0.0, 1.0, size=(1000, 3)).astype(np.float64)
    y, u, v = rgb_to_yuv_planes(rgb[:, 0], rgb[:, 1], rgb[:, 2], matrix, depth, full)
    r, g, b = yuv_to_rgb_planes(y, u, v, matrix, depth, full)
    back = np.stack([r, g, b], axis=-1)
    np.testing.assert_allclose(back, rgb, atol=1e-9)


def test_primary_y_values_bt709():
    """Known anchors: white/black Y levels at 8-bit limited range."""
    y, u, v = rgb_to_yuv_planes(
        np.array([1.0, 0.0]), np.array([1.0, 0.0]), np.array([1.0, 0.0]),
        "bt709", 8, False,
    )
    np.testing.assert_allclose(y, [235.0, 16.0], atol=1e-9)
    np.testing.assert_allclose(u, [128.0, 128.0], atol=1e-9)
    np.testing.assert_allclose(v, [128.0, 128.0], atol=1e-9)


def test_primary_y_values_full_range():
    y, _, _ = rgb_to_yuv_planes(
        np.array([1.0]), np.array([1.0]), np.array([1.0]), "bt709", 8, True
    )
    np.testing.assert_allclose(y, [255.0], atol=1e-9)


def test_bt601_luma_weights():
    kr, kg, kb, _, _ = yuv_rgb_coeffs("smpte170m")
    np.testing.assert_allclose([kr, kg, kb], [0.299, 0.587, 0.114], atol=1e-9)


def test_red_chroma_extreme_bt709():
    """Pure red at full saturation hits the Cr extreme (240 at 8-bit tv)."""
    _, u, v = rgb_to_yuv_planes(np.array([1.0]), np.array([0.0]), np.array([0.0]),
                                "bt709", 8, False)
    np.testing.assert_allclose(v, [240.0], atol=1e-9)


@pytest.mark.parametrize("depth", [8, 10])
def test_range_normalize_roundtrip(depth, rng):
    maxv = (1 << depth) - 1
    y = rng.uniform(0, maxv, 1000)
    u = rng.uniform(0, maxv, 1000)
    v = rng.uniform(0, maxv, 1000)
    y2, u2, v2 = range_normalize_yuv(y, u, v, depth, in_full=True, out_full=False)
    y3, u3, v3 = range_normalize_yuv(y2, u2, v2, depth, in_full=False, out_full=True)
    np.testing.assert_allclose(y3, y, atol=1e-9)
    np.testing.assert_allclose(u3, u, atol=1e-9)
    np.testing.assert_allclose(v3, v, atol=1e-9)


def test_range_normalize_anchors_8bit():
    """pc->tv: 0->16, 255->235 luma; chroma center fixed at 128."""
    y, u, v = range_normalize_yuv(
        np.array([0.0, 255.0]), np.array([128.0, 255.0]), np.array([128.0, 0.0]),
        8, in_full=True, out_full=False,
    )
    np.testing.assert_allclose(y, [16.0, 235.0], atol=1e-9)
    np.testing.assert_allclose(u[0], 128.0, atol=1e-9)
    np.testing.assert_allclose(u[1], 128.0 + 127.0 * 224.0 / 255.0, atol=1e-9)


def test_noop_when_same_range(rng):
    y = rng.uniform(0, 255, 10)
    u = rng.uniform(0, 255, 10)
    v = rng.uniform(0, 255, 10)
    y2, u2, v2 = range_normalize_yuv(y, u, v, 8, in_full=False, out_full=False)
    assert y2 is y and u2 is u and v2 is v


def test_consistency_with_full_range_flag(rng):
    """yuv(tv) -> rgb must equal yuv(tv)->yuv(pc)->rgb(pc-math)."""
    rgb = rng.uniform(0, 1, size=(200, 3))
    y, u, v = rgb_to_yuv_planes(rgb[:, 0], rgb[:, 1], rgb[:, 2], "bt709", 8, False)
    yp, up, vp = range_normalize_yuv(y, u, v, 8, in_full=False, out_full=True)
    r1, g1, b1 = yuv_to_rgb_planes(y, u, v, "bt709", 8, False)
    r2, g2, b2 = yuv_to_rgb_planes(yp, up, vp, "bt709", 8, True)
    np.testing.assert_allclose(r1, r2, atol=1e-12)
    np.testing.assert_allclose(g1, g2, atol=1e-12)
    np.testing.assert_allclose(b1, b2, atol=1e-12)
