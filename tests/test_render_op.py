"""Tests for the planar pixel ops and the fused render op (CPU, interpret)."""

import numpy as np
import pytest

from lut_renderer_tpu.colorcore import (
    Lut3D, apply_lut, max_delta_e76, rgb_to_yuv_planes, yuv_to_rgb_planes,
)
from lut_renderer_tpu.ops import (
    RenderConfig,
    chroma_downsample_420,
    chroma_upsample_420,
    prepare_lut,
    quantize_plane,
    render_yuv_frame,
    make_render_fn,
)


def _frame(rng, h=16, w=256, depth=8, full=False):
    lo, hi = (0, (1 << depth) - 1) if full else (16 << (depth - 8), 236 << (depth - 8))
    dt = np.uint8 if depth <= 8 else np.uint16
    y = rng.integers(lo, hi, (h, w), dtype=dt)
    u = rng.integers(lo, hi, (h // 2, w // 2), dtype=dt)
    v = rng.integers(lo, hi, (h // 2, w // 2), dtype=dt)
    return y, u, v


def test_chroma_updown_roundtrip(rng):
    c = rng.uniform(0, 255, (8, 64)).astype(np.float32)
    up = chroma_upsample_420(c)
    assert up.shape == (16, 128)
    down = chroma_downsample_420(up)
    np.testing.assert_allclose(np.asarray(down), c, atol=1e-4)


def test_quantize_none_rounds():
    x = np.array([[0.4, 0.5, 254.6, 300.0, -5.0]], np.float32)
    q = quantize_plane(x, 8, "none")
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(q), [[0, 1, 255, 255, 0]])


def test_quantize_10bit_dtype():
    x = np.array([[1023.4, 1024.0]], np.float32)
    q = quantize_plane(x, 10, "none")
    assert q.dtype == np.uint16
    np.testing.assert_array_equal(np.asarray(q), [[1023, 1023]])


def test_quantize_ordered_dither_mean(rng):
    x = np.full((64, 64), 100.4, np.float32)
    q = np.asarray(quantize_plane(x, 8, "ordered"), np.float64)
    assert abs(q.mean() - 100.4) < 0.03
    assert set(np.unique(q)).issubset({100.0, 101.0})


def test_render_identity_lut_roundtrip(rng):
    """Identity LUT + same in/out config: output stays within quantization
    distance of the input (YUV->RGB->YUV roundtrip + chroma resampling).
    Chroma kept near-neutral so colors stay in gamut (no RGB clipping)."""
    y = rng.integers(30, 225, (16, 256), dtype=np.uint8)
    u = rng.integers(118, 138, (8, 128), dtype=np.uint8)
    v = rng.integers(118, 138, (8, 128), dtype=np.uint8)
    cfg = RenderConfig(chroma_up="nearest")
    prep = prepare_lut(Lut3D.identity(17))
    yq, uq, vq = render_yuv_frame(y, u, v, prep, cfg, interpret=True)
    assert yq.shape == y.shape and uq.shape == u.shape
    dy = np.abs(np.asarray(yq).astype(int) - y.astype(int))
    assert np.median(dy) <= 1.0
    assert dy.max() <= 2


def test_render_matches_reference_pipeline(rng):
    """Fused op == step-by-step numpy reference on a gray-ish frame
    (in-gamut, no clipping): exact to quantization."""
    h, w = 16, 256
    y = rng.integers(60, 200, (h, w), dtype=np.uint8)
    u = rng.integers(120, 136, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(120, 136, (h // 2, w // 2), dtype=np.uint8)
    lut = Lut3D.identity(17)
    lut.table = np.clip(lut.table ** 1.2, 0, 1).astype(np.float32)
    prep = prepare_lut(lut)
    cfg = RenderConfig(interp="trilinear")
    yq, uq, vq = render_yuv_frame(y, u, v, prep, cfg, interpret=True)

    # NumPy reference
    uf = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float32)
    vf = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float32)
    r, g, b = yuv_to_rgb_planes(y.astype(np.float32), uf, vf, "bt709", 8, False)
    rgb = np.stack([r, g, b], -1)
    out = apply_lut(rgb, lut, "trilinear")
    y2, u2, v2 = rgb_to_yuv_planes(out[..., 0], out[..., 1], out[..., 2],
                                   "bt709", 8, False)
    y2q = np.clip(np.floor(y2 + 0.5), 0, 255)
    np.testing.assert_allclose(np.asarray(yq, np.float64), y2q, atol=1.0)
    u2d = u2.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
    u2q = np.clip(np.floor(u2d + 0.5), 0, 255)
    np.testing.assert_allclose(np.asarray(uq, np.float64), u2q, atol=1.0)


def test_render_range_normalization_full_to_tv(rng):
    """pc-range source normalized to tv: full-range white -> 235."""
    y = np.full((8, 128), 255, np.uint8)
    u = np.full((4, 64), 128, np.uint8)
    v = np.full((4, 64), 128, np.uint8)
    cfg = RenderConfig(in_full_range=True, work_full_range=False,
                       apply_lut=False)
    yq, uq, vq = render_yuv_frame(y, u, v, None, cfg, interpret=True)
    assert int(np.asarray(yq)[0, 0]) == 235
    assert int(np.asarray(uq)[0, 0]) == 128


def test_render_10bit_to_8bit(rng):
    y = rng.integers(120, 880, (16, 256), dtype=np.uint16)
    u = rng.integers(472, 552, (8, 128), dtype=np.uint16)
    v = rng.integers(472, 552, (8, 128), dtype=np.uint16)
    cfg = RenderConfig(in_depth=10, out_depth=8, dither="ordered")
    prep = prepare_lut(Lut3D.identity(17))
    yq, uq, vq = render_yuv_frame(y, u, v, prep, cfg, interpret=True)
    assert yq.dtype == np.uint8
    # 10-bit 4x scale preserved through the pipeline
    dy = np.abs(np.asarray(yq).astype(float) - y.astype(float) / 4.0)
    assert np.median(dy) <= 1.5


def test_render_batched(rng):
    ys = np.stack([_frame(rng)[0] for _ in range(3)])
    us = np.stack([_frame(rng)[1] for _ in range(3)])
    vs = np.stack([_frame(rng)[2] for _ in range(3)])
    prep = prepare_lut(Lut3D.identity(9))
    fn = make_render_fn(prep, RenderConfig(), interpret=True)
    yq, uq, vq = fn(ys, us, vs)
    assert yq.shape == ys.shape
    # batch order preserved: each frame matches its single-frame render
    y0, u0, v0 = render_yuv_frame(ys[1], us[1], vs[1], prep, RenderConfig(),
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(yq[1]), np.asarray(y0))


def test_render_dE_vs_float_reference(random_lut):
    """End-to-end dE76 on the RGB interpretation of output vs float reference
    stays under the 0.5 budget for tv-range in-gamut inputs.

    Local rng: the max-dE assertion sits near the 8-bit-quantization noise
    floor, so the input data must not depend on how many tests consumed the
    shared session rng before this one."""
    rng = np.random.default_rng(77)
    h, w = 16, 256
    y = rng.integers(40, 220, (h, w), dtype=np.uint8)
    u = rng.integers(110, 146, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(110, 146, (h // 2, w // 2), dtype=np.uint8)
    prep = prepare_lut(random_lut)
    cfg = RenderConfig(interp="tetrahedral", chroma_up="nearest")
    yq, uq, vq = render_yuv_frame(y, u, v, prep, cfg, interpret=True)

    # float reference path (no quantization)
    uf = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float32)
    vf = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float32)
    r, g, b = yuv_to_rgb_planes(y.astype(np.float32), uf, vf, "bt709", 8, False)
    ref_rgb = apply_lut(np.stack([r, g, b], -1), random_lut, "tetrahedral")

    # decode our quantized output back to RGB (upsample chroma the same way)
    uo = np.repeat(np.repeat(np.asarray(uq), 2, 0), 2, 1).astype(np.float32)
    vo = np.repeat(np.repeat(np.asarray(vq), 2, 0), 2, 1).astype(np.float32)
    ro, go, bo = yuv_to_rgb_planes(np.asarray(yq, np.float32), uo, vo,
                                   "bt709", 8, False)
    got_rgb = np.stack([ro, go, bo], -1)
    # chroma got box-filtered through 4:2:0; compare on 2x2 block means
    # Bound is loose: it includes 8-bit output quantization, the 4:2:0 chroma
    # roundtrip, and YUV-vs-RGB block averaging — not the raw LUT parity
    # (that is test_lut3d_op at ~3e-6). Mean dE is the meaningful signal here.
    ref_m = ref_rgb.reshape(h // 2, 2, w // 2, 2, 3).mean((1, 3))
    got_m = got_rgb.reshape(h // 2, 2, w // 2, 2, 3).mean((1, 3))
    from lut_renderer_tpu.colorcore import delta_e76
    de = delta_e76(got_m, ref_m)
    assert float(np.mean(de)) < 0.5
    assert float(np.max(de)) < 3.0


def test_render_odd_tile_sizes(rng):
    """Dimensions not aligned to 8x128 tiles flow through the padding path."""
    from lut_renderer_tpu.colorcore import Lut3D
    from lut_renderer_tpu.ops import prepare_lut

    y = rng.integers(30, 225, (54, 76), dtype=np.uint8)
    u = rng.integers(118, 138, (27, 38), dtype=np.uint8)
    v = rng.integers(118, 138, (27, 38), dtype=np.uint8)
    prep = prepare_lut(Lut3D.identity(9))
    yq, uq, vq = render_yuv_frame(y, u, v, prep, RenderConfig(), interpret=True)
    assert yq.shape == (54, 76) and uq.shape == (27, 38)
    dy = np.abs(np.asarray(yq).astype(int) - y.astype(int))
    assert dy.max() <= 2
