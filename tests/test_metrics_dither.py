import numpy as np

from lut_renderer_tpu.colorcore import delta_e76, max_delta_e76, psnr
from lut_renderer_tpu.colorcore.dither import (
    bayer_matrix,
    bayer_offsets,
    quantize_with_ordered_dither,
)


def test_delta_e_zero_on_identical(rng):
    rgb = rng.uniform(0, 1, size=(100, 3))
    assert max_delta_e76(rgb, rgb) == 0.0


def test_delta_e_known_anchor():
    # black vs white is ~100 L* apart
    black = np.zeros((1, 3))
    white = np.ones((1, 3))
    de = delta_e76(black, white)
    assert 99.0 < float(de[0]) < 101.0


def test_delta_e_one_lsb_is_small(rng):
    """A 1/255 perturbation stays well under the 0.5 budget in midtones."""
    rgb = rng.uniform(0.2, 0.8, size=(1000, 3))
    pert = np.clip(rgb + 1.0 / 255.0, 0, 1)
    assert max_delta_e76(rgb, pert) < 0.5


def test_psnr():
    a = np.zeros((10, 10))
    b = np.full((10, 10), 0.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")


def test_bayer_is_permutation():
    for order in (1, 2, 3, 4):
        m = bayer_matrix(order)
        n = m.size
        assert sorted(m.flatten().tolist()) == list(range(n))


def test_bayer_offsets_zero_mean():
    off = bayer_offsets(4)
    assert abs(float(off.mean())) < 1e-7
    assert float(off.max()) < 0.5 and float(off.min()) > -0.5


def test_ordered_dither_preserves_mean(rng):
    """Dithered quantization of a flat field preserves the mean level."""
    x = np.full((64, 64), 100.37)
    q = quantize_with_ordered_dither(x, 8, bayer_offsets(4))
    assert abs(float(q.mean()) - 100.37) < 0.02
    assert set(np.unique(q)).issubset({100, 101})
