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


def test_hash_noise_numpy_jnp_parity():
    """The jnp position hash must produce bit-identical offsets to the NumPy
    reference (all execution paths agree on 'random' dither)."""
    import numpy as np

    from lut_renderer_tpu.colorcore.dither import hash_noise_offsets
    from lut_renderer_tpu.ops.pixel import hash_noise_offsets_jnp

    ref = hash_noise_offsets(48, 96, plane_seed=2)
    got = np.asarray(hash_noise_offsets_jnp(48, 96, plane_seed=2))
    np.testing.assert_array_equal(ref, got)
    assert abs(ref.mean()) < 0.01
    assert ref.min() >= -0.5 and ref.max() < 0.5
    # different plane seeds decorrelate
    other = hash_noise_offsets(48, 96, plane_seed=3)
    assert abs(np.corrcoef(ref.ravel(), other.ravel())[0, 1]) < 0.05


def test_random_dither_kills_banding(rng):
    """A smooth 10-bit ramp quantized to 8 bits: plain rounding leaves ~4-code
    plateaus (banding); random dither recovers the gradient in local means
    while keeping per-pixel error <= 1 LSB."""
    import numpy as np

    from lut_renderer_tpu.colorcore.dither import quantize_with_random_dither

    h, w = 64, 1024
    ramp = np.linspace(100.0, 110.0, w, dtype=np.float32)  # 8-bit code values
    x = np.tile(ramp, (h, 1))
    flat = np.clip(np.floor(x + 0.5), 0, 255)
    dithered = quantize_with_random_dither(x, 8).astype(np.float32)
    # per-pixel: stochastic rounding never strays more than 1 code
    assert np.abs(dithered - x).max() <= 1.0
    # column means track the true ramp much better than plain rounding
    err_flat = np.abs(flat.mean(axis=0) - ramp).mean()
    err_dith = np.abs(dithered.mean(axis=0) - ramp).mean()
    assert err_dith < err_flat / 3
    # zero-mean: overall brightness preserved
    assert abs(dithered.mean() - x.mean()) < 0.02


def test_quantize_plane_random_matches_reference(rng):
    import numpy as np
    import jax.numpy as jnp

    from lut_renderer_tpu.colorcore.dither import quantize_with_random_dither
    from lut_renderer_tpu.ops.pixel import quantize_plane

    x = rng.uniform(0, 1023, (32, 128)).astype(np.float32)
    ref = quantize_with_random_dither(x, 10, plane_seed=1)
    got = np.asarray(quantize_plane(jnp.asarray(x), 10, "random", plane_seed=1))
    np.testing.assert_array_equal(ref, got)
