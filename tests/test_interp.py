import numpy as np
import pytest

from lut_renderer_tpu.colorcore import (
    Lut3D,
    apply_lut,
    apply_lut_nearest,
    apply_lut_tetrahedral,
    apply_lut_trilinear,
)


def _rand_rgb(rng, n=4096):
    return rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)


def test_identity_lut_all_modes(identity_lut, rng):
    rgb = _rand_rgb(rng)
    for mode, atol in [("trilinear", 1e-6), ("tetrahedral", 1e-6)]:
        out = apply_lut(rgb, identity_lut, mode)
        np.testing.assert_allclose(out, rgb, atol=atol, err_msg=mode)
    # nearest on identity snaps to the grid
    out = apply_lut(rgb, identity_lut, "nearest")
    assert np.max(np.abs(out - rgb)) <= 0.5 / (identity_lut.size - 1) + 1e-6


def test_lattice_points_exact(random_lut, rng):
    """At exact lattice inputs every interpolator returns the table value."""
    n = random_lut.size
    idx = rng.integers(0, n, size=(256, 3))
    rgb = (idx / (n - 1)).astype(np.float32)
    want = random_lut.table[idx[:, 0], idx[:, 1], idx[:, 2]]
    for fn in (apply_lut_nearest, apply_lut_trilinear, apply_lut_tetrahedral):
        got = fn(rgb, random_lut.table)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_channel_swap_lut(rng):
    """LUT that swaps R and B: output must equal swapped input (trilinear-exact
    because channel swap is linear)."""
    n = 9
    ident = Lut3D.identity(n).table
    swap = ident[..., [2, 1, 0]]
    rgb = _rand_rgb(rng, 1000)
    for fn in (apply_lut_trilinear, apply_lut_tetrahedral):
        out = fn(rgb, swap)
        np.testing.assert_allclose(out, rgb[:, [2, 1, 0]], atol=1e-5)


def test_gamma_lut_accuracy(rng):
    """Smooth nonlinear LUT: interpolation error bounded by curvature."""
    n = 33
    ramp = np.linspace(0, 1, n, dtype=np.float32) ** 2.2
    r, g, b = np.meshgrid(ramp, ramp, ramp, indexing="ij")
    table = np.stack([r, g, b], axis=-1).astype(np.float32)
    rgb = _rand_rgb(rng, 5000)
    want = rgb**2.2
    for fn in (apply_lut_trilinear, apply_lut_tetrahedral):
        out = fn(rgb, table)
        assert np.max(np.abs(out - want)) < 2e-3


def test_tetra_vs_trilinear_on_affine_lut(rng):
    """For an affine table both interpolators reproduce the affine map exactly,
    so they agree with each other everywhere."""
    n = 7
    ident = Lut3D.identity(n).table
    affine = 0.2 + 0.6 * ident + 0.1 * ident[..., [1, 2, 0]]
    rgb = _rand_rgb(rng, 2000)
    a = apply_lut_trilinear(rgb, affine)
    b = apply_lut_tetrahedral(rgb, affine)
    np.testing.assert_allclose(a, b, atol=1e-5)
    want = 0.2 + 0.6 * rgb + 0.1 * rgb[:, [1, 2, 0]]
    np.testing.assert_allclose(a, want, atol=1e-5)


def test_out_of_range_clipped(random_lut):
    rgb = np.array([[-0.5, 1.5, 0.5], [2.0, -1.0, 1.0]], dtype=np.float32)
    clipped = np.clip(rgb, 0, 1)
    for fn in (apply_lut_nearest, apply_lut_trilinear, apply_lut_tetrahedral):
        np.testing.assert_allclose(
            fn(rgb, random_lut.table), fn(clipped, random_lut.table), atol=1e-7
        )


def test_domain_mapping():
    """Non-unit domain maps input through DOMAIN_MIN/MAX before lookup."""
    lut = Lut3D.identity(5)
    lut.domain_min = np.array([0.0, 0.0, 0.0], np.float32)
    lut.domain_max = np.array([0.5, 0.5, 0.5], np.float32)
    rgb = np.array([[0.25, 0.25, 0.25]], np.float32)
    out = apply_lut(rgb, lut, "trilinear")
    # 0.25 maps to 0.5 of the domain -> identity table value 0.5
    np.testing.assert_allclose(out, [[0.5, 0.5, 0.5]], atol=1e-6)


def test_unknown_interp_falls_back_to_tetrahedral(random_lut, rng):
    """Mirrors reference fallback (src/lut_renderer/ffmpeg.py:243-244)."""
    rgb = _rand_rgb(rng, 100)
    np.testing.assert_array_equal(
        apply_lut(rgb, random_lut, "bogus"),
        apply_lut(rgb, random_lut, "tetrahedral"),
    )


def test_jax_matches_numpy(random_lut, rng):
    import jax.numpy as jnp

    rgb = _rand_rgb(rng, 2048)
    for mode in ("nearest", "trilinear", "tetrahedral", "pyramid", "prism"):
        np_out = apply_lut(rgb, random_lut, mode, xp=np)
        jx_out = np.asarray(
            apply_lut(jnp.asarray(rgb), jnp.asarray(random_lut.table), mode, xp=jnp)
        )
        np.testing.assert_allclose(jx_out, np_out, atol=3e-6, err_msg=mode)
