"""The N >= 97 LUT class (round 5): colorcore.cube promises
MAX_LUT_SIZE = 129 (cube.py:25); these tests back the promise with
evidence end to end — prepare, VMEM tier gating, kernel parity against
the f32 reference AND FFmpeg's own lut3d filter, and the defined behavior
when a tier exceeds VMEM (the reference accepts any N because FFmpeg's
lut3d is an interpreter, reference ffmpeg.py:243-244; here the fitting
tier subset + the XLA gather path carry the envelope)."""

import numpy as np
import pytest

from lut_renderer_tpu.colorcore import (
    Lut3D,
    apply_lut,
    max_delta_e76,
    parse_cube,
    write_cube_file,
)
from lut_renderer_tpu.colorcore.cube import CubeParseError
from lut_renderer_tpu.ops.lut3d import (
    apply_lut_planes,
    tier_fits_vmem,
    tier_vmem_bytes,
)
from lut_renderer_tpu.ops.prepare import prepare_lut


def _bigcube(n, seed=5):
    rng = np.random.default_rng(seed)
    lut = Lut3D.identity(n)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.03, 0.03, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return lut


@pytest.fixture(scope="module")
def prep97():
    return prepare_lut(_bigcube(97))


@pytest.fixture(scope="module")
def prep129():
    return prepare_lut(_bigcube(129))


def test_parse_envelope(tmp_path):
    # the advertised ceiling parses; one past it is rejected
    small = Lut3D.identity(2)
    text = write_cube_file(tmp_path / "t.cube", small).read_text()
    ok = text.replace("LUT_3D_SIZE 2", "LUT_3D_SIZE 129")
    with pytest.raises(CubeParseError, match="expected 6440067 values"):
        parse_cube(ok, "t")  # size accepted, data short -> data error
    bad = text.replace("LUT_3D_SIZE 2", "LUT_3D_SIZE 130")
    with pytest.raises(CubeParseError, match="unsupported LUT_3D_SIZE"):
        parse_cube(bad, "t")


def test_vmem_tier_gating(prep97, prep129):
    """At 129 the pair/bf16 tiers physically cannot fit VMEM; the auto
    ladder must only walk fitting tiers and still resolve a kernel mode."""
    # 97: everything fits
    for mode in ("int8_lite", "int8_fast", "fast", "exact", "coarse2f"):
        assert tier_fits_vmem(prep97, "tetrahedral", mode), mode
    # 129: the big tiers are out, the servers remain
    for mode in ("int8_fast", "fast", "exact"):
        assert not tier_fits_vmem(prep129, "tetrahedral", mode), mode
        assert tier_vmem_bytes(prep129, "tetrahedral", mode) > 14 << 20
    for mode in ("int8_lite", "coarse2f", "coarse2"):
        assert tier_fits_vmem(prep129, "tetrahedral", mode), mode
    for prep in (prep97, prep129):
        tier = prep.resolve_precision("tetrahedral", "auto")
        assert tier_fits_vmem(prep, "tetrahedral", tier)
        assert tier != "gather"  # a kernel tier must gate for this LUT


def test_explicit_unfittable_tier_raises(prep129, rng):
    pts = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="VMEM"):
        apply_lut_planes(pts[:, 0], pts[:, 1], pts[:, 2], prep129,
                         "tetrahedral", strategy="mxu", precision="exact")


@pytest.mark.parametrize("n", [97, 129])
def test_kernel_parity_vs_reference(n, prep97, prep129, rng):
    """The auto-resolved kernel tier (interpret) against the f32 reference:
    inside the simulated error bound that gated it in."""
    prep = prep97 if n == 97 else prep129
    pts = rng.uniform(0, 1, (2048, 3)).astype(np.float32)
    ref = apply_lut(pts, prep.table, "tetrahedral")
    tier = prep.resolve_precision("tetrahedral", "auto")
    ro, go, bo = apply_lut_planes(pts[:, 0], pts[:, 1], pts[:, 2], prep,
                                  "tetrahedral", precision="auto",
                                  interpret=True)
    out = np.stack([np.asarray(ro), np.asarray(go), np.asarray(bo)], -1)
    de = max_delta_e76(np.clip(out, 0, 1), np.clip(ref, 0, 1))
    sim = prep.mode_error("tetrahedral", tier)
    assert de <= sim * 1.3 + 1e-3, (tier, de, sim)


def test_coarse_recursion_129(prep129):
    """129 decomposes to a 65 coarse which itself carries a 33 coarse —
    the recursion the coarse2 tiers at 129 actually launch."""
    assert prep129.coarse is not None and prep129.coarse.size == 65
    assert prep129.coarse.coarse is not None
    assert prep129.coarse.coarse.size == 33
    # residual magnitudes shrink with grid density: sanity on the split
    assert float(np.abs(prep129.resid_scale).max()) < 0.01


def test_oracle_parity_97(tmp_path, rng):
    """97^3 against FFmpeg's own lut3d (the bundled libavfilter)."""
    from lut_renderer_tpu.hostio.oracle import Lut3DOracle

    lut = _bigcube(97, seed=11)
    path = write_cube_file(tmp_path / "p97.cube", lut)
    rgb = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    for interp in ("tetrahedral", "trilinear"):
        with Lut3DOracle(path, interp, "gbrpf32le", 64, 64) as oracle:
            ffm = oracle.apply_rgb_float(rgb)
        ours = apply_lut(rgb, lut, interp)
        assert max_delta_e76(np.clip(ffm, 0, 1), np.clip(ours, 0, 1)) < 0.01


def test_oracle_parity_129_auto_kernel(tmp_path, rng):
    """129^3 production contract: the auto kernel tier (interpret) against
    the REAL lut3d filter output, inside the dE76 budget."""
    from lut_renderer_tpu.hostio.oracle import Lut3DOracle

    lut = _bigcube(129, seed=13)
    path = write_cube_file(tmp_path / "p129.cube", lut)
    rgb = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    with Lut3DOracle(path, "tetrahedral", "gbrpf32le", 32, 32) as oracle:
        ffm = oracle.apply_rgb_float(rgb)
    prep = prepare_lut(lut)
    ro, go, bo = apply_lut_planes(
        rgb[..., 0], rgb[..., 1], rgb[..., 2], prep, "tetrahedral",
        precision="auto", interpret=True)
    ours = np.stack([np.asarray(ro), np.asarray(go), np.asarray(bo)], -1)
    de = max_delta_e76(np.clip(ffm, 0, 1), np.clip(ours, 0, 1))
    assert de < 0.5, de
