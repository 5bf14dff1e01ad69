"""bench.py is a driver contract (one JSON line at round close): a broken
import or LUT builder would cost the round its BENCH evidence, so smoke the
host-side pieces on CPU. The TPU measurement path itself is exercised on
the real chip, not here."""

import numpy as np


def test_bench_lut_builders():
    import bench

    lut, cube = bench._make_lut()
    assert lut.size == 33
    assert cube.exists() and cube.suffix == ".cube"
    assert np.all(lut.table >= 0) and np.all(lut.table <= 1)
    l65 = bench._film_lut65()
    assert l65.size == 65
    assert np.all(l65.table >= 0) and np.all(l65.table <= 1)
    # smooth grading-class LUT: must gate into a fast tier, like config 2
    from lut_renderer_tpu.ops import prepare_lut

    prep = prepare_lut(l65)
    assert prep.resolve_precision("tetrahedral") in (
        "int8_lite", "fast", "int8_fast", "coarse2f")


def test_bench_kernel_parity_helper():
    """The parity probe bench reports must stay runnable host-side
    (gather strategy on CPU, exact tier)."""
    import bench

    lut, cube = bench._make_lut()
    d = bench.measure_kernel_parity(lut, cube, "exact")
    assert d < 0.01, d
