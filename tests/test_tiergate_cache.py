"""Persistent per-LUT tier-gate cache (ops/tiergate_cache.py) and the shared
simulator context on PreparedLut.

The reference has no analog (FFmpeg's lut3d runs one fixed numeric path);
the gate exists because the rebuild picks a reduced-precision MXU tier per
LUT, and its cost must not be paid twice for the same LUT contents.
"""

import numpy as np
import pytest

from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare, tiergate_cache


def _lut(n=17, seed=0, amp=0.05):
    rng = np.random.default_rng(seed)
    lut = Lut3D.identity(n)
    table = np.clip(
        lut.table + rng.uniform(-amp, amp, lut.table.shape).astype(np.float32),
        0.0, 1.0)
    return Lut3D(table=table, title=f"t{seed}")


def test_gate_key_is_content_addressed():
    a, b = _lut(seed=1), _lut(seed=2)
    ka = tiergate_cache.lut_gate_key(a.table, np.zeros(3), np.ones(3))
    ka2 = tiergate_cache.lut_gate_key(a.table.copy(), np.zeros(3), np.ones(3))
    kb = tiergate_cache.lut_gate_key(b.table, np.zeros(3), np.ones(3))
    kd = tiergate_cache.lut_gate_key(a.table, np.zeros(3), 2 * np.ones(3))
    assert ka == ka2
    assert ka != kb
    assert ka != kd  # domain participates in the key


def test_persistent_gate_roundtrip(tmp_path, monkeypatch):
    """A second process-equivalent (fresh PreparedLut) must resolve from the
    cache file without running the simulator."""
    monkeypatch.setenv("LUT_TPU_TIERGATE_CACHE", str(tmp_path))
    lut = _lut(seed=3)
    p1 = prepare.prepare_lut(lut)
    want = p1.mode_error("tetrahedral", "int8_lite")
    files = list(tmp_path.glob("*.json"))
    assert len(files) == 1

    p2 = prepare.prepare_lut(_lut(seed=3))  # same contents, fresh object
    assert p2.gate_key == p1.gate_key

    def boom(*a, **k):  # the sim must NOT run on a cache hit
        raise AssertionError("simulator ran despite persisted gate result")

    monkeypatch.setattr(prepare, "simulate_mode_error", boom)
    monkeypatch.setattr(prepare, "simulate_coarse_error", boom)
    assert p2.mode_error("tetrahedral", "int8_lite") == want


def test_persistence_disabled_by_empty_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LUT_TPU_TIERGATE_CACHE", "")
    p = prepare.prepare_lut(_lut(seed=4))
    p.mode_error("trilinear", "fast")
    assert tiergate_cache.gate_cache_dir() is None
    assert list(tmp_path.glob("*.json")) == []


def test_store_merges_entries(tmp_path, monkeypatch):
    monkeypatch.setenv("LUT_TPU_TIERGATE_CACHE", str(tmp_path))
    tiergate_cache.store_errors("k", {"a:fast:60000": 0.1})
    tiergate_cache.store_errors("k", {"b:fast:60000": 0.2})
    got = tiergate_cache.load_errors("k")
    assert got == {"a:fast:60000": 0.1, "b:fast:60000": 0.2}


def test_sim_context_reuse_is_order_independent():
    """Mode errors must not depend on which modes were simulated before
    (the shared probe/ref/identity context must be read-only across modes)."""
    modes = ["fast", "int8_fast", "int8_lite"]
    p_fwd = prepare.prepare_lut(_lut(seed=5))
    p_rev = prepare.prepare_lut(_lut(seed=5))
    fwd = {m: p_fwd.mode_error("tetrahedral", m) for m in modes}
    rev = {m: p_rev.mode_error("tetrahedral", m) for m in reversed(modes)}
    for m in modes:
        assert fwd[m] == rev[m]


def test_coarse_modes_share_context():
    """The coarse2 family reuses ref/taps/resid terms; values must match a
    fresh single-mode computation exactly."""
    lut = _lut(n=9, seed=6, amp=0.2)
    pa = prepare.prepare_lut(lut, force_coarse=True)
    pb = prepare.prepare_lut(lut, force_coarse=True)
    # walk several coarse modes on pa (warm shared context), then compare a
    # late mode against pb computing it first
    pa.mode_error("tetrahedral", "coarse2f")
    pa.mode_error("tetrahedral", "coarse2")
    late = pa.mode_error("tetrahedral", "coarse2x")
    assert late == pb.mode_error("tetrahedral", "coarse2x")
