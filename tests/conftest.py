"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no multi-chip hardware here), per the
standard JAX recipe: force the host platform and fan it out to 8 devices BEFORE
jax initializes. Real-TPU execution is exercised by bench.py, not the test
suite.
"""

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: env presets 'axon' (TPU)
# Hermetic user state: tests must never read/write the real persistent
# tier-gate cache, config dir (settings/presets/LUT history — pytest tmp
# paths used to leak into `luts list`), or thumbnail cache. Force-set (not
# setdefault: a developer shell with these exported would otherwise pierce
# the isolation); tests wanting persistence monkeypatch to a tmp_path.
import atexit as _atexit  # noqa: E402
import shutil as _shutil  # noqa: E402
import tempfile as _tempfile  # noqa: E402

os.environ["LUT_TPU_TIERGATE_CACHE"] = ""
# Exact-geometry programs by default: the test suite's tiny synthetic clips
# (64x64 etc.) would otherwise all pad up to the 640x368 serving bucket and
# multiply CPU render work ~60x. Bucketing itself is covered explicitly in
# tests/test_geometry_bucket.py, which monkeypatches this back to "bucket".
os.environ["LUT_TPU_GEOMETRY"] = "exact"
for _var in ("LUT_TPU_CONFIG_DIR", "LUT_TPU_THUMB_DIR"):
    _tmp = _tempfile.mkdtemp(prefix=f"lut_tpu_test_{_var[8:14].lower()}_")
    os.environ[_var] = _tmp
    _atexit.register(_shutil.rmtree, _tmp, ignore_errors=True)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax before user code, so the env var alone is
# too late — force the platform through the live config as well (the backend
# itself initializes lazily, so XLA_FLAGS above still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from lut_renderer_tpu.colorcore import Lut3D  # noqa: E402


@pytest.fixture(scope="session")
def identity_lut():
    return Lut3D.identity(33)


@pytest.fixture(scope="session")
def random_lut():
    """A smooth-ish random 17^3 LUT (identity + bounded perturbation)."""
    rng = np.random.default_rng(42)
    lut = Lut3D.identity(17)
    noise = rng.uniform(-0.05, 0.05, size=lut.table.shape).astype(np.float32)
    table = np.clip(lut.table + noise, 0.0, 1.0)
    return Lut3D(table=table, title="random17")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
