"""Persistent per-LUT tier-gate cache.

The per-LUT precision gate (prepare.PreparedLut.resolve_precision) replays
the kernel numerics in NumPy over a dense probe set — a few hundred ms per
tier tried on this box's single CPU core, up to a couple of seconds for a
65-cube LUT that walks deep into the ladder. The result depends only on the
LUT contents (table + domain), the simulator version, and the (interp, mode,
probes) triple, so it is perfectly cacheable across processes: a serve
daemon (or repeated CLI run) that meets a LUT it has ever gated before skips
the simulation entirely.

Layout: one JSON file per LUT content hash under ``<user cache
dir>/tiergate/<sha1>.json`` mapping ``"interp:mode:probes" -> max dE76``.
Writes are atomic (tmp + replace) and merge into the writer's own read
snapshot — concurrent writers are last-writer-wins, so a racing process can
drop the other's fresh keys; the loss is benign (that entry is simply
re-simulated on its next miss), which is why no lock file is used.
``LUT_TPU_TIERGATE_CACHE`` overrides the directory; the empty string
disables persistence (in-memory caching on the PreparedLut still applies).

Mirrors utils/compile_cache.py, which does the same job for XLA programs —
together they make a warmed daemon's first render of a never-seen LUT free
of both compile and gate latency on repeat encounters.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# Bump whenever the simulated numerics model changes (kernel restructure,
# probe-set change, detrending change): stale entries must not gate a new
# kernel. Folded into the content hash so old files are simply ignored.
SIM_VERSION = 3


def gate_cache_dir() -> Optional[Path]:
    env = os.environ.get("LUT_TPU_TIERGATE_CACHE")
    if env is not None:
        return Path(env) if env else None
    try:
        from platformdirs import user_cache_dir

        from ..app.settings import APP_NAME

        return Path(user_cache_dir(APP_NAME)) / "tiergate"
    except Exception:
        return Path(os.path.expanduser("~/.cache")) / "lut-renderer-tpu" / "tiergate"


def lut_gate_key(table: np.ndarray, domain_min: np.ndarray,
                 domain_max: np.ndarray) -> str:
    """Content hash of everything the gate result depends on."""
    h = hashlib.sha1()
    h.update(f"v{SIM_VERSION}:{table.shape}".encode())
    h.update(np.ascontiguousarray(table, dtype=np.float32).tobytes())
    h.update(np.asarray(domain_min, np.float32).tobytes())
    h.update(np.asarray(domain_max, np.float32).tobytes())
    return h.hexdigest()


def load_errors(key: str) -> Dict[str, float]:
    """Stored ``"interp:mode:probes" -> dE76`` map for this LUT ({} if none)."""
    base = gate_cache_dir()
    if base is None:
        return {}
    try:
        with open(base / f"{key}.json", "r", encoding="utf-8") as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            return {}
        return {k: float(v) for k, v in data.items()
                if isinstance(v, (int, float))}
    except (OSError, ValueError, TypeError):
        return {}


def store_errors(key: str, errors: Dict[str, float]) -> None:
    """Merge ``errors`` into the LUT's cache file (atomic, best-effort;
    see the module docstring for the concurrent-writer semantics)."""
    base = gate_cache_dir()
    if base is None or not errors:
        return
    try:
        base.mkdir(parents=True, exist_ok=True)
        path = base / f"{key}.json"
        merged = dict(load_errors(key))
        merged.update({k: float(v) for k, v in errors.items()})
        fd, tmp = tempfile.mkstemp(dir=str(base), suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(merged, fh)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    except OSError:
        pass
