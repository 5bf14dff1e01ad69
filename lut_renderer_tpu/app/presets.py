"""Preset persistence: one JSON per preset name in <config>/presets/.

Reference contract (src/lut_renderer/presets.py): save raises
FileExistsError so the UI/CLI can ask before overwriting; rename refuses to
clobber; load_all skips corrupt files silently.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List

from ..models import ProcessingParams
from . import settings as _settings


def presets_dir() -> Path:
    # late-bound module attribute so tests can redirect the config root
    path = _settings._config_root() / "presets"
    path.mkdir(parents=True, exist_ok=True)
    return path


def list_presets() -> List[str]:
    return sorted(p.stem for p in presets_dir().glob("*.json"))


def load_preset(name: str) -> ProcessingParams:
    path = presets_dir() / f"{name}.json"
    if not path.exists():
        raise FileNotFoundError(f"Preset not found: {name}")
    return ProcessingParams.from_dict(json.loads(path.read_text(encoding="utf-8")))


def save_preset(name: str, params: ProcessingParams) -> Path:
    path = presets_dir() / f"{name}.json"
    if path.exists():
        raise FileExistsError(f"Preset already exists: {name}")
    path.write_text(json.dumps(params.to_dict(), indent=2), encoding="utf-8")
    return path


def overwrite_preset(name: str, params: ProcessingParams) -> Path:
    path = presets_dir() / f"{name}.json"
    path.write_text(json.dumps(params.to_dict(), indent=2), encoding="utf-8")
    return path


def delete_preset(name: str) -> None:
    path = presets_dir() / f"{name}.json"
    if path.exists():
        path.unlink()


def rename_preset(old: str, new: str) -> Path:
    src = presets_dir() / f"{old}.json"
    dst = presets_dir() / f"{new}.json"
    if not src.exists():
        raise FileNotFoundError(f"Preset not found: {old}")
    if dst.exists():
        raise FileExistsError(f"Preset already exists: {new}")
    src.rename(dst)
    return dst


def load_all_presets() -> Dict[str, ProcessingParams]:
    out = {}
    for name in list_presets():
        try:
            out[name] = load_preset(name)
        except Exception:
            continue
    return out
