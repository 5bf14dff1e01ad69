"""Loader for the optional native helpers (native/libluttpu_native.so).

Builds on demand with g++ (toolchain is present in the target environment)
and degrades to pure-Python silently when unavailable — the .so accelerates,
it is never required. Components:

  * ltn_cube_parse: fast .cube parsing straight into [r][g][b] layout
    (~30x faster than the text path for 65^3 LUTs);
  * ltn_dither_ed: exact Floyd-Steinberg error diffusion (serpentine) — the
    serial algorithm the TPU's ordered dither substitutes for; used as the
    dither quality oracle and as an opt-in host finishing pass.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libluttpu_native.so"

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOCK = threading.Lock()


def _build() -> bool:
    try:
        result = subprocess.run(
            ["make", "-s"], cwd=str(_NATIVE_DIR),
            capture_output=True, timeout=120,
        )
        return result.returncode == 0 and _SO_PATH.exists()
    except Exception:
        return False


def get_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.ltn_cube_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.ltn_cube_parse.restype = ctypes.c_int
            lib.ltn_dither_ed.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
            ]
            lib.ltn_dither_ed.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_native() is not None


def parse_cube_native(path) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parse a .cube via the native parser.

    Returns (table (N,N,N,3) f32, domain_min (3,), domain_max (3,)) or None
    when the native library is unavailable. Raises colorcore's CubeParseError
    on malformed files (error-code mapped) so callers see one error type.
    """
    lib = get_native()
    if lib is None:
        return None
    from .colorcore.cube import MAX_LUT_SIZE, CubeParseError

    max_entries = 3 * MAX_LUT_SIZE**3
    buf = np.empty(max_entries, np.float32)
    n = ctypes.c_int(0)
    domain = np.zeros(6, np.float32)
    rc = lib.ltn_cube_parse(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_entries,
        ctypes.byref(n),
        domain.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc == -1:
        raise FileNotFoundError(str(path))
    if rc < 0:
        messages = {
            -2: "missing LUT_3D_SIZE",
            -3: "unsupported LUT_3D_SIZE",
            -4: "wrong number of data values",
            -5: "LUT too large",
            -6: "non-finite values in LUT data",
            -7: "1D LUTs are not supported (need LUT_3D_SIZE)",
        }
        raise CubeParseError(f"{path}: {messages.get(rc, f'parse error {rc}')}")
    nn = n.value
    table = buf[: 3 * nn**3].reshape(nn, nn, nn, 3).copy()
    return table, domain[:3].copy(), domain[3:].copy()


def error_diffusion_quantize(x: np.ndarray, depth: int) -> Optional[np.ndarray]:
    """Exact Floyd-Steinberg quantization of float code values (H, W) at
    `depth` bits; None when the native library is unavailable."""
    lib = get_native()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    h, w = x.shape
    out = np.empty((h, w), np.uint16)
    rc = lib.ltn_dither_ed(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h, w, float((1 << depth) - 1),
    )
    if rc != 0:
        return None
    return out.astype(np.uint8) if depth <= 8 else out
