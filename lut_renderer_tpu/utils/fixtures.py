"""Synthetic media fixtures.

The reference documents lavfi `testsrc=duration=10:size=1920x1080:rate=30`
recipes for manual testing (reference: docs/development.md:214-225) but ships
no generator. Here fixture generation is first-party: deterministic gradient/
test-pattern clips written through cv2's bundled FFmpeg (8-bit H.264/mp4v),
used by the FFI layout self-check, hostio tests, and the benchmark harness.
10-bit fixtures are produced by hostio.encode (prores_ks) once available.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np


def make_synthetic_frames(
    width: int = 320,
    height: int = 240,
    frames: int = 50,
    pattern: str = "gradient",
    seed: int = 0,
) -> Iterator[np.ndarray]:
    """Yield BGR uint8 frames. Patterns:
    - "gradient": horizontal R ramp, vertical G ramp, temporal B ramp;
    - "noise": deterministic per-frame uniform noise;
    - "zoneplate": concentric rings sweeping with time (chroma stress).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for i in range(frames):
        if pattern == "gradient":
            frame = np.zeros((height, width, 3), np.uint8)
            frame[:, :, 2] = np.linspace(0, 255, width, dtype=np.uint8)[None, :]
            frame[:, :, 1] = np.linspace(0, 255, height, dtype=np.uint8)[:, None]
            frame[:, :, 0] = (i * 255 // max(1, frames - 1)) & 0xFF
        elif pattern == "noise":
            frame = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
        elif pattern == "zoneplate":
            r2 = (xx - width / 2) ** 2 + (yy - height / 2) ** 2
            ph = r2 / (20.0 + i)
            frame = np.stack(
                [
                    (127.5 + 127.5 * np.sin(ph / 7)).astype(np.uint8),
                    (127.5 + 127.5 * np.sin(ph / 11)).astype(np.uint8),
                    (127.5 + 127.5 * np.sin(ph / 17)).astype(np.uint8),
                ],
                axis=-1,
            )
        else:
            raise ValueError(f"unknown pattern {pattern!r}")
        yield frame


def make_gradient_clip(
    path,
    width: int = 320,
    height: int = 240,
    fps: float = 25.0,
    frames: int = 50,
    pattern: str = "gradient",
    fourcc: str = "mp4v",
) -> Path:
    """Write a synthetic 8-bit clip via cv2 (bundled FFmpeg). Deterministic."""
    import cv2

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*fourcc), fps, (width, height)
    )
    if not vw.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
    for frame in make_synthetic_frames(width, height, frames, pattern):
        vw.write(frame)
    vw.release()
    if not path.exists() or path.stat().st_size == 0:
        raise RuntimeError(f"fixture write produced no data: {path}")
    return path
