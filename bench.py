"""Benchmark: 4K tetrahedral 33^3 LUT application, TPU chip vs FFmpeg-CPU.

Prints ONE JSON line:
  {"metric": ..., "value": <TPU 4K fps>, "unit": "fps", "vs_baseline": <x over
   FFmpeg lut3d on this host's CPU>}

The baseline is measured, not cited (the reference publishes no numbers —
BASELINE.md): FFmpeg's own lut3d C filter from the bundled libavfilter,
tetrahedral 33^3 on 4K rgb48 frames, on this host. TPU timing uses scalar
readback for honest completion (async dispatch under-reports otherwise) and
amortizes over a chained multi-frame batch.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

H, W = 2160, 3840
BATCH = 6
ITERS = 5


def _make_lut():
    from lut_renderer_tpu.colorcore import Lut3D, write_cube_file

    rng = np.random.default_rng(11)
    lut = Lut3D.identity(33)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.05, 0.05, lut.table.shape).astype(np.float32),
        0, 1,
    )
    import tempfile

    cube = Path(tempfile.mkdtemp(prefix="lutbench_")) / "bench.cube"
    write_cube_file(cube, lut)
    return lut, cube


def measure_tpu_fps(lut) -> tuple:
    import jax
    import jax.numpy as jnp

    from lut_renderer_tpu.ops import prepare_lut
    from lut_renderer_tpu.ops.lut3d import apply_lut_planes

    prep = prepare_lut(lut)
    platform = jax.devices()[0].platform
    strategy = "mxu" if platform == "tpu" else "gather"
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W)).astype(np.float32))

    @jax.jit
    def step(r, g, b):
        ro, go, bo = apply_lut_planes(r, g, b, prep, "tetrahedral",
                                      strategy=strategy)
        return jnp.sum(ro) + jnp.sum(go) + jnp.sum(bo)

    float(step(r, g, b))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(step(r, g, b))  # scalar readback forces completion
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt, platform


def measure_cpu_fps(cube) -> float:
    from lut_renderer_tpu.hostio.oracle import measure_cpu_lut3d_fps

    return measure_cpu_lut3d_fps(cube, "tetrahedral", W, H, frames=4)


def main() -> int:
    lut, cube = _make_lut()
    result = {
        "metric": "4K frames/sec/chip LUT-applied (tetrahedral 33^3); "
                  "max dE76 vs FFmpeg lut3d",
        "value": 0.0,
        "unit": "fps",
        "vs_baseline": 0.0,
    }
    try:
        cpu_fps = measure_cpu_fps(cube)
        result["cpu_baseline_fps"] = round(cpu_fps, 3)
    except Exception as exc:  # pragma: no cover
        cpu_fps = None
        result["cpu_baseline_error"] = str(exc)[:200]
    try:
        tpu_fps, platform = measure_tpu_fps(lut)
        result["value"] = round(tpu_fps, 2)
        result["platform"] = platform
        if cpu_fps:
            result["vs_baseline"] = round(tpu_fps / cpu_fps, 2)
    except Exception as exc:  # pragma: no cover
        result["error"] = str(exc)[:300]
    # parity figure (small frame; float path) — diagnostic field
    try:
        from lut_renderer_tpu.colorcore import apply_lut, max_delta_e76
        from lut_renderer_tpu.hostio.oracle import Lut3DOracle

        rng = np.random.default_rng(1)
        rgb = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
        with Lut3DOracle(cube, "tetrahedral", "gbrpf32le", 128, 128) as oracle:
            ffm = oracle.apply_rgb_float(rgb)
        ours = apply_lut(rgb, lut, "tetrahedral")
        result["max_dE76_vs_lut3d"] = round(
            float(max_delta_e76(np.clip(ffm, 0, 1), np.clip(ours, 0, 1))), 5
        )
    except Exception as exc:  # pragma: no cover
        result["parity_error"] = str(exc)[:200]

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
