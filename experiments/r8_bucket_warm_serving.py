"""Geometry-bucketed warm serving, measured on the real TPU (round 5).

Closes round-4 VERDICT missing #1: an ad hoc geometry used to pay ~620 s
of remote compile (r7_web_onchip_drive). Now any W x H rides a
precompiled bucket program via host pad-and-crop (engine.geometry).

Phase A (`--warmup`): compile the full warmup ladder (production set +
geometry buckets) into the persistent cache — one-time per machine;
prints per-program seconds.

Phase B (`--serve`): the serving claim itself. In a warmed process,
take a NEVER-seen LUT (fresh random table; programs are LUT-agnostic)
and NEVER-seen geometries — 640x360 (the round-4 620 s case) and a DCI
scope 4096x1716 — and time the FIRST batch through the production
make_render_fn path with pad-and-crop, plus a full run_stage render
(decode -> TPU -> encode) at 640x360. Done = first batch <= 2 s, zero
compiles.

RESULTS 2026-08-19 (v5e, axon; first run compiles, second run = warm):
  see FINDINGS.md "Geometry-bucketed warm serving".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def phase_warmup():
    from lut_renderer_tpu.engine.warmup import warmup_programs
    from lut_renderer_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    t0 = time.time()
    recs = warmup_programs(log=lambda m: print("  " + m, flush=True))
    ok = sum(r["ok"] for r in recs)
    print(f"warmup: {ok}/{len(recs)} programs in {time.time() - t0:.0f}s")
    return 0 if ok == len(recs) else 1


def _fresh_lut(seed=99):
    from lut_renderer_tpu.colorcore import Lut3D
    from lut_renderer_tpu.ops import prepare_lut

    rng = np.random.default_rng(seed)
    lut = Lut3D.identity(33)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.03, 0.03, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


def _read(x):
    return float(np.asarray(x[0][0, 0, 0]))


def phase_serve():
    import tempfile
    from pathlib import Path

    from lut_renderer_tpu.engine.geometry import (
        pad_batch_to_bucket,
        pick_bucket,
    )
    from lut_renderer_tpu.engine.warmup import warmup_programs
    from lut_renderer_tpu.ops.render import RenderConfig, make_render_fn
    from lut_renderer_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    # warm the process from the persistent cache (daemon --warmup analog)
    t0 = time.time()
    warmup_programs(log=lambda m: None)
    print(f"process warm from persistent cache in {time.time() - t0:.0f}s",
          flush=True)

    prep = _fresh_lut()  # NEVER-seen LUT: rides as operands, no compile
    for (w, h), label in (((640, 360), "ad hoc web (r4: 620 s cold)"),
                          ((4096, 1716), "DCI scope"),
                          ((1080, 1920), "portrait phone")):
        bucket = pick_bucket(w, h)
        assert bucket is not None, (w, h)
        cfg = RenderConfig(lut_precision="auto")
        fn = make_render_fn(prep, cfg)
        bsz = max(1, min(16, round(16_000_000 / (bucket[0] * bucket[1]))))
        rng = np.random.default_rng(3)
        y = rng.integers(0, 256, (bsz, h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (bsz, h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (bsz, h // 2, w // 2), dtype=np.uint8)
        t0 = time.time()
        yp, up, vp = pad_batch_to_bucket(y, u, v, bucket, "420")
        first = time.time()
        out = _read(fn(yp, up, vp))
        dt = time.time() - t0
        print(f"{label}: {w}x{h} -> bucket {bucket[0]}x{bucket[1]} "
              f"batch={bsz}: FIRST batch {dt:.2f}s "
              f"(pad {first - t0:.3f}s) [{out:.0f}]", flush=True)

    # full pipeline: decode -> bucketed TPU render -> encode, ad hoc geometry
    from lut_renderer_tpu.colorcore import write_cube_file, Lut3D
    from lut_renderer_tpu.engine import run_stage
    from lut_renderer_tpu.hostio import probe_video
    from lut_renderer_tpu.models import ProcessingParams
    from lut_renderer_tpu.plan import build_render_spec
    from lut_renderer_tpu.tasks.runner import load_prepared_lut
    from lut_renderer_tpu.utils.fixtures import make_gradient_clip

    tmp = Path(tempfile.mkdtemp(prefix="r8bucket_"))
    clip = make_gradient_clip(tmp / "c.mp4", 640, 360, fps=25.0, frames=48)
    lut2 = Lut3D.identity(33)
    lut2.table = np.clip(lut2.table + np.random.default_rng(123).uniform(
        -0.04, 0.04, lut2.table.shape).astype(np.float32), 0, 1)
    cube = write_cube_file(tmp / "serve_look.cube", lut2)
    info = probe_video(clip)
    spec = build_render_spec(source=clip, output=tmp / "out.mp4",
                             params=ProcessingParams(video_codec="mpeg4",
                                                     bitrate="2M",
                                                     audio_codec=""),
                             lut_path=cube, source_info=info)
    t0 = time.time()
    res = run_stage(spec, info, load_prepared_lut(cube),
                    log_cb=lambda m: print("  log:", m, flush=True))
    wall = time.time() - t0
    assert res.ok, res.error
    print(f"run_stage 640x360x48f ad hoc: wall={wall:.2f}s "
          f"({res.stats.summary()})")
    return 0


if __name__ == "__main__":
    if "--warmup" in sys.argv:
        sys.exit(phase_warmup())
    sys.exit(phase_serve())
