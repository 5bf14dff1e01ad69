"""Compile-cache warm-start: precompile the production program set.

First compile of a program through the remote-compile tunnel costs up to
~100 s; the persistent XLA cache (utils.compile_cache) makes repeats cheap,
but a cold daemon's first job used to eat the full set. Since the
operand-argument restructure (ops.lut3d.kernel_operands) compiled programs
are LUT-AGNOSTIC — keyed by (frame shape, batch, LUT size, tier, interp,
domain), not table values — so warming with synthetic LUTs serves real
.cube files with zero compiles.

Driven by `lut-tpu serve --warmup` / `lut-tpu doctor --warmup`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class WarmupProgram:
    label: str
    width: int
    height: int
    lut_size: int
    interp: str = "tetrahedral"
    in_depth: int = 8
    out_depth: int = 8
    in_subsampling: str = "420"
    out_subsampling: str = "420"
    dither: str = "none"
    # Tiers to compile per shape: "auto" resolves against the synthetic
    # LUT, but a REAL LUT's per-LUT gate may resolve differently — so the
    # realistic fallback tiers are warmed explicitly too.
    tiers: tuple = ("auto",)


# The production set: the BASELINE config classes users actually hit.
DEFAULT_PROGRAMS: List[WarmupProgram] = [
    WarmupProgram("1080p 33^3 tetra", 1920, 1080, 33,
                  tiers=("auto", "int8_fast")),
    WarmupProgram("4K 33^3 tetra", 3840, 2160, 33,
                  tiers=("auto", "int8_fast")),
    WarmupProgram("4K 65^3 tetra", 3840, 2160, 65,
                  tiers=("auto", "coarse2f", "int8_fast")),
    WarmupProgram("1080p 65^3 tetra 10->8bit dither", 1920, 1080, 65,
                  in_depth=10, in_subsampling="422", dither="ordered",
                  tiers=("auto", "coarse2f")),
    WarmupProgram("8K 33^3 tetra 10-bit", 7680, 4320, 33,
                  in_depth=10, out_depth=10, in_subsampling="422",
                  out_subsampling="422"),
]


def _bucket_programs() -> List[WarmupProgram]:
    """The geometry-bucket ladder (engine.geometry.BUCKETS): one program
    per bucket for the ad hoc serving class (8-bit 4:2:0, the web-submit
    shape), tiers = the 33^3 gate ladder's head ("auto" usually resolves
    int8_lite) plus the bf16 "fast" rung for LUTs that fail the int8 gate
    (int8_fast LUTs compile once per bucket — bounded by the ladder, not
    by user geometry). Plus the DCI pro-master class at its bucket. The 8K
    bucket is left to compile-on-first-use (ad hoc 8K is rare and the
    exact 8K 10-bit program above covers production)."""
    from .geometry import BUCKETS

    out = []
    for bw, bh in BUCKETS:
        if (bw, bh) == (7680, 4320):
            continue
        out.append(WarmupProgram(f"bucket {bw}x{bh} 33^3", bw, bh, 33,
                                 tiers=("auto", "fast")))
    out.append(WarmupProgram("bucket 4096x2304 33^3 10-bit 422 (DCI pro)",
                             4096, 2304, 33, in_depth=10, out_depth=10,
                             in_subsampling="422", out_subsampling="422"))
    return out


DEFAULT_PROGRAMS += _bucket_programs()


def _synthetic_prep(size: int):
    from ..colorcore import Lut3D
    from ..ops import prepare_lut

    rng = np.random.default_rng(7)
    lut = Lut3D.identity(size)
    lut.table = np.clip(
        lut.table + rng.uniform(-0.02, 0.02, lut.table.shape
                                ).astype(np.float32), 0, 1)
    return prepare_lut(lut)


def _warm_one(prog: WarmupProgram, batch_size: Optional[int], on_tpu: bool,
              log: Callable[[str], None]) -> List[dict]:
    import jax

    from ..ops.render import RenderConfig, make_render_fn
    from .executor import _pick_batch_size

    results: List[dict] = []
    prep = _synthetic_prep(prog.lut_size)
    bsz = batch_size or _pick_batch_size(prog.width, prog.height)
    w, h = prog.width, prog.height
    dt_y = np.uint8 if prog.in_depth == 8 else np.uint16
    y = np.zeros((bsz, h, w), dt_y)
    cw = w if prog.in_subsampling == "444" else w // 2
    ch = h if prog.in_subsampling != "420" else h // 2
    u = np.zeros((bsz, ch, cw), dt_y)
    v = np.zeros((bsz, ch, cw), dt_y)
    warmed = set()
    for req_tier in prog.tiers:
        cfg = RenderConfig(
            interp=prog.interp,
            in_depth=prog.in_depth, out_depth=prog.out_depth,
            in_subsampling=prog.in_subsampling,
            out_subsampling=prog.out_subsampling,
            dither=prog.dither,
            lut_strategy="mxu" if on_tpu else "gather",
            lut_precision=req_tier,
        )
        tier = prep.resolve_precision(cfg.interp, cfg.lut_precision)
        if tier in warmed:      # "auto" resolved to a listed tier
            continue
        warmed.add(tier)
        t0 = time.perf_counter()
        try:
            fn = make_render_fn(prep, cfg, interpret=False)
            out = fn(y, u, v)
            jax.block_until_ready(out)
            # axon block_until_ready does not block; force a readback
            float(np.asarray(out[0][0, 0, 0]))
            dt = time.perf_counter() - t0
            rec = {"label": prog.label, "tier": tier, "batch": bsz,
                   "seconds": round(dt, 2), "cache_hit": dt < 5.0,
                   "ok": True}
        except Exception as exc:  # pragma: no cover - device-specific
            dt = time.perf_counter() - t0
            rec = {"label": prog.label, "tier": tier, "batch": bsz,
                   "seconds": round(dt, 2), "ok": False,
                   "error": str(exc)[:200]}
        results.append(rec)
        log(f"warmup: {rec['label']} [{tier}] batch={rec['batch']} "
            + (f"{'cache hit' if rec.get('cache_hit') else 'compiled'} "
               f"in {rec['seconds']}s" if rec["ok"]
               else f"FAILED: {rec.get('error')}"))
    return results


def warmup_programs(
    log: Optional[Callable[[str], None]] = None,
    programs: Optional[Sequence[WarmupProgram]] = None,
    batch_size: Optional[int] = None,
    workers: Optional[int] = None,
) -> List[dict]:
    """Compile-and-run each production program once on tiny-value inputs.

    Returns one record per program: label, resolved tier, batch, seconds,
    and whether it looked like a cache hit (sub-5s wall including the run).
    Uses the SAME entry points as the executor (make_render_fn with operand
    arguments + the executor's batch-size rule) so the warmed programs are
    byte-identical to what jobs run.

    workers: programs compile concurrently on this many threads (jit
    tracing is thread-safe, and the cache lock in ops.render serializes
    only the fn-cache insert). On THIS box the gain is modest — 501 s ->
    445 s for the 29-program set at 4 workers, because the single host
    core (trace + executable deserialization) dominates, not the remote
    helper pool — but it never hurts and multi-core hosts parallelize
    genuinely. Default: 4 on TPU, 1 elsewhere; override with
    LUT_TPU_WARMUP_WORKERS."""
    import os

    import jax

    log = log or (lambda m: None)
    on_tpu = jax.devices()[0].platform == "tpu"
    if programs is not None:
        progs = list(programs)
    else:
        from .geometry import geometry_mode

        mode = geometry_mode()
        buckets_active = (mode == "bucket"
                          or (mode == "auto" and on_tpu))
        # don't spend minutes warming bucket programs no job can route to
        # (LUT_TPU_GEOMETRY=exact, or auto on a non-TPU host)
        progs = [p for p in DEFAULT_PROGRAMS
                 if buckets_active or not p.label.startswith("bucket ")]
    if workers is None:
        try:
            workers = int(os.environ.get("LUT_TPU_WARMUP_WORKERS", "0"))
        except ValueError:
            workers = 0
        if workers <= 0:
            workers = 4 if on_tpu else 1
    workers = max(1, min(workers, len(progs) or 1))
    if workers == 1:
        results: List[dict] = []
        for prog in progs:
            results.extend(_warm_one(prog, batch_size, on_tpu, log))
        return results

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(_warm_one, prog, batch_size, on_tpu, log)
                   for prog in progs]
        out: List[dict] = []
        for fut in futures:  # program order, regardless of completion order
            out.extend(fut.result())
        return out
