"""Multi-chip frame sharding over a jax.sharding.Mesh.

The reference's only parallelism is N independent FFmpeg processes
(SURVEY.md §2.3); the TPU build adds intra-clip data parallelism: the frame
batch axis is sharded across chips over ICI (BASELINE.json config 5,
"frame-sharded multi-chip pipeline"). Frames are independent, so the render
step needs NO collectives — sharding the batch axis with shard_map gives
linear scaling and keeps each chip's Pallas kernel local to its shard.

The LUT matrix and config are replicated; host I/O feeds per-chip shards via
jax.device_put with a NamedSharding so H2D DMA lands directly on the right
chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.prepare import PreparedLut
from ..ops.render import RenderConfig, render_yuv_frame

FRAME_AXIS = "frames"


def default_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (FRAME_AXIS,))


def shard_batch_size(mesh: Mesh, per_device_frames: int = 1) -> int:
    return mesh.shape[FRAME_AXIS] * per_device_frames


def make_sharded_render_fn(
    prep: Optional[PreparedLut],
    cfg: RenderConfig,
    mesh: Mesh,
    interpret: bool = False,
    chain: int = 1,
):
    """Jitted render step over a mesh: batch axis sharded, LUT replicated.

    Inputs: y (B, H, W), u/v (B, Hc, Wc) with B a multiple of the mesh size.
    Frames are independent -> out_specs mirror in_specs and XLA inserts no
    collectives; scaling rides ICI-local HBM only.

    chain > 1 runs the step that many times inside one dispatch with the
    output feeding the next input (lax.scan) — the device-resident
    measurement methodology bench.py uses, here for the sharded program:
    the per-dispatch host sync tax amortizes over chain*batch frames so
    the timed figure is the kernel rate, not the tunnel's. Requires a
    feed-back-compatible config (same depth and subsampling in/out).
    """
    if chain > 1 and (cfg.in_depth != cfg.out_depth
                      or cfg.in_subsampling != cfg.out_subsampling):
        raise ValueError("chain>1 needs output geometry == input geometry")
    spec = P(FRAME_AXIS)
    from ..ops.render import lut_operands_for

    ops_np = lut_operands_for(prep, cfg)

    def step(y, u, v, ops):
        return render_yuv_frame(y, u, v, prep, cfg, interpret=interpret,
                                lut_operands=ops)

    # LUT table operands ride as a REPLICATED argument (P() on every leaf):
    # device_put once below, so the compiled pod program is LUT-agnostic
    # and no per-step operand traffic crosses ICI.
    ops_spec = jax.tree.map(lambda _: P(), ops_np)
    if hasattr(jax, "shard_map"):  # public API (JAX >= 0.6)
        sharded = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(spec, spec, spec, ops_spec),
            out_specs=(spec, spec, spec),
            check_vma=False,
        )
    else:  # pragma: no cover - older JAX
        from jax.experimental.shard_map import shard_map

        sharded = shard_map(
            step,
            mesh=mesh,
            in_specs=(spec, spec, spec, ops_spec),
            out_specs=(spec, spec, spec),
            check_rep=False,
        )
    if chain > 1:
        inner = sharded

        def sharded(y, u, v, ops):  # noqa: F811 - chained wrapper
            def body(carry, _):
                yy, uu, vv = carry
                return inner(yy, uu, vv, ops), None

            (y, u, v), _ = jax.lax.scan(body, (y, u, v), None, length=chain)
            return y, u, v

    jitted = jax.jit(sharded)
    ops_dev = (None if ops_np is None else jax.device_put(
        ops_np, NamedSharding(mesh, P())))
    return lambda y, u, v: jitted(y, u, v, ops_dev)


def put_sharded(mesh: Mesh, *arrays):
    """Host arrays -> device arrays sharded along the frame axis."""
    sharding = NamedSharding(mesh, P(FRAME_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)
