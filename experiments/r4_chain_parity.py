"""End-to-end chain parity probe: the reference's FULL filter chain through
bundled libavfilter (ChainOracle) vs our fused render, yuv420p -> yuv420p.

Questions answered empirically:
  1. Does the auto-inserted yuv->rgb conversion before lut3d respect the
     colorspace tagged by the explicit scale filter (bt709) — and what
     chroma upsampling does it use (nearest vs interpolated)?
  2. What residual diffs remain vs our f32 pipeline (their fixed-point
     8-bit intermediates), i.e. what thresholds the parity test can pin.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/r4_chain_parity.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from lut_renderer_tpu.colorcore.cube import Lut3D, parse_cube_file, write_cube_file  # noqa: E402
from lut_renderer_tpu.hostio.oracle import ChainOracle  # noqa: E402
from lut_renderer_tpu.ops.prepare import prepare_lut  # noqa: E402
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame  # noqa: E402


def smooth_planes(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = 16 + 200 * (0.5 + 0.4 * np.sin(xx / w * 5 + rng.uniform(0, 6))
                    * np.cos(yy / h * 4))
    u = 128 + 90 * np.sin(xx / w * 3)[: h // 2 * 2: 2, : w // 2 * 2: 2][
        : h // 2, : w // 2]
    v = 128 + 90 * np.cos(yy / h * 2)[: h // 2 * 2: 2, : w // 2 * 2: 2][
        : h // 2, : w // 2]
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))


def grading_lut(path, n=17):
    ax = np.linspace(0, 1, n, dtype=np.float64)
    r, g, b = np.meshgrid(ax, ax, ax, indexing="ij")
    rr = np.clip(r ** 0.92 * 1.05, 0, 1)
    gg = np.clip(g * 0.97 + 0.01, 0, 1)
    bb = np.clip(b ** 1.06 * 0.95 + 0.02, 0, 1)
    tbl = np.stack([rr, gg, bb], axis=-1).astype(np.float32)
    write_cube_file(path, Lut3D(table=tbl))
    return path


def run(tag, filters, cfg, y, u, v, prep):
    import jax.numpy as jnp

    with ChainOracle(y.shape[1], y.shape[0], filters) as orc:
        fy, fu, fv = orc.apply_yuv(y, u, v)
    oy, ou, ov = render_yuv_frame(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v), prep, cfg, interpret=True)
    oy, ou, ov = np.asarray(oy), np.asarray(ou), np.asarray(ov)
    for name, a, b_ in (("y", fy, oy), ("u", fu, ou), ("v", fv, ov)):
        d = a.astype(np.int32) - b_.astype(np.int32)
        print(f"  [{tag}] {name}: max|d|={np.abs(d).max()} mean|d|="
              f"{np.abs(d).mean():.4f} frac(|d|>1)={np.mean(np.abs(d) > 1):.4f}")


def main():
    import tempfile
    h, w = 72, 96
    y, u, v = smooth_planes(h, w)
    lut = grading_lut(tempfile.mktemp(suffix=".cube"))
    prep = prepare_lut(parse_cube_file(lut))

    esc = lut.replace("\\", "\\\\").replace("'", "\\'")
    for interp in ("tetrahedral", "trilinear"):
        filters = [
            ("scale", "in_color_matrix=bt709:out_color_matrix=bt709"),
            ("lut3d", f"file='{esc}':interp={interp}"),
            ("format", "pix_fmts=yuv420p"),
        ]
        cfg = RenderConfig(interp=interp, lut_strategy="gather",
                           lut_precision="exact", chroma_up="nearest",
                           phase_layout="plain")
        run(f"bt709 {interp} nearest-up", filters, cfg, y, u, v, prep)
        cfg2 = RenderConfig(interp=interp, lut_strategy="gather",
                            lut_precision="exact", chroma_up="bilinear",
                            phase_layout="plain")
        run(f"bt709 {interp} bilinear-up", filters, cfg2, y, u, v, prep)

    # which matrix does the auto-conversion use WITHOUT the scale tag?
    for interp in ("tetrahedral",):
        filters = [("lut3d", f"file='{esc}':interp={interp}"),
                   ("format", "pix_fmts=yuv420p")]
        for m in ("bt709", "bt601"):
            cfg = RenderConfig(interp=interp, lut_strategy="gather",
                               lut_precision="exact", matrix_in=m,
                               matrix_out=m, phase_layout="plain")
            run(f"untagged-vs-{m}", filters, cfg, y, u, v, prep)


if __name__ == "__main__":
    main()


def diagnostics():
    """(a) 16-bit RGB intermediate shrinks the diff -> residual is FFmpeg's
    8-bit RGB quantization, not a math mismatch. (b) full-range leg."""
    import tempfile
    h, w = 72, 96
    y, u, v = smooth_planes(h, w)
    lut = grading_lut(tempfile.mktemp(suffix=".cube"))
    prep = prepare_lut(parse_cube_file(lut))
    esc = lut.replace("\\", "\\\\").replace("'", "\\'")

    filters = [
        ("scale", "in_color_matrix=bt709:out_color_matrix=bt709"),
        ("format", "pix_fmts=gbrp16le"),
        ("lut3d", f"file='{esc}':interp=tetrahedral"),
        ("format", "pix_fmts=yuv420p"),
    ]
    cfg = RenderConfig(interp="tetrahedral", lut_strategy="gather",
                       lut_precision="exact", phase_layout="plain")
    run("bt709 16bit-intermediate", filters, cfg, y, u, v, prep)

    # full-range source: reference emits scale=in_range=pc:out_range=tv
    # + format=yuv420p before lut3d (ffmpeg.py:211-233)
    filters = [
        ("scale", "in_range=pc:out_range=tv:in_color_matrix=bt709:"
                  "out_color_matrix=bt709"),
        ("format", "pix_fmts=yuv420p"),
        ("lut3d", f"file='{esc}':interp=tetrahedral"),
        ("format", "pix_fmts=yuv420p"),
    ]
    cfg = RenderConfig(interp="tetrahedral", lut_strategy="gather",
                       lut_precision="exact", phase_layout="plain",
                       in_full_range=True, work_full_range=False,
                       requantize_intermediate=True)
    run("fullrange->tv", filters, cfg, y, u, v, prep)


if __name__ == "__main__" and "--diag" in sys.argv:
    diagnostics()
