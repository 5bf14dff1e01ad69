"""Round-3: compiled-HLO inspection of the fused 8K program vs kernel-only.

Dump op categories + XLA cost analysis for both programs; look for
full-res copies/transposes/relayouts that explain the measured 17.5
ms/frame fused-over-kernel delta that stage math (~7 ms) doesn't.
"""
import sys, re, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.render import RenderConfig, render_yuv_frame
from lut_renderer_tpu.ops.lut3d import apply_lut_planes, kernel_operands

rng = np.random.default_rng(0)
lut = Lut3D.identity(33)
lut.table = np.clip(
    lut.table + rng.uniform(-0.02, 0.02, lut.table.shape).astype(np.float32),
    0, 1)
prep = prepare_lut(lut)
H, W = 4320, 7680
y = jnp.asarray(rng.integers(64, 940, (H, W)).astype(np.uint16))
u = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
v = jnp.asarray(rng.integers(64, 960, (H // 2, W // 2)).astype(np.uint16))
r0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral",
                   dither="ordered", lut_strategy="mxu")
ops = jax.device_put(kernel_operands(prep, "tetrahedral", "auto"))


def fused(y, u, v):
    return render_yuv_frame(y, u, v, prep, cfg, lut_operands=ops)


def kernel_only(r, g, b):
    return apply_lut_planes(r, g, b, prep, "tetrahedral", operands=ops)


def inspect(name, fn, *args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"\n===== {name} =====", flush=True)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = ["flops", "bytes accessed", "transcendentals",
                "bytes accessed output", "optimal_seconds"]
        for k in sorted(ca):
            if any(s in k for s in ("flops", "bytes accessed", "optimal")):
                if "{" not in k:
                    print(f"  cost[{k}] = {ca[k]:.3e}")
    except Exception as e:
        print("  cost_analysis failed:", e)
    # big-tensor ops: any op whose output is a full-res plane (>= 33M elems)
    cat = collections.Counter()
    big = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        opname = line.split("=", 1)[1].strip().split("(")[0].strip()
        hlo_op = opname.split()[-1] if opname else "?"
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        kind = re.search(r"= \S+\[\S*\]\S* (\w+)", line)
        k = kind.group(1) if kind else "?"
        cat[k] += 1
        if n >= 30_000_000:
            big[f"{k} {m.group(1)}[{m.group(2)}]"] += 1
    print("  op categories:", dict(cat.most_common(12)))
    print("  big (>=30M elem) ops:")
    for k, c in big.most_common(25):
        print(f"    {c:3d} x {k}")


inspect("kernel_only 8K", kernel_only, r0, r0, r0)
inspect("fused 8K", fused, y, u, v)
