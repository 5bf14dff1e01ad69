"""Round-3: op-level profiler trace of the fused 8K chain.

Captures a jax.profiler trace of 4 fused frames and prints per-op device
durations parsed from the trace events, to rank where the 92 ms/frame
actually goes (kernel vs pre/post vs relayout copies).
"""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lut_renderer_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lut_renderer_tpu.colorcore import Lut3D
from lut_renderer_tpu.ops import prepare_lut
from lut_renderer_tpu.ops.render import RenderConfig, make_render_fn

print("devices:", jax.devices(), flush=True)
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
cfg = RenderConfig(in_depth=10, out_depth=10, interp="tetrahedral",
                   dither="ordered", lut_strategy="mxu")
fused = make_render_fn(prep, cfg)

# warm
out = fused(y, u, v)
float(jnp.sum(out[0]))

logdir = "/tmp/r3_trace"
with jax.profiler.trace(logdir):
    for _ in range(4):
        out = fused(y, u, v)
    float(jnp.sum(out[0]))

paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
if not paths:
    sys.exit(0)
with gzip.open(sorted(paths)[-1], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
# aggregate device-lane complete events by name
from collections import Counter, defaultdict
dur = Counter()
cnt = Counter()
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname and "Device" not in pname:
        continue
    name = e.get("name", "?")
    dur[name] += e.get("dur", 0)
    cnt[name] += 1
print("process names:", set(pid_names.values()), flush=True)
tot = sum(dur.values())
print(f"total device-op time: {tot/1e3:.2f} ms over 4 frames")
for name, d in dur.most_common(40):
    print(f"  {d/1e3:9.3f} ms  x{cnt[name]:<3d} {name[:110]}")
