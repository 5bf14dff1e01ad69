"""Web GUI serving stack driven end-to-end on the real TPU (round 4).

Starts the REAL CLI daemon (`lut-tpu serve --http 0 --queue-file ...`) on
the chip and drives the whole web surface over HTTP: upload a never-seen
.cube (parse-validated, saved server-side, remembered), submit a clip,
wait for the render, stream the output back down, check the durable queue
persisted the final state, shut down through the op API.

Measured 2026-08-19 (v5e, cold daemon process, ad hoc 640x360 geometry —
NOT in the `serve --warmup` production set, so first-use compiles ride the
remote compile helper):
  upload: ok -> ~/.config/lut-renderer-tpu/luts/web_look.cube
  status: completed  wall=620.7s (cold compiles; the config-4 soak showed
          the same daemon warm at 5.0s/queue = 28.6 fps steady-state)
  logs:   kernel precision=int8_lite (simulated worst-case dE76 0.051)
  download: 291414 bytes video/mp4 (streamed, byte-complete)
  queue-file status: completed
"""
import json
import re
import subprocess
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")
from pathlib import Path

import numpy as np

from lut_renderer_tpu.colorcore import Lut3D, write_cube_file
from lut_renderer_tpu.utils.fixtures import make_gradient_clip

tmp = Path(tempfile.mkdtemp(prefix="webchip_"))
clip = make_gradient_clip(tmp / "c.mp4", 640, 360, fps=25.0, frames=24)
lut = Lut3D.identity(33)
rng = np.random.default_rng(7)
lut.table = np.clip(
    lut.table + rng.uniform(-0.04, 0.04, lut.table.shape).astype(np.float32),
    0, 1)
cube_text = Path(write_cube_file(tmp / "web_look.cube", lut)).read_text()

p = subprocess.Popen([sys.executable, "-m", "lut_renderer_tpu.app.cli",
                      "serve", "--socket", str(tmp / "s.sock"),
                      "--http", "0", "--queue-file", str(tmp / "q.json")],
                     cwd="/root/repo", stdout=subprocess.PIPE, text=True)
url = None
while url is None:
    m = re.search(r"web GUI on (\S+)", p.stdout.readline())
    if m:
        url = m.group(1)


def op(req):
    r = urllib.request.Request(url + "api/op", data=json.dumps(req).encode(),
                               headers={"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(r, timeout=120).read())


up = op({"op": "upload_lut", "name": "web_look.cube", "text": cube_text})
print("upload:", up["ok"], up.get("path"), flush=True)
t0 = time.time()
resp = op({"op": "submit", "files": [str(clip)], "lut": up["path"],
           "params": {"video_codec": "mpeg4", "bitrate": "2M"},
           "out_dir": str(tmp / "out")})
assert resp["ok"], resp
tid = resp["task_ids"][0]
while True:
    q = json.loads(urllib.request.urlopen(url + "api/queue",
                                          timeout=60).read())
    st = q["tasks"][0]["status"]
    if st in ("completed", "failed"):
        break
    time.sleep(0.5)
print("status:", st, f"wall={time.time() - t0:.1f}s")
one = json.loads(urllib.request.urlopen(url + f"api/task?id={tid}",
                                        timeout=60).read())
for m in [m for m in one["task"]["logs"] if "engine" in m or "LUT" in m][:4]:
    print("  log:", m)
with urllib.request.urlopen(url + f"api/file?task={tid}", timeout=120) as r:
    data = r.read()
print("download:", len(data), "bytes,", r.headers["Content-Type"])
assert st == "completed" and len(data) > 1000
print("queue-file status:",
      json.loads((tmp / "q.json").read_text())["tasks"][0]["status"])
op({"op": "shutdown"})
p.wait(timeout=60)
print("WEB-ON-CHIP DRIVE OK")
