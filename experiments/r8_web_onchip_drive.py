"""Web serving stack on the real TPU, round 5: the r7 drive re-run on the
geometry-bucketed engine — the ad hoc 640x360 web submit that cost 620 s
of cold compile in round 4 now rides the warmed 640x368 bucket program.

Same flow as r7_web_onchip_drive (real CLI daemon, HTTP .cube upload,
submit, poll, streamed download, durable queue check, shutdown) with
`--warmup` (production daemons warm at start; one-time compiles live in
the persistent cache since r8_bucket_warm_serving --warmup) and the
round-5 security gates exercised (token + JSON content type).

RESULT 2026-08-19 (v5e, cold daemon process, ad hoc 640x360, 24 frames):
  first run: daemon up (incl. --warmup from cache) 390s, task wall 7.0s
  (riding the round-4 exact program via the identity-resize trap).
  After the identity-resize normalization (queued jobs take the TRUE
  bucket path): task wall **1.7s** (vs 620.7s round 4 — 365x);
  download byte-complete; queue-file completed; shutdown reply +
  process exit 0.59s. (Daemon warm startup 709s that evening — the
  remote-compile tunnel slows over a long session, FINDINGS.)
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

tmp = Path(tempfile.mkdtemp(prefix="webchip5_"))
clip = make_gradient_clip(tmp / "c.mp4", 640, 360, fps=25.0, frames=24)
lut = Lut3D.identity(33)
rng = np.random.default_rng(8)
lut.table = np.clip(
    lut.table + rng.uniform(-0.04, 0.04, lut.table.shape).astype(np.float32),
    0, 1)
cube_text = Path(write_cube_file(tmp / "web_look5.cube", lut)).read_text()

TOKEN = "r5drive"
p = subprocess.Popen([sys.executable, "-m", "lut_renderer_tpu.app.cli",
                      "serve", "--socket", str(tmp / "s.sock"),
                      "--http", "0", "--http-token", TOKEN,
                      "--warmup", "--queue-file", str(tmp / "q.json")],
                     cwd="/root/repo", stdout=subprocess.PIPE, text=True)
t_start = time.time()
url = None
while url is None:
    line = p.stdout.readline()
    m = re.search(r"web GUI on (http\S+?)\?token", line)
    if m:
        url = m.group(1)
print(f"daemon up (incl. --warmup) in {time.time() - t_start:.0f}s",
      flush=True)


def op(req):
    r = urllib.request.Request(url + "api/op", data=json.dumps(req).encode(),
                               headers={"Content-Type": "application/json",
                                        "X-Auth-Token": TOKEN})
    return json.loads(urllib.request.urlopen(r, timeout=120).read())


def get(path):
    r = urllib.request.Request(url + path, headers={"X-Auth-Token": TOKEN})
    return urllib.request.urlopen(r, timeout=120)


up = op({"op": "upload_lut", "name": "web_look5.cube", "text": cube_text})
print("upload:", up["ok"], up.get("path"), flush=True)
t0 = time.time()
resp = op({"op": "submit", "files": [str(clip)], "lut": up["path"],
           "params": {"video_codec": "mpeg4", "bitrate": "2M"},
           "out_dir": str(tmp / "out")})
assert resp["ok"], resp
tid = resp["task_ids"][0]
while True:
    q = json.loads(get("api/queue").read())
    st = q["tasks"][0]["status"]
    if st in ("completed", "failed"):
        break
    time.sleep(0.5)
print("status:", st, f"wall={time.time() - t0:.1f}s  (r4 figure: 620.7s)")
one = json.loads(get(f"api/task?id={tid}").read())
for m in [m for m in one["task"]["logs"]
          if "engine" in m or "LUT" in m or "stats" in m][:6]:
    print("  log:", m)
with get(f"api/file?task={tid}") as r:
    data = r.read()
print("download:", len(data), "bytes,", r.headers["Content-Type"])
assert st == "completed" and len(data) > 1000
print("queue-file status:",
      json.loads((tmp / "q.json").read_text())["tasks"][0]["status"])
t0 = time.time()
op({"op": "shutdown"})
p.wait(timeout=60)
print(f"shutdown: reply + process exit in {time.time() - t0:.2f}s")
print("WEB-ON-CHIP DRIVE OK (round 5)")
