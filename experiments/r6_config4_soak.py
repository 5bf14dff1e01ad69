"""Round-4 VERDICT #7: BASELINE config-4 mixed-queue soak through `serve`
on the real chip.

The queue mirrors tests/test_baseline_configs.py::test_config4_* but runs
end-to-end through the production daemon (QueueServer over a Unix socket)
on the TPU: a full-range (yuvj-class) MJPEG clip with inherit tags, a VFR
clip forced to CFR, and an A+V clip with PCM audio copied. Asserts the
range normalization note, the CFR force, and the output tags/timing, and
records queue wall time + per-clip fps.

Run: env JAX_PLATFORMS=axon PYTHONPATH=/root/repo:/root/.axon_site \
       python experiments/r6_config4_soak.py
"""
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

WORK = Path("/tmp/r6_config4_soak")
SOCK = WORK / "daemon.sock"


def main() -> int:
    WORK.mkdir(exist_ok=True)
    from lut_renderer_tpu.utils import fixtures
    from lut_renderer_tpu.hostio.probe import probe_video

    full = fixtures.make_fullrange_clip(WORK / "c4_full.mp4",
                                        width=640, height=360, frames=48)
    vfr = fixtures.make_vfr_clip(WORK / "c4_vfr.mp4",
                                 width=640, height=360, frames=48)
    av = fixtures.make_av_clip(WORK / "c4_av.mov", frames=48)
    lutp = WORK / "soak.cube"
    if not lutp.exists():
        import numpy as np
        rng = np.random.default_rng(4)
        ax = np.linspace(0, 1, 33, dtype=np.float32)
        b, g, r = np.meshgrid(ax, ax, ax, indexing="ij")
        tab = np.stack([r, g, b], axis=-1)
        tab = np.clip(tab + rng.uniform(-0.03, 0.03, tab.shape)
                      .astype(np.float32), 0, 1)
        with open(lutp, "w") as f:
            f.write("LUT_3D_SIZE 33\n")
            for row in tab.reshape(-1, 3):
                f.write(f"{row[0]:.6f} {row[1]:.6f} {row[2]:.6f}\n")

    info_full = probe_video(full)
    info_vfr = probe_video(vfr)
    assert info_full.is_full_range, "full-range fixture lost its range tag"
    assert info_vfr.is_vfr, "VFR fixture is not VFR"

    if SOCK.exists():
        SOCK.unlink()
    srv = subprocess.Popen(
        [sys.executable, "-m", "lut_renderer_tpu.app.cli", "serve",
         "--socket", str(SOCK), "--concurrency", "2"],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        from lut_renderer_tpu.app.server import request

        for _ in range(600):
            if SOCK.exists():
                try:
                    if request(SOCK, {"op": "ping"}, timeout=5).get("ok"):
                        break
                except Exception:
                    pass
            if srv.poll() is not None:
                print(srv.stdout.read()[-4000:])
                raise SystemExit("server died during startup")
            time.sleep(1.0)
        else:
            raise SystemExit("server never came up")
        print("daemon up", flush=True)

        def run_queue(tag):
            out_dir = WORK / f"out_{tag}"
            out_dir.mkdir(exist_ok=True)
            t0 = time.perf_counter()
            subs, all_logs = [], []
            for path, params in [
                (full, {"video_codec": "mpeg4",
                        "lut_output_tags": "inherit"}),
                (vfr, {"video_codec": "mpeg4", "force_cfr": True}),
                (av, {"video_codec": "mpeg4", "audio_codec": "copy"}),
            ]:
                resp = request(SOCK, {
                    "op": "submit", "files": [str(path)], "lut": str(lutp),
                    "params": params, "out_dir": str(out_dir),
                }, timeout=120)
                assert resp.get("ok"), resp
                subs.extend(resp["task_ids"])
                all_logs.extend(resp.get("logs", []))
                print(f"[{tag}] submitted", path.name, flush=True)

            deadline = time.time() + 1500
            while time.time() < deadline:
                st = request(SOCK, {"op": "status"}, timeout=30)
                states = {t["task_id"]: t["status"] for t in st["tasks"]}
                if all(states.get(tid) in ("completed", "failed")
                       for tid in subs):
                    break
                time.sleep(5)
            wall = time.perf_counter() - t0
            st = request(SOCK, {"op": "status"}, timeout=30)
            fails = [t for t in st["tasks"]
                     if t["task_id"] in subs and t["status"] != "completed"]
            assert not fails, fails
            print(f"[{tag}] queue of 3 mixed clips (144 frames total): "
                  f"{wall:.1f} s = {144 / wall:.1f} fps queue throughput",
                  flush=True)
            return st, all_logs

        st, logs = run_queue("cold")
        full_tid = next(t["task_id"] for t in st["tasks"]
                        if Path(t["source"]).name == "c4_full.mp4")
        tlogs = request(SOCK, {"op": "status", "task_id": full_tid},
                        timeout=30)["task"]["logs"]
        assert any("full-range (pc)" in m for m in tlogs), tlogs[:20]
        print("full-range clip: pc normalization note emitted OK")

        outs = {Path(t["source"]).name: Path(t["output"])
                for t in st["tasks"]}
        o_full = probe_video(outs["c4_full.mp4"])
        # the yuvj class is gone from the output (the config-4 requantize):
        # legacy yuvj420p in -> yuv420p out. NOTE on the range TAG: the mp4
        # muxer only writes a colr (nclx) atom when primaries/trc/matrix
        # are also set — an inherit policy over a source with ONLY a range
        # flag yields no colr atom, exactly as the reference's
        # `-color_range` flag would behave through ffmpeg's own mp4 muxer.
        assert o_full.pix_fmt == "yuv420p", o_full.pix_fmt
        print(f"full-range clip: yuvj normalized away "
              f"(out pix_fmt={o_full.pix_fmt}, range tag="
              f"{o_full.color_range}) OK")
        o_vfr = probe_video(outs["c4_vfr.mp4"])
        assert not o_vfr.is_vfr, "VFR clip was not forced CFR"
        assert o_vfr.color_range == "tv" and \
            o_vfr.color_primaries == "bt709", (o_vfr.color_range,
                                               o_vfr.color_primaries)
        print("VFR clip: output is CFR, bt709/tv tagged OK")
        o_av = probe_video(outs["c4_av.mov"])
        assert o_av.audio_codec, "copied audio stream missing"
        # (mov colr is nclc — no range flag exists in that atom)
        assert o_av.color_primaries == "bt709", o_av.color_primaries
        print(f"A+V clip: audio {o_av.audio_codec} copied, bt709 OK")

        # second pass on the warm daemon: the serving-steady-state number
        # (programs already compiled in-process)
        run_queue("warm")
        print("SOAK PASS", flush=True)
        return 0
    finally:
        try:
            from lut_renderer_tpu.app.server import request
            request(SOCK, {"op": "shutdown"}, timeout=10)
        except Exception:
            pass
        try:
            srv.wait(timeout=60)
        except Exception:
            srv.kill()


if __name__ == "__main__":
    raise SystemExit(main())
