"""Per-parameter help topics — the reference ships a rich per-field help
popup system (~350 lines, main_window.py:1269-1622, in Chinese); this is the
headless analog in English: `lut-tpu help [topic]`.

Content mirrors the reference's guidance where a policy consequence exists
(what each knob does, what "blank = auto" means, interactions like
copy-codec + LUT) and adds TPU-build specifics (precision tiers, dither
substitutions, encoder availability).
"""

from __future__ import annotations

from typing import Dict

TOPICS: Dict[str, str] = {
    "mode": """\
--mode fast|pro
  fast: one encode pass — decode, LUT on the TPU, distribution encode.
  pro:  two-stage mastering — stage 1 renders the LUT into a ProRes 422 HQ
        master (yuv422p10le, audio copied) in --master-dir; stage 2 encodes
        the distribution file from that master with YOUR parameters and no
        LUT. The master is re-probed so stage-2 policy sees its real
        properties, and it is deleted after success (also after failure —
        an improvement over the reference, which leaks it).
  Pro mode requires --master-dir and warns when the estimated ProRes size
  (220 Mbps at 1080p30, scaled by w*h*fps) crowds the free disk space.""",
    "codec": """\
--codec NAME | copy
  Video encoder for the (final) encode stage. Bundled encoders here:
  prores_ks (the pro-master codec), prores, prores_aw, mpeg4, libvpx-vp9,
  ffv1, mjpeg, png. libx264/libx265 are NOT in the bundled libraries; like
  the reference, no preflight hides that — the task fails with a clear
  error if you request one.
  copy: stream-copies video. A LUT cannot be applied to a copied stream;
  task creation auto-switches to an encoding codec (the reference's
  copy-codec guard) or `plan` raises if forced.""",
    "pix_fmt": """\
--pix-fmt FMT (blank = policy decides)
  Output pixel format. The bit-depth policy fills this when blank:
  preserve/auto + 10-bit source + 10-bit-capable codec -> yuv422p10le for
  prores_ks, yuv420p10le otherwise; force_8bit -> yuv420p. If the chosen
  encoder cannot take the format, the engine negotiates the closest
  supported one and logs the change.""",
    "bit_depth": """\
--bit-depth preserve|auto|force_8bit
  preserve/auto: keep 10-bit sources at 10 bit when the encoder can take
  it, else fall to 8 bit (with a note). force_8bit: always yuv420p — pair
  with --dither to mask banding from the depth reduction.""",
    "resolution": """\
--resolution WxH (blank = source)
  Output size. Blank inherits the probed source resolution (the
  reference's smart default). Scaling is bilinear, done on the TPU in RGB
  after the LUT.""",
    "bitrate": """\
--bitrate N[k|M] (blank = source)
  Target video bitrate. Blank inherits the source's probed bitrate. When
  set, the policy also pins maxrate = bitrate and bufsize = 2x bitrate
  (the reference's stabilization rule) so rate spikes stay bounded.""",
    "crf": """\
--crf N (0-51, x264 scale)
  Constant-quality knob. No CRF-rate-control encoder is bundled, so CRF
  maps onto an MPEG-4/MJPEG constant quantizer via x264's own rate model:
  qscale = 4 * 2^((crf - 23) / 6) — bitrate halves per +6 CRF, anchored at
  CRF 23 ~ q4. The mapping is noted in the task log.""",
    "fps": """\
--fps N (blank = passthrough) / --no-force-cfr
  Setting fps forces constant frame rate at that rate (duplicate/drop on
  decoded timestamps). Blank: VFR sources are still forced to CFR at the
  source rate unless --no-force-cfr (VFR breaks many NLEs; the reference
  defaults the same way). GOP defaults to round(fps) when unset.""",
    "gop": """\
--gop N (blank = auto)
  Keyframe interval. Blank: round(fps) — about one keyframe per second,
  the reference's rule.""",
    "interp": """\
--interp tetrahedral|trilinear|nearest|pyramid|prism
  3D-LUT interpolation. tetrahedral (default) matches FFmpeg lut3d's
  default and is the grading-industry standard; trilinear is faster;
  nearest/pyramid/prism complete FFmpeg's mode set ('cubic' falls back to
  tetrahedral, as FFmpeg itself rejects it). All five run natively on the
  TPU with max dE76 vs FFmpeg lut3d ~ 1e-4 at exact precision.""",
    "precision": """\
kernel precision (automatic)
  The LUT kernel carries several numeric tiers (int8 table pair at the
  MXU's 2x int8 rate, bf16-pair "exact", bf16-single "fast", and a merged
  coarse+residual decomposition for 65^3 LUTs). Interpolation weights are
  exact f32 in every tier (they apply after the dot), so the production
  int8 tier is itself near-exact (~3e-4 dE76 vs FFmpeg lut3d). Selection
  is still automatic per LUT: a NumPy replay of each tier's numerics over
  a dense probe set must clear a 0.4 dE76 budget (contract: < 0.5), else
  the next tier is tried, ending at exact — no user knob needed.""",
    "input_matrix": """\
--input-matrix auto|bt709|smpte170m|bt470bg|bt2020nc|none
  YUV->RGB matrix for the LUT input. auto: probe's colorspace when
  recognized, else bt709 for HD. none: skip forcing (use source tags).""",
    "output_tags": """\
--output-tags bt709|inherit|none
  Container color metadata on the output. bt709 (default with a LUT):
  tag bt709 primaries/transfer/matrix + tv range — the reference's "the
  LUT output is display-referred Rec.709" stance. inherit: copy the
  source's tags (requires metadata inheritance on). none: write no tags.""",
    "dither": """\
--dither none|error_diffusion|ordered|random
  Bit-depth-reduction dither (matters with force_8bit or 10->8 paths).
  error_diffusion: exact serial Floyd-Steinberg on the host via the native
  C++ helper (zscale-faithful); if the helper is unavailable it degrades
  to ordered with a note. ordered: zero-mean 16x16 Bayer inside the TPU
  pipeline. random: stateless position-hash stochastic rounding (no tile
  structure, bit-reproducible across runs).""",
    "audio": """\
--audio-codec copy|aac|none  --audio-bitrate N
  copy (default): remux the source audio stream untouched. aac: transcode
  through the bundled encoder. Blank sample-rate/channels inherit.""",
    "concurrency": """\
--concurrency N (1-16)
  Parallel tasks. Each task runs its own decode/render/encode pipeline;
  the TPU time-slices between render steps. 1 (default, like the
  reference) is usually right for one chip — raise it when tasks are
  host-bound (decode/encode heavy, small frames).""",
    "watch": """\
--watch
  Interactive queue monitor: one live row per task (status, progress bar,
  percent), aggregate queue percent in the header, keys 1-9 cancel that
  row's task, 'a' cancels all unfinished, 'q' leaves the monitor (the
  queue keeps running). The headless analog of the reference's window.""",
    "queue": """\
queue persistence
  --save-queue FILE writes the queue state (tasks, params, status) as
  JSON; `lut-tpu resume FILE` reloads it — interrupted RUNNING tasks
  come back as PENDING. `resume --reapply <flags>` re-snapshots fresh
  parameters onto every pending task first (smart defaults re-run per
  source, fresh output names), mirroring the reference's behavior when
  Start is pressed after changing settings.""",
    "naming": """\
output naming
  Outputs land in --out-dir (default <source>/output) as stem_out.ext;
  collisions get _1, _2... suffixes (never overwritten). Pro masters:
  stem_master.mov in --master-dir. Covers: stem_cover.jpg.""",
}

ALIASES = {
    "bit-depth": "bit_depth", "bit_depth_policy": "bit_depth",
    "lut_interp": "interp", "tetrahedral": "interp",
    "zscale_dither": "dither", "lut_input_matrix": "input_matrix",
    "lut_output_tags": "output_tags", "tags": "output_tags",
    "matrix": "input_matrix", "save-queue": "queue", "resume": "queue",
    "reapply": "queue", "master-dir": "mode", "pro": "mode", "fast": "mode",
    "monitor": "watch", "output": "naming", "audio-codec": "audio",
}


def help_text(topic: str = "") -> str:
    if not topic:
        lines = ["topics (lut-tpu help <topic>):", ""]
        for name in sorted(TOPICS):
            first = TOPICS[name].splitlines()[0]
            lines.append(f"  {name:<14} {first}")
        return "\n".join(lines)
    key = ALIASES.get(topic, topic)
    if key in TOPICS:
        return TOPICS[key]
    return (f"unknown topic {topic!r}; run `lut-tpu help` for the list")
