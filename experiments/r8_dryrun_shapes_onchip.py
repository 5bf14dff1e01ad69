"""Compile the three __graft_entry__ dryrun program shapes on the REAL
chip (round 5, closes r4 VERDICT weak #5): the multichip dryrun validates
the sharded program STRUCTURE in interpret mode on a CPU mesh; this runs
the exact same make_sharded_render_fn path — 33^3 auto tier, 65^3 merged
coarse2f kernel, 422p10 fused — COMPILED on a 1-device TPU mesh, checking
the compiled sharded outputs against the unsharded reference (<=1 LSB).

RESULT 2026-08-19 (v5e, axon): see FINDINGS.md "Dryrun shapes compiled
on-chip".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from __graft_entry__ import _dryrun_impl

assert jax.devices()[0].platform == "tpu", jax.devices()
t0 = time.time()
_dryrun_impl(1)
print(f"compiled 1-device-mesh dryrun set in {time.time() - t0:.0f}s")
