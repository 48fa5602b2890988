"""Hardware per-op time attribution for the production RNS pairing (VERDICT
r4 #3): replaces the analytic lane-op model's saturation claim with a MEASURED
device-time breakdown.

Captures a Perfetto trace (jax.profiler, create_perfetto_trace=True) around
reps dispatches of the jitted full pairing on the real chip, aggregates the
device-track complete events by HLO op, and writes XPROF_JSON (default
XPROF_r05.json) with:
  * total device busy time vs wall (pipeline occupancy),
  * top ops by self time with their share of busy time,
  * coarse class shares: MXU dots (REDC base extensions), elementwise
    fusions (Barrett passes + channel products + tower glue), copies/layout.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp
from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine, G2Affine

B = int(os.environ.get("XPROF_B", "2048"))
REPS = int(os.environ.get("XPROF_REPS", "3"))
LOGDIR = os.environ.get("XPROF_LOGDIR", "/tmp/xprof_pairing")
OUT = os.environ.get("XPROF_JSON", "XPROF_r05.json")

if jax.default_backend() == "tpu":
    rfp.set_fused(True)

p = G1Affine.generator((B,))
q = G2Affine.generator((B,))
fn = jax.jit(mpr.pairing)
out = fn(p, q)
out.block_until_ready()

# untraced dispatch time (2-point slope, one sync each) for the occupancy
# denominator — the profiler itself distorts wall time
def timed(reps):
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = fn(p, q)
    jax.block_until_ready(o)
    return time.perf_counter() - t0

t1 = min(timed(1) for _ in range(3))
t3 = min(timed(3) for _ in range(3))
dispatch_s = max(1e-9, (t3 - t1) / 2)

t0 = time.perf_counter()
jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
for _ in range(REPS):
    out = fn(p, q)
out.block_until_ready()
jax.profiler.stop_trace()
wall = time.perf_counter() - t0

# newest perfetto trace under LOGDIR
paths = sorted(glob.glob(os.path.join(LOGDIR, "**", "*.json.gz"),
                         recursive=True), key=os.path.getmtime)
assert paths, f"no perfetto trace written under {LOGDIR}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"] if isinstance(trace, dict) else trace
# device-track detection: TPU op tracks live under process names containing
# "TPU" / "/device:"; host python tracks are excluded
pid_name = {}
tid_name = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

def is_device(e):
    pn = pid_name.get(e.get("pid"), "")
    tn = tid_name.get((e.get("pid"), e.get("tid")), "")
    return ("TPU" in pn or "/device" in pn.lower()) and "step" not in tn.lower() \
        and "XLA Modules" not in tn

# SELF time per event: device-track events nest (a while op's duration
# contains its body's ops), so flat summing double-counts. Per track, sort by
# (ts, -dur) and run an interval stack; each event's self time is its
# duration minus its direct children's durations.
tracks = {}
for e in events:
    if e.get("ph") != "X" or not is_device(e):
        continue
    tracks.setdefault((e.get("pid"), e.get("tid")), []).append(e)

agg = {}
busy = 0.0


def base_name(n: str) -> str:
    """Strip the trailing .<id> so fusions/whiles aggregate by kind."""
    head, _, tail = n.rpartition(".")
    return head if head and tail.isdigit() else n


for evs in tracks.values():
    evs.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0.0))))
    stack = []  # (end_ts, child_time_accum_index) via list of [end, child_sum, name, dur]
    for e in evs:
        ts = float(e["ts"])
        dur = float(e.get("dur", 0.0))
        while stack and ts >= stack[-1][0] - 1e-9:
            end, child_sum, name, d = stack.pop()
            self_t = max(0.0, d - child_sum)
            agg[base_name(name)] = agg.get(base_name(name), 0.0) + self_t
            busy += self_t
        if stack:
            stack[-1][1] += dur  # direct child of current top
        stack.append([ts + dur, 0.0, e.get("name", "?"), dur])
    while stack:
        end, child_sum, name, d = stack.pop()
        self_t = max(0.0, d - child_sum)
        agg[base_name(name)] = agg.get(base_name(name), 0.0) + self_t
        busy += self_t

top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]

def cls(name: str) -> str:
    n = name.lower()
    if "dot" in n or "conv" in n:
        return "mxu_dot"
    if any(k in n for k in ("fusion", "add", "subtract", "multiply", "select",
                            "compare", "round", "convert", "divide")):
        return "elementwise_fusion"
    if any(k in n for k in ("copy", "transpose", "reshape", "concatenate",
                            "slice", "broadcast", "bitcast")):
        return "data_movement"
    if "custom" in n or "tpu" in n:
        return "custom_call"
    return "other"

classes = {}
for name, d in agg.items():
    classes[cls(name)] = classes.get(cls(name), 0.0) + d

per_batch_us = busy / max(REPS, 1)
result = {
    "batch": B,
    "reps": REPS,
    "wall_s": round(wall, 4),
    "device_busy_s": round(busy * 1e-6, 4),
    "busy_per_dispatch_ms": round(per_batch_us * 1e-3, 3),
    "dispatch_ms_untraced": round(dispatch_s * 1e3, 3),
    "occupancy": round(per_batch_us * 1e-6 / dispatch_s, 4),
    "class_shares_of_busy": {k: round(v / busy, 4)
                             for k, v in sorted(classes.items(),
                                                key=lambda kv: -kv[1])},
    "top_ops": [{"name": n[:120], "us": round(d, 1),
                 "share_of_busy": round(d / busy, 4)} for n, d in top],
    "note": ("device-track complete events aggregated from the perfetto "
             "trace of REPS dispatches of jit(pairing) at production batch; "
             "shares are of device busy time"),
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: result[k] for k in
                  ("busy_per_dispatch_ms", "occupancy",
                   "class_shares_of_busy")}, indent=1))
print("top ops:")
for t in result["top_ops"][:12]:
    print(f"  {t['share_of_busy']*100:5.1f}%  {t['us']:>10.0f}us  {t['name']}")
print(f"wrote {OUT}")
