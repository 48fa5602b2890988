"""Scaling-efficiency report (BASELINE.md distribution gate, VERDICT r1 #7).

Times the identical batched pairing workload on a 1-device mesh vs an
N-device dp mesh (virtual CPU devices when no multi-chip TPU is attached —
the same environment as the driver's dryrun_multichip) and writes SCALING.json
with the parallel efficiency  eff = t1 / (N * tN).

Run under the dryrun environment:
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scaling_report.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.parallel import mesh as pm

B = int(os.environ.get("SCALING_BATCH", "64"))  # elements (2/packed row)
REPS = int(os.environ.get("SCALING_REPS", "3"))


def run_on(devices):
    m = pm.make_mesh(devices)
    p = G1Affine.generator((B,))
    q = G2Affine.generator((B,))
    ps, qs = pm.shard_points_rns(p, q, m)
    fn = pm.rns_pairing_and_product_sharded(m)
    t0 = time.time()
    e, gt = fn(ps, qs)
    jax.block_until_ready((e, gt))
    compile_s = time.time() - t0
    times = []
    for _ in range(REPS):
        t0 = time.time()
        jax.block_until_ready(fn(ps, qs))
        times.append(time.time() - t0)
    return min(times), compile_s


def main():
    devs = jax.devices()
    n = len(devs)
    # full N = 1/2/4/.../n wall-time curve (VERDICT r4 #6)
    curve = {}
    k = 1
    while k <= n:
        tk, ck = run_on(devs[:k])
        curve[k] = {"t_s": round(tk, 4), "compile_s": round(ck, 1)}
        k *= 2
    t1, c1 = curve[1]["t_s"], curve[1]["compile_s"]
    tn, cn = curve[max(curve)]["t_s"], curve[max(curve)]["compile_s"]
    eff = t1 / (n * tn) if n > 1 else 1.0
    n_cores = os.cpu_count() or 1
    virtual = devs[0].platform == "cpu" and n > n_cores
    out = {
        "batch": B,
        "n_devices": n,
        "platform": devs[0].platform,
        "t_1dev_s": round(t1, 4),
        "t_ndev_s": round(tn, 4),
        "speedup": round(t1 / tn, 3),
        "efficiency": round(eff, 3),
        # On virtual CPU devices the N "devices" time-share the same physical
        # cores, so parallel speedup is unobservable by construction and
        # `efficiency` bottoms out near 1/N regardless of the sharding
        # quality. What IS measurable there is the cost the dp sharding adds
        # on identical total work (collectives + smaller per-device fusion
        # scope): sharding_overhead = t_ndev/t_1dev - 1. On real multi-chip
        # hardware `efficiency` is the meaningful gate.
        "sharding_overhead": round(tn / t1 - 1.0, 3),
        "virtual_devices": virtual,
        "physical_cores": n_cores,
        "compile_1dev_s": round(c1, 1),
        "compile_ndev_s": round(cn, 1),
        "device_curve": {str(k): v for k, v in curve.items()},
        "note": "dp-sharded RNS pairing_and_product (production tier); "
                "virtual CPU devices mirror the dryrun topology when no "
                "multi-chip TPU is attached — see sharding_overhead vs "
                "efficiency semantics above",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
