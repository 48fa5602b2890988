"""Benchmark: batched full BLS12-381 pairings per second on one chip.

Prints ONE JSON line:
  {"metric": "pairings/s/chip", "value": N, "unit": "pairings/s",
   "vs_baseline": N / 25000}

vs_baseline is the fraction of the per-chip north-star target: BASELINE.md sets
>= 1e5 full pairings/s on a v5p-8 (4 chips) => 2.5e4 pairings/s/chip. The Rust
reference publishes no numbers (BASELINE.md), so the north star is the bar.

Includes an on-chip bit-exactness gate vs the exact-int oracle before timing.
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

from plonky2_bls12_381_pairing_tpu.models import pairing as mp
from plonky2_bls12_381_pairing_tpu.ops import fq12
from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

B = int(os.environ.get("BENCH_BATCH", "512"))
GATE = 8  # instances checked bit-exactly against the oracle
REPS = int(os.environ.get("BENCH_REPS", "5"))


def make_inputs(b: int):
    """b distinct points; C++ native tier when available (batched scalar
    muls across threads), else incremental Python additions."""
    try:
        from plonky2_bls12_381_pairing_tpu import native

        if native.available():
            ks = list(range(1, b + 1))
            return native.g1_mul_batch(ks), native.g2_mul_batch(ks)
    except Exception:
        pass
    g1, g2 = rm.G1Affine.generator(), rm.G2Affine.generator()
    p, q = g1, g2
    ps, qs = [], []
    for _ in range(b):
        ps.append(p)
        qs.append(q)
        p = p.add(g1)
        q = q.add(g2)
    return ps, qs


def oracle_pairings(ps, qs):
    """Expected e(P,Q) values: native tier if available, else exact-int."""
    try:
        from plonky2_bls12_381_pairing_tpu import native

        if native.available():
            return native.pairing_batch(ps, qs)
    except Exception:
        pass
    return [rm.pairing(p, q) for p, q in zip(ps, qs)]


def main():
    dev = jax.devices()[0]
    ps, qs = make_inputs(B)
    P = jax.device_put(G1Affine.encode(ps), dev)
    Q = jax.device_put(G2Affine.encode(qs), dev)

    fn = jax.jit(mp.pairing)
    t0 = time.time()
    out = fn(P, Q)
    out.block_until_ready()
    compile_time = time.time() - t0

    # correctness gate: first GATE instances bit-exact vs oracle
    # (slice on device first: big device->host transfers crawl over the tunnel)
    got = fq12.decode(np.array(out[:GATE]))
    want = oracle_pairings(ps[:GATE], qs[:GATE])
    if list(got) != want:
        print(json.dumps({"metric": "pairings/s/chip", "value": 0,
                          "unit": "pairings/s", "vs_baseline": 0.0,
                          "error": "bit-exactness gate FAILED"}))
        sys.exit(1)

    # timed region
    times = []
    for _ in range(REPS):
        t0 = time.time()
        fn(P, Q).block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    pps = B / best

    print(json.dumps({
        "metric": "pairings/s/chip",
        "value": round(pps, 2),
        "unit": "pairings/s",
        "vs_baseline": round(pps / 25000.0, 4),
        "batch": B,
        "best_s": round(best, 4),
        "compile_s": round(compile_time, 1),
        "device": str(dev),
        "gate": "bit-exact",
    }))


if __name__ == "__main__":
    main()
