"""Per-phase timing of the RNS pairing pipeline on TPU.

Phases are jitted separately; syncs use a 4-byte scalar host transfer (plain
block_until_ready does not synchronize over the axon tunnel, and transferring
large coefficient tensors would pollute the numbers).

Scale: MB_B is the ELEMENT batch (matching bench.py's BENCH_BATCH); packed
tensors have MB_B/2 rows, so every phase runs at true pipeline scale. Inputs
to the pure phases are REPRESENTATIVE stored elements (rfp/tower encodings of
random field values, tiled over the batch) — random lane noise would decode
to values far above the 4p stored bound and violate the REDC domain.

Set PHASES_JSON=<path> to record the numbers as an artifact (the perf
attribution record — VERDICT r3 weak #5).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp, tower
from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

if jax.default_backend() == "tpu" or os.environ.get("RNS_FUSED"):
    rfp.set_fused(True)  # production strategy on real hardware

B = int(os.environ.get("MB_B", "2048"))  # elements; rows = B/2
REPS = 3

prep = jax.jit(mpr.prepare_g2_stepmajor)
miller = jax.jit(lambda coeffs, p, q: mpr.miller_loop(p, coeffs, q.infinity))
fexp = jax.jit(mpr.final_exponentiation)
easy = jax.jit(lambda f: tower.mul(tower.conjugate(f), tower.inv(f)))
fpinv = jax.jit(rfp.inv)
pair = jax.jit(mpr.pairing)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.sum(leaves[0]))


results = {}


def timeit(name, fn, argss):
    out = fn(*argss[0])
    _sync(out)
    ts = []
    for args in argss:
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    results[name] = round(min(ts) * 1e3, 2)
    print(f"{name:14s} best={min(ts)*1e3:9.2f} ms  all={[round(t*1e3,1) for t in ts]}",
          flush=True)
    return out


p = G1Affine.generator((B,))
q = G2Affine.generator((B,))
coeffs = prep(q)

# fixed sync cost of this harness (no-op jit + scalar transfer): over the
# axon tunnel this is ~24 ms and is INCLUDED in every phase time below —
# subtract it to compare phases against bench.py's slope-based best_s
timeit("sync_overhead", jax.jit(lambda x: x + 1),
       [(jnp.zeros((8, 128), jnp.int32),)] * REPS)

# representative stored Fq12 elements: encode a small pool of random field
# values, tile over the batch (timing has no data-dependent paths)
rng = np.random.default_rng(1)
POOL = 32  # packed rows


def rand12(seed):
    r = np.random.default_rng(seed)
    vals = [rm.Fq12.from_coeffs([int(r.integers(0, 1 << 62)) for _ in range(12)])
            for _ in range(2 * POOL)]
    enc = np.asarray(tower.encode(vals))  # (POOL, 12, LANES)
    reps = -(-(B // 2) // POOL)
    return jnp.asarray(np.tile(enc, (reps, 1, 1))[: B // 2])


fs = [rand12(s) for s in range(REPS)]
f1s = [f[:, 0, :] for f in fs]

timeit("prepare_g2", prep, [(q,)] * REPS)
timeit("miller_loop", miller, [(coeffs, p, q)] * REPS)
timeit("fp_inv", fpinv, [(f,) for f in f1s])
timeit("easy_part", easy, [(f,) for f in fs])
timeit("final_exp", fexp, [(f,) for f in fs])
timeit("full_pairing", pair, [(p, q)] * REPS)

if os.environ.get("PHASES_JSON"):
    payload = {
        "batch_elements": B,
        "fused": bool(os.environ.get("RNS_FUSED")),
        "device": str(jax.devices()[0]),
        "phases_ms": results,
        "note": ("per-phase best-of-%d wall times, separately jitted at true "
                 "pipeline scale; full_pairing is the end-to-end graph (its "
                 "phases overlap/fuse differently, so phase times need not "
                 "sum to it)" % REPS),
    }
    with open(os.environ["PHASES_JSON"], "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", os.environ["PHASES_JSON"])
