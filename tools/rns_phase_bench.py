"""Per-phase timing of the RNS pairing pipeline on TPU (dev diagnostic).

Phases are jitted separately; syncs use block_until_ready on the device
output (no host transfer, so large coefficient tensors don't pollute the
numbers — the lesson of tools/phase_bench.py over the tunneled TPU).
"""
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
from plonky2_bls12_381_pairing_tpu.models import pairing as base
from plonky2_bls12_381_pairing_tpu.ops.rns import fp, tower
from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine, G2Affine

if os.environ.get("RNS_FUSED"):
    fp.set_fused(True)

B = int(os.environ.get("MB_B", "2048"))
REPS = 3

prep = jax.jit(mpr.prepare_g2_stepmajor)


def miller_only(f0, coeffs, p, q):
    f = mpr.miller_loop(p, coeffs, q.infinity)
    return f


miller = jax.jit(miller_only)
fexp = jax.jit(mpr.final_exponentiation)
easy = jax.jit(lambda f: tower.mul(tower.conjugate(f), tower.inv(f)))
fpinv = jax.jit(fp.inv)
pair = jax.jit(mpr.pairing)


def _sync(out):
    # block_until_ready does not synchronize over the axon tunnel; a 4-byte
    # scalar host transfer does.
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.sum(leaves[0]))


def timeit(name, fn, argss):
    out = fn(*argss[0])
    _sync(out)
    ts = []
    for args in argss:
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:14s} best={min(ts)*1e3:9.2f} ms  all={[round(t*1e3,1) for t in ts]}",
          flush=True)
    return out


p = G1Affine.generator((B,))
q = G2Affine.generator((B,))
coeffs = prep(q)
rng = np.random.default_rng(1)
# random fq12-shaped residue tensors (canonical channels) for the pure phases
def rand12():
    r = rng.integers(0, 3500, (B, 12, 128), dtype=np.int64).astype(np.int32)
    r[..., 68:] = 0
    return jnp.asarray(r)

f0s = [rand12() for _ in range(REPS)]
fs = [rand12() for _ in range(REPS)]
f1s = [rand12()[:, 0, :] for _ in range(REPS)]

timeit("prepare_g2", prep, [(q,)] * REPS)
timeit("miller_loop", miller, [(f0, coeffs, p, q) for f0 in f0s])
timeit("fp_inv", fpinv, [(f,) for f in f1s])
timeit("easy_part", easy, [(f,) for f in fs])
timeit("final_exp", fexp, [(f,) for f in fs])
timeit("full_pairing", pair, [(p, q)] * REPS)
