"""Per-phase timing of the limb-tier pairing pipeline on TPU (dev
diagnostic; the RNS tier's equivalent is tools/rns_phase_bench.py).

Reps sync via host transfer. Only the miller_steps and final_exp rows get
fresh fq12 inputs per rep; the prepare_g2 / scale+stack / full_pairing rows
reuse the same points each rep (their timings are dominated by on-device
compute, not replayable caches).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.ops import fp, fq12
from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.models import pairing as mp

fp.set_strategy(os.environ.get("PB_STRATEGY", "fused"))
B = int(os.environ.get("MB_B", "512"))
REPS = 3

prep = jax.jit(mp.prepare_g2)
def scale_stack(p, q, coeffs):
    ps, scaled = mp.scale_all_coeffs(p, coeffs, q.infinity)
    return mp.stack_steps(scaled)
scale = jax.jit(scale_stack)

def miller_only(f0, xs):
    f = mp.miller_steps(f0, xs, jnp.asarray(mp._DO_SQUARE))
    return fq12.conjugate(f)
miller = jax.jit(miller_only)
fexp = jax.jit(mp.final_exponentiation)
pair = jax.jit(mp.pairing)

def timeit(name, fn, argss):
    out = fn(*argss[0])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    ts = []
    for args in argss:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:14s} best={min(ts)*1e3:9.2f} ms  all={[round(t*1e3,1) for t in ts]}")
    return out

# distinct inputs per rep: generator batch with a per-rep roll of the batch axis
def pq(i):
    p = G1Affine.generator((B,))
    q = G2Affine.generator((B,))
    return p, q

p, q = pq(0)
coeffs = prep(q)
xs = scale(p, q, coeffs)
rng = np.random.default_rng(1)
f0s = [jnp.asarray(rng.integers(0, 255, (B, 12, 48), dtype=np.int64), dtype=jnp.int32)
       for _ in range(REPS)]
fs = [jnp.asarray(rng.integers(0, 255, (B, 12, 48), dtype=np.int64), dtype=jnp.int32)
      for _ in range(REPS)]

timeit("prepare_g2", prep, [(q,)] * REPS)
timeit("scale+stack", scale, [(p, q, coeffs)] * REPS)
timeit("miller_steps", miller, [(f0, xs) for f0 in f0s])
timeit("final_exp", fexp, [(f,) for f in fs])
timeit("full_pairing", pair, [(p, q)] * REPS)
