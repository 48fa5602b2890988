"""Sub-phase timing of the RNS final exponentiation on TPU (scratch tool)."""

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

from plonky2_bls12_381_pairing_tpu import rns_constants as RC
from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp, tower
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

if jax.default_backend() == "tpu":
    rfp.set_fused(True)

B = int(os.environ.get("MB_B", "2048"))
rows = B // RC.PACK

rng = np.random.default_rng(3)
# representative cyclotomic-ish element: encode a real fq12 value tiled
import random
f12 = rm.rand_fq12(random.Random(5))
F = jnp.broadcast_to(tower.encode([f12, f12]), (rows, 12, RC.LANES))
C8 = tower.compress_cyclotomic(F)
SNAP = jnp.broadcast_to(C8[None], (6, rows, 8, RC.LANES))
DEN = jnp.broadcast_to(F[..., 0:1, :].reshape(rows, 1, RC.LANES),
                       (rows, 6, RC.LANES)).reshape(-1, RC.LANES)


def _sync(out):
    """Force a tiny device->host transfer (block_until_ready does not
    synchronize over the axon tunnel)."""
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.sum(leaves[0]))


def timed(fn, *args, n=3):
    """Rep-slope: t(4 reps) - t(1 rep) over 3, one sync each (bench.py
    method) — immune to the ~26 ms tunnel sync cost."""
    jfn = jax.jit(fn)
    _sync(jfn(*args))  # compile + warm

    def t_reps(r):
        t0 = time.perf_counter()
        out = None
        for _ in range(r):
            out = jfn(*args)
        _sync(out)
        return time.perf_counter() - t0

    t1 = min(t_reps(1) for _ in range(n))
    t4 = min(t_reps(4) for _ in range(n))
    return (t4 - t1) / 3


SYNC = timed(lambda x: x + 1, jnp.zeros((2,), jnp.int32))
print(f"sync overhead      {SYNC*1e3:8.2f} ms")


def one_exp(c):
    return mpr.cyclotomic_exp(tower.decompress_cyclotomic(c[None])[0])


segs = tuple(e - l for e, l in zip(mpr._X_SET_BITS, [0] + mpr._X_SET_BITS[:-1]))

from plonky2_bls12_381_pairing_tpu.ops.rns import pallas as rpk

cases = {
    "kara_chain(1 exp, kernel)": (lambda c: rpk.kara_exp_run(c, segs), C8),
    "kara_chain(1 exp, xla)": (None, None),  # filled below
    "decompress(6 snaps)": (tower.decompress_cyclotomic, SNAP),
    "fp_inv(6*rows rows)": (rfp.inv, DEN),
    "fq12_inv(easy)": (tower.inv, F),
    "cyc_square": (tower.cyclotomic_square, F),
    "fq12_mul": (lambda a: tower.mul(a, a), F),
    "frobenius": (tower.frobenius_map, F),
    "full final_exp": (mpr.final_exponentiation, F),
    "full cyclotomic_exp": (mpr.cyclotomic_exp, F),
}


def xla_chain(c):
    def sq_body(acc, _):
        return tower.compressed_square(acc), None
    snaps = []
    for seg in segs:
        if seg:
            c, _ = jax.lax.scan(sq_body, c, None, length=seg)
        snaps.append(c)
    return jnp.stack(snaps, axis=0)


cases["kara_chain(1 exp, xla)"] = (xla_chain, C8)

for name, (fn, arg) in cases.items():
    if fn is None:
        continue
    t = timed(fn, arg)
    print(f"{name:28s} {t*1e3:8.2f} ms")

# -- cyclotomic_exp internals ------------------------------------------------

def kara_only(f):
    c = tower.compress_cyclotomic(f)
    return rpk.kara_exp_run(c, segs)


def kara_decomp(f):
    c = tower.compress_cyclotomic(f)
    return tower.decompress_cyclotomic(rpk.kara_exp_run(c, segs))


def kara_decomp_tree(f):
    fulls = kara_decomp(f)
    cur = fulls
    while cur.shape[0] > 1:
        h = cur.shape[0] // 2
        prod = tower.mul(cur[:h], cur[h:2 * h])
        cur = (jnp.concatenate([prod, cur[2 * h:]], axis=0)
               if cur.shape[0] % 2 else prod)
    return tower.conjugate(cur[0])


for name, fn in (("kara_only(from f)", kara_only),
                 ("kara+decompress", kara_decomp),
                 ("kara+decomp+tree", kara_decomp_tree)):
    t = timed(fn, F)
    print(f"{name:28s} {t*1e3:8.2f} ms")
