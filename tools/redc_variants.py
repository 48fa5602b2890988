"""A/B micro-bench of RNS REDC variants at production shapes (scratch tool).

Times unrolled chains (slope between n1 and n2 iterations, one sync each) of
candidate redc implementations on (ROWS, COMPS, LANES) int32 stacks — the
pipeline's stacked-reduction shape — to find per-row cost reductions before
touching the production code path.
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

from plonky2_bls12_381_pairing_tpu import rns_constants as RC
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp

ROWS, COMPS = 1024, 12
rng = np.random.default_rng(7)
X = jnp.asarray(rng.integers(0, RC.PRIME_MAX // 2, (ROWS, COMPS, RC.LANES))
                .astype(np.int32) * (RC.MODULI > 1))

_PB = RC.PLANE_BITS
M = jnp.asarray(RC.M_I32)
INV_M = jnp.asarray(RC.INV_M_F32)


def barrett_sel(x):
    q = jax.lax.round(x.astype(jnp.float32) * INV_M,
                      jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(jnp.int32)
    r = x - q * M
    return jnp.where(r < 0, r + M, r)


def barrett_arith(x):
    q = jax.lax.round(x.astype(jnp.float32) * INV_M,
                      jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(jnp.int32)
    r = x - q * M
    return r + ((r >> 31) & M)


def barrett_raw(x):
    q = jax.lax.round(x.astype(jnp.float32) * INV_M,
                      jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(jnp.int32)
    return x - q * M


import ml_dtypes

T1 = [jnp.asarray(m.astype(np.float32).astype(ml_dtypes.bfloat16))
      for m in (RC.T1_LO, RC.T1_HI, RC.T1_SUM)]
T2 = [jnp.asarray(m.astype(np.float32).astype(ml_dtypes.bfloat16))
      for m in (RC.T2_LO, RC.T2_HI, RC.T2_SUM)]
T1S = jnp.stack(T1)
T2S = jnp.stack(T2)
CS = jnp.asarray(RC.C_SIGMA)
CMM = jnp.asarray(RC.C_MAINV_MBINV)
CPM = jnp.asarray(RC.C_PMAINV_MBINV)
CMA = jnp.asarray(RC.C_MAINV)
CPA = jnp.asarray(RC.C_PMAINV)
ISA = jnp.asarray(RC.IS_A.astype(np.int32))
MAMOD = [jnp.asarray(RC.C_MAMOD_BY_SLOT[k]) for k in range(RC.PACK)]
MBMOD = [jnp.asarray(RC.C_MBMOD_BY_SLOT[k]) for k in range(RC.PACK)]


def mm(x, mat):
    return jnp.einsum("...k,kj->...j", x.astype(jnp.bfloat16), mat,
                      preferred_element_type=jnp.float32).astype(jnp.int32)


def ext_sep(x, planes):
    xl = x & ((1 << _PB) - 1)
    xh = x >> _PB
    ll = mm(xl, planes[0])
    hh = mm(xh, planes[1])
    cross = mm(xl + xh, planes[2]) - ll - hh
    return ll + (cross << _PB) + (hh << (2 * _PB))


def ext_batched(x, planes_stacked):
    """One batched (3, ..., 128)@(3, 128, 128) dot_general."""
    xl = x & ((1 << _PB) - 1)
    xh = x >> _PB
    xs = jnp.stack([xl, xh, xl + xh])  # (3, ..., LANES)
    outs = jnp.einsum("p...k,pkj->p...j", xs.astype(jnp.bfloat16),
                      planes_stacked,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    ll, hh, sm = outs[0], outs[1], outs[2]
    cross = sm - ll - hh
    return ll + (cross << _PB) + (hh << (2 * _PB))


def make_redc(barrett_c, barrett_r, ext, t1, t2):
    def redc(xc):
        sigma = barrett_c(xc * CS)
        s = ext(sigma, t1)
        corr = 0
        for k in range(RC.PACK):
            lane = k * RC.SUB + RC.ALPHA_LANE
            alpha_k = s[..., lane:lane + 1] >> RC.ALPHA_T
            corr = corr + alpha_k * MAMOD[k]
        qhat = barrett_r(s - corr)
        sigma2 = barrett_c(xc * CMM + qhat * CPM)
        s2 = ext(sigma2, t2)
        corr2 = 0
        for k in range(RC.PACK):
            lane = k * RC.SUB + RC.ALPHA_LANE
            beta_k = (s2[..., lane:lane + 1] + (1 << (RC.BETA_T - 1))) >> RC.BETA_T
            corr2 = corr2 + beta_k * MBMOD[k]
        pre = jnp.where(ISA != 0, s2 - corr2, xc * CMA + qhat * CPA)
        return barrett_c(pre)
    return redc


VARIANTS = {
    "baseline": make_redc(barrett_sel, barrett_raw, ext_sep, T1, T2),
    "arith_mask": make_redc(barrett_arith, barrett_raw, ext_sep, T1, T2),
    "batched_mm": make_redc(barrett_sel, barrett_raw, ext_batched, T1S, T2S),
    "arith+batched": make_redc(barrett_arith, barrett_raw, ext_batched,
                               T1S, T2S),
}


def chain(body, n):
    def f(a):
        for _ in range(n):
            a = body(a)
        return a
    return jax.jit(f)


def best_time(fn, reps=5):
    np.asarray(jnp.sum(fn(X)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(fn(X)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


n1, n2 = 16, 144
base_rows_ns = None
for name, body in VARIANTS.items():
    t1 = best_time(chain(body, n1))
    t2 = best_time(chain(body, n2))
    ns = (t2 - t1) * 1e9 / ((n2 - n1) * ROWS * COMPS)
    # sanity: variants must agree with the production redc bit-for-bit
    ref = np.asarray(rfp.redc(rfp.wrap(X)))
    got = np.asarray(jax.jit(body)(X))
    ok = bool((ref == got).all())
    if base_rows_ns is None:
        base_rows_ns = ns
    print(f"{name:16s} {ns:7.2f} ns/row   x{base_rows_ns/ns:5.2f}   "
          f"bit-exact={ok}")

# -- component split: matmuls-only vs elementwise-only ---------------------

def matmuls_only(xc):
    s = ext_sep(xc & 0x1FFF, T1)
    s2 = ext_sep((s >> 5) & 0x1FFF, T2)
    return s2


def elementwise_only(xc):
    sigma = barrett_sel(xc * CS)
    s = sigma  # pretend the matmul is free
    corr = 0
    for k in range(RC.PACK):
        lane = k * RC.SUB + RC.ALPHA_LANE
        alpha_k = s[..., lane:lane + 1] >> RC.ALPHA_T
        corr = corr + alpha_k * MAMOD[k]
    qhat = barrett_raw(s - corr)
    sigma2 = barrett_sel(xc * CMM + qhat * CPM)
    s2 = sigma2
    corr2 = 0
    for k in range(RC.PACK):
        lane = k * RC.SUB + RC.ALPHA_LANE
        beta_k = (s2[..., lane:lane + 1] + (1 << (RC.BETA_T - 1))) >> RC.BETA_T
        corr2 = corr2 + beta_k * MBMOD[k]
    pre = jnp.where(ISA != 0, s2 - corr2, xc * CMA + qhat * CPA)
    return barrett_sel(pre)


def splits_only(xc):
    """plane splits + recombines, no dots, no barretts."""
    xl = xc & ((1 << _PB) - 1)
    xh = xc >> _PB
    s = xl + ((xl + xh) << _PB) + (xh << (2 * _PB))
    xl2 = s & ((1 << _PB) - 1)
    xh2 = s >> _PB
    return xl2 + ((xl2 + xh2) << _PB) + (xh2 << (2 * _PB))


for name, body in (("matmuls_only", matmuls_only),
                   ("elementwise_only", elementwise_only),
                   ("splits_only", splits_only)):
    t1 = best_time(chain(body, n1))
    t2 = best_time(chain(body, n2))
    ns = (t2 - t1) * 1e9 / ((n2 - n1) * ROWS * COMPS)
    print(f"{name:16s} {ns:7.2f} ns/row")
