"""Batched BLS12-381 optimal-ate pairing on the RNS arithmetic tier.

Same pipeline as the flagship limb-tier model (models/pairing.py — the TPU
re-design of the reference's src/fields_as_trees/miller_loop.rs with defects
#1-#3 fixed), sharing its static schedule tables (_IS_ADD / _DO_SQUARE) and
hard-part instruction program (_HP_PROG), but running every field op on the
RNS core (ops/rns/): one int32 lane-multiply per Fp product, MXU base
extensions, no limb convolutions. Bit-compatible results: encode/decode round
through the same exact-integer refmodel, so e(P, Q) values are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import rns_constants as RC
from ..ops.rns import fp, tower
from ..ops.rns.lines import G1Affine, G2Affine, G2Projective, addition_step, doubling_step
from . import pairing as base

NUM_COEFFS = base.NUM_COEFFS


# ---------------------------------------------------------------------------
# G2 preparation (reference G2PreparedTarget, miller_loop.rs:182-235)
# ---------------------------------------------------------------------------


def prepare_g2(q: G2Affine) -> jnp.ndarray:
    """Line-coefficient tensor (..., 68, 3, 2, LANES); infinity inputs are
    substituted with the generator (miller_loop.rs:218-219) and masked out by
    the coefficient-scaling stage."""
    batch = q.infinity.shape
    q = G2Affine.generator(batch).conditional_select(q.infinity, q)
    r = G2Projective.from_affine(q)

    def body(r, is_add):
        r2, (c0, c1, c2) = jax.lax.cond(
            is_add != 0,
            lambda rr: addition_step(rr, q),
            doubling_step,
            r,
        )
        return r2, jnp.stack([c0, c1, c2], axis=-3)

    _, coeffs = jax.lax.scan(body, r, jnp.asarray(base._IS_ADD))
    coeffs = jnp.moveaxis(coeffs, 0, -4)
    assert coeffs.shape[-4] == NUM_COEFFS
    return coeffs


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------


def _scale_coeffs(p: G1Affine, q_infinity: jnp.ndarray,
                  coeffs: jnp.ndarray) -> jnp.ndarray:
    """Pre-scale all 68 triples by P (ell's c0*P.y, c1*P.x — defect #1 fixed)
    in two stacked REDCs, substituting multiply-by-one triples for infinity
    terms (models/pairing.py _scale_coeffs)."""
    c0 = coeffs[..., 0, :, :]  # (..., 68, 2, L)
    c1 = coeffs[..., 1, :, :]
    c2 = coeffs[..., 2, :, :]
    py = fp.wrap(jnp.broadcast_to(p.y[..., None, None, :], c0.shape))
    px = fp.wrap(jnp.broadcast_to(p.x[..., None, None, :], c1.shape))
    c0s = fp.redc(fp.mul_rr(fp.wrap(c0), py))
    c1s = fp.redc(fp.mul_rr(fp.wrap(c1), px))
    scaled = jnp.stack([c0s, c1s, c2], axis=-3)
    ident = jnp.zeros_like(scaled)
    one2 = np.zeros((2, fp.LANES), dtype=np.int32)
    one2[0] = RC.ONE
    ident = ident.at[..., 2, :, :].set(
        jnp.broadcast_to(jnp.asarray(one2), ident[..., 2, :, :].shape))
    skip = ((p.infinity != 0) | (q_infinity != 0))[..., None, None, None, None]
    return jnp.where(skip, ident, scaled)


def _ell(f: jnp.ndarray, triple: jnp.ndarray) -> jnp.ndarray:
    """f * line: mul_by_014(c2, c1, c0) with pre-scaled coefficients
    (reference miller_loop.rs:441-457)."""
    c0 = triple[..., 0, :, :]
    c1 = triple[..., 1, :, :]
    c2 = triple[..., 2, :, :]
    return tower.mul_by_014(f, c2, c1, c0)


def scale_all_coeffs(ps, prepared, q_infinities=None):
    if not isinstance(ps, (list, tuple)):
        ps = [ps]
        prepared = [prepared]
        q_infinities = [q_infinities]
    if q_infinities is None:
        q_infinities = [None] * len(ps)
    scaled = []
    for p, coeffs, qinf in zip(ps, prepared, q_infinities):
        if qinf is None:
            qinf = jnp.zeros(p.infinity.shape, dtype=jnp.int32)
        scaled.append(_scale_coeffs(p, qinf, coeffs))
    return ps, scaled


def stack_steps(scaled: list) -> jnp.ndarray:
    return jnp.stack([jnp.moveaxis(s, -4, 0) for s in scaled], axis=1)


def miller_steps(f: jnp.ndarray, xs: jnp.ndarray,
                 do_square: jnp.ndarray) -> jnp.ndarray:
    """One scan body: T ells + a cond square (models/pairing.py)."""
    n_terms = xs.shape[1]

    def body(f, x):
        triples, flag = x
        for t in range(n_terms):
            f = _ell(f, triples[t])
        f = jax.lax.cond(flag != 0, tower.square, lambda y: y, f)
        return f, None

    f, _ = jax.lax.scan(body, f, (xs, do_square))
    return f


def miller_loop(ps, prepared, q_infinities=None) -> jnp.ndarray:
    ps, scaled = scale_all_coeffs(ps, prepared, q_infinities)
    batch = ps[0].infinity.shape
    f = jnp.broadcast_to(tower.one(), (*batch, 12, fp.LANES))
    f = miller_steps(f, stack_steps(scaled), jnp.asarray(base._DO_SQUARE))
    if RC.rm.BLS_X_IS_NEGATIVE:
        f = tower.conjugate(f)
    return f


# ---------------------------------------------------------------------------
# Final exponentiation (reference miller_loop.rs:29-178)
# ---------------------------------------------------------------------------


def _run_fq12_program(prog: np.ndarray, init: jnp.ndarray, out_reg: int,
                      n_regs: int = 8) -> jnp.ndarray:
    """models/pairing.py VM executor over the RNS tower ops."""
    regs = jnp.broadcast_to(init, (n_regs, *init.shape))

    def body(regs, ins):
        x = regs[ins[2]]
        y = regs[ins[3]]
        out = jax.lax.switch(ins[0], [
            lambda: tower.mul(x, y),
            lambda: tower.cyclotomic_square(x),
            lambda: tower.conjugate(x),
            lambda: tower.frobenius_map(x),
            lambda: x,
        ])
        return jax.lax.dynamic_update_index_in_dim(regs, out, ins[1], 0), None

    regs, _ = jax.lax.scan(body, regs, jnp.asarray(prog))
    return regs[out_reg]


def final_exponentiation(f: jnp.ndarray) -> jnp.ndarray:
    """Easy part + the zkcrypto hard-part chain (f^(3*(p^12-1)/r); reference
    miller_loop.rs:128-178 with defect #2 fixed)."""
    t0 = tower.conjugate(f)
    t1 = tower.inv(f)
    t2 = tower.mul(t0, t1)
    t1 = t2
    t2 = tower.frobenius_pow(t2, 2)
    t2 = tower.mul(t2, t1)
    return _run_fq12_program(base._HP_PROG, t2, out_reg=3)


# ---------------------------------------------------------------------------
# Top-level API
# ---------------------------------------------------------------------------


def pairing(p: G1Affine, q: G2Affine) -> jnp.ndarray:
    """Batched full pairing e(P, Q) -> (..., 12, LANES) Gt elements."""
    coeffs = prepare_g2(q)
    f = miller_loop(p, coeffs, q.infinity)
    return final_exponentiation(f)


def multi_pairing(ps: list, qs: list) -> jnp.ndarray:
    prepared = [prepare_g2(q) for q in qs]
    f = miller_loop(ps, prepared, [q.infinity for q in qs])
    return final_exponentiation(f)


def pairing_check(ps: list, qs: list) -> jnp.ndarray:
    return tower.is_one(multi_pairing(ps, qs))
