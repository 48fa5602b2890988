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


def prepare_g2_stepmajor(q: G2Affine) -> jnp.ndarray:
    """Line-coefficient tensor in scan-native step-major layout
    (68, ..., 3, 2, LANES); infinity inputs are substituted with the
    generator (miller_loop.rs:218-219) and masked out inside the Miller
    scan. Step-major avoids two full-tensor transposition copies (the
    coefficient tensor is the pipeline's largest: ~430 MB at B=2048)."""
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
    assert coeffs.shape[0] == NUM_COEFFS
    return coeffs


def prepare_g2(q: G2Affine) -> jnp.ndarray:
    """Batch-major line-coefficient tensor (..., 68, 3, 2, LANES) — the
    reference G2PreparedTarget layout (miller_loop.rs:182-235)."""
    return jnp.moveaxis(prepare_g2_stepmajor(q), 0, -4)


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------


def _ell_scaled(f: jnp.ndarray, triple: jnp.ndarray, py: fp.R, px: fp.R,
                skip) -> jnp.ndarray:
    """One term's ell with in-scan coefficient scaling (ell's c0*P.y, c1*P.x,
    reference miller_loop.rs:450-456 — defect #1 fixed) and the reference's
    identity-select for infinity terms (:265-268): f is left unchanged.
    triple: (..., 3, 2, LANES) raw line triple for this step."""
    c0 = fp.wrap(triple[..., 0, :, :])
    c1 = fp.wrap(triple[..., 1, :, :])
    c2 = triple[..., 2, :, :]
    r0 = fp.mul_rr(c0, py)  # (..., 2, LANES)
    r1 = fp.mul_rr(c1, px)
    merged = fp.R(jnp.concatenate([r0.ch, r1.ch], axis=-2),
                  min(r0.lo, r1.lo), max(r0.hi, r1.hi),
                  min(r0.vlo, r1.vlo), max(r0.vhi, r1.vhi))
    sc = fp.redc(merged)  # rows 0:2 = c0*P.y, rows 2:4 = c1*P.x
    new_f = tower.mul_by_014(f, c2, sc[..., 2:4, :], sc[..., 0:2, :])
    return jnp.where(skip[..., None, None] != 0, f, new_f)


def miller_steps_raw(f: jnp.ndarray, raw_list: list, pys: list, pxs: list,
                     skips: list, do_square: jnp.ndarray) -> jnp.ndarray:
    """Scan the Miller accumulation over step-major RAW triples, scaling each
    step's coefficients inside the body (4 extra REDC rows per term — far
    cheaper than materializing a scaled copy of the 68-step tensor)."""

    def body(f, x):
        triples, flag = x
        for t in range(len(raw_list)):
            f = _ell_scaled(f, triples[t], pys[t], pxs[t], skips[t])
        f = jax.lax.cond(flag != 0, tower.square, lambda y: y, f)
        return f, None

    f, _ = jax.lax.scan(body, f, (tuple(raw_list), do_square))
    return f


def miller_loop(ps, prepared_stepmajor, q_infinities=None) -> jnp.ndarray:
    """Fused product of Miller loops over T terms.

    ps: G1Affine or list; prepared_stepmajor: matching (68, ..., 3, 2, L)
    tensors from prepare_g2_stepmajor. Returns f: (..., 12, LANES)
    (reference multi_miller_loop, miller_loop.rs:247-344)."""
    if not isinstance(ps, (list, tuple)):
        ps = [ps]
        prepared_stepmajor = [prepared_stepmajor]
        q_infinities = [q_infinities]
    if q_infinities is None:
        q_infinities = [None] * len(ps)
    pys, pxs, skips = [], [], []
    for p, qinf in zip(ps, q_infinities):
        if qinf is None:
            qinf = jnp.zeros(p.infinity.shape, dtype=jnp.int32)
        pys.append(fp.wrap(p.y[..., None, :]))
        pxs.append(fp.wrap(p.x[..., None, :]))
        skips.append(((p.infinity != 0) | (qinf != 0)).astype(jnp.int32))
    batch = ps[0].infinity.shape
    f = jnp.broadcast_to(tower.one(), (*batch, 12, fp.LANES))
    f = miller_steps_raw(f, prepared_stepmajor, pys, pxs, skips,
                         jnp.asarray(base._DO_SQUARE))
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
    coeffs = prepare_g2_stepmajor(q)
    f = miller_loop(p, coeffs, q.infinity)
    return final_exponentiation(f)


def multi_pairing(ps: list, qs: list) -> jnp.ndarray:
    prepared = [prepare_g2_stepmajor(q) for q in qs]
    f = miller_loop(ps, prepared, [q.infinity for q in qs])
    return final_exponentiation(f)


def pairing_check(ps: list, qs: list) -> jnp.ndarray:
    return tower.is_one(multi_pairing(ps, qs))
