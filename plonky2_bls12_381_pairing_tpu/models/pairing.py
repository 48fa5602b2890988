"""The batched BLS12-381 optimal-ate pairing — the framework's flagship model.

TPU re-design of the reference's tree-mode pairing layer
(src/fields_as_trees/miller_loop.rs): G2 line precomputation (G2Prepared, 68
triples, :182-235), the fused multi-Miller loop (:247-344), and the cyclotomic
final exponentiation (:29-178) — with the reference's defects #1-#3 fixed
(line scalings applied, cyclotomic-exp multiply kept, true Fq2 negation).

TPU-first structure (SURVEY.md §3.2 mapping):
  * Everything batches over a leading instance axis; the Miller accumulator is
    a (B, 12, NLIMBS) limb tensor.
  * The 64-entry bit schedule of BLS_X is *static*: it is compiled as 6
    segments — doubling-only `lax.scan` runs between the 5 unrolled
    addition steps — so the graph stays small while no add-step work is wasted.
  * Line coefficients are pre-scaled by P.x / P.y for all 68 steps in one
    batched op, and infinity terms are replaced by multiply-by-one triples, so
    the Miller body is pure mul_by_014 + square with no per-step masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops import fp, fq2, fq6, fq12, lines
from ..ops.curve import G1Affine, G2Affine, G2Projective

NUM_COEFFS = C.NUM_LINE_COEFFS  # 68


def _miller_segments():
    """Static segmentation of the 62-iteration schedule: list of
    (n_doubling_only_iters, has_add) with sum(n) == 62 and 5 adds."""
    segs = []
    run = 0
    for b in C.MILLER_BITS:
        run += 1
        if b:
            segs.append((run, True))
            run = 0
    if run:
        segs.append((run, False))
    assert sum(s[0] for s in segs) == 62 and sum(s[1] for s in segs) == 5
    return segs


_SEGMENTS = _miller_segments()


# ---------------------------------------------------------------------------
# G2 preparation (reference G2PreparedTarget, miller_loop.rs:182-235)
# ---------------------------------------------------------------------------


def prepare_g2(q: G2Affine) -> jnp.ndarray:
    """Line-coefficient tensor (..., 68, 3, 2, NLIMBS) for a batched G2 point.

    Like the tree-mode reference (miller_loop.rs:218-219, matching zkcrypto),
    an infinity input is substituted with the generator; the pairing masks the
    output to 1 via the coefficient-scaling stage instead.
    """
    batch = q.infinity.shape
    q = G2Affine.generator(batch).conditional_select(q.infinity, q)
    r = G2Projective.from_affine(q)

    def dbl_scan(r, _):
        r2, (c0, c1, c2) = lines.doubling_step(r)
        return r2, jnp.stack([c0, c1, c2], axis=-3)

    chunks = []
    for n_dbl, has_add in _SEGMENTS:
        if n_dbl > 1:
            r, cs = jax.lax.scan(dbl_scan, r, None, length=n_dbl - 1)
            # scan stacks on axis 0: (n, ..., 3, 2, L) -> (..., n, 3, 2, L)
            chunks.append(jnp.moveaxis(cs, 0, -4))
        r, (c0, c1, c2) = lines.doubling_step(r)
        chunks.append(jnp.stack([c0, c1, c2], axis=-3)[..., None, :, :, :])
        if has_add:
            r, (a0, a1, a2) = lines.addition_step(r, q)
            chunks.append(jnp.stack([a0, a1, a2], axis=-3)[..., None, :, :, :])
    # final doubling (the 68th triple)
    r, (c0, c1, c2) = lines.doubling_step(r)
    chunks.append(jnp.stack([c0, c1, c2], axis=-3)[..., None, :, :, :])
    coeffs = jnp.concatenate(chunks, axis=-4)
    assert coeffs.shape[-4] == NUM_COEFFS
    return coeffs


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------


def _scale_coeffs(p: G1Affine, q_infinity: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Scale all 68 line triples by the G1 point in one batched op
    (ell's c0*P.y, c1*P.x, reference miller_loop.rs:450-453 — defect #1 fixed),
    and substitute multiply-by-one triples for infinity terms so the Miller
    body needs no masking (the select-based equivalent of :265-268)."""
    c0 = coeffs[..., 0, :, :]  # (..., 68, 2, L)
    c1 = coeffs[..., 1, :, :]
    c2 = coeffs[..., 2, :, :]
    py = p.y[..., None, :]  # broadcast over the 68 steps
    px = p.x[..., None, :]
    c0s = fq2.scale_fp(c0, jnp.broadcast_to(py, c0.shape[:-2] + (fp.NLIMBS,)))
    c1s = fq2.scale_fp(c1, jnp.broadcast_to(px, c1.shape[:-2] + (fp.NLIMBS,)))
    scaled = jnp.stack([c0s, c1s, c2], axis=-3)  # (..., 68, 3, 2, L)
    # identity triple for mul_by_014(c2=one, c1=0, c0=0): ell multiplies by 1
    ident = jnp.zeros_like(scaled)
    one = fq2.one(())
    ident = ident.at[..., 2, :, :].set(jnp.broadcast_to(one, ident[..., 2, :, :].shape))
    skip = ((p.infinity != 0) | (q_infinity != 0))[..., None, None, None, None]
    return jnp.where(skip, ident, scaled)


def _ell(f: jnp.ndarray, triple: jnp.ndarray) -> jnp.ndarray:
    """f * line, with pre-scaled coefficients: mul_by_014(c2, c1, c0)
    (reference miller_loop.rs:441-457)."""
    c0 = triple[..., 0, :, :]
    c1 = triple[..., 1, :, :]
    c2 = triple[..., 2, :, :]
    return fq12.mul_by_014(f, c2, c1, c0)


#: Static coefficient-index offset at the start of each segment.
def _segment_offsets():
    offs = []
    idx = 0
    for n_dbl, has_add in _SEGMENTS:
        offs.append(idx)
        idx += n_dbl + (1 if has_add else 0)
    offs.append(idx)  # offset of the final doubling triple
    assert idx == NUM_COEFFS - 1
    return offs


_SEG_OFFSETS = _segment_offsets()


def scale_all_coeffs(ps, prepared, q_infinities=None):
    """Normalize term arguments and pre-scale all line coefficients by P."""
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


def miller_segment(f: jnp.ndarray, scaled: list, seg: int) -> jnp.ndarray:
    """Run one static schedule segment (checkpoint/resume granularity)."""
    n_dbl, has_add = _SEGMENTS[seg]
    idx = _SEG_OFFSETS[seg]

    def one_iter(f, triples):
        for t in range(len(scaled)):
            f = _ell(f, triples[t])
        return fq12.square(f)

    if n_dbl > 1:
        # doubling-only run as a scan over the coeff slices
        xs = jnp.stack(
            [s[..., idx : idx + n_dbl - 1, :, :, :] for s in scaled], axis=0
        )  # (T, ..., n, 3, 2, L)
        xs = jnp.moveaxis(xs, -4, 0)  # (n, T, ..., 3, 2, L)

        def body(f, triples):
            return one_iter(f, triples), None

        f, _ = jax.lax.scan(body, f, xs)
        idx += n_dbl - 1
    # the add-carrying (or trailing dbl-only) iteration, unrolled
    for t in range(len(scaled)):
        f = _ell(f, scaled[t][..., idx, :, :, :])
    idx += 1
    if has_add:
        for t in range(len(scaled)):
            f = _ell(f, scaled[t][..., idx, :, :, :])
        idx += 1
    return fq12.square(f)


def miller_finalize(f: jnp.ndarray, scaled: list) -> jnp.ndarray:
    """Final doubling-step ell (no square) + conjugate for negative x
    (miller_loop.rs:337-341)."""
    idx = _SEG_OFFSETS[-1]
    for t in range(len(scaled)):
        f = _ell(f, scaled[t][..., idx, :, :, :])
    if C.BLS_X_IS_NEGATIVE:
        f = fq12.conjugate(f)
    return f


def miller_loop(ps, prepared, q_infinities=None) -> jnp.ndarray:
    """Fused product of Miller loops over T terms, batched over leading axes.

    ps: G1Affine or list of T G1Affine; prepared: matching (..., 68, 3, 2, L)
    tensor(s) from prepare_g2. Returns f: (..., 12, NLIMBS).
    Reference multi_miller_loop (miller_loop.rs:247-344).
    """
    ps, scaled = scale_all_coeffs(ps, prepared, q_infinities)
    batch = ps[0].infinity.shape
    f = jnp.broadcast_to(fq12.one(), (*batch, 12, fp.NLIMBS))
    for seg in range(len(_SEGMENTS)):
        f = miller_segment(f, scaled, seg)
    return miller_finalize(f, scaled)


# ---------------------------------------------------------------------------
# Final exponentiation (reference miller_loop.rs:29-178)
# ---------------------------------------------------------------------------


def cyclotomic_exp(f: jnp.ndarray) -> jnp.ndarray:
    """f^(-BLS_X) = conjugate(f^BLS_X), segmented square-and-multiply over the
    static bit table (reference "cycolotomic_exp" :106-126, defect #2 fixed)."""
    bits = C.BLS_X_BITS  # MSB-first, leading 1
    acc = f
    i = 1
    n = len(bits)
    while i < n:
        # run of zero bits -> squaring-only scan
        j = i
        while j < n and bits[j] == 0:
            j += 1
        run = j - i
        if run > 0:
            if run == 1:
                acc = fq12.cyclotomic_square(acc)
            else:
                acc, _ = jax.lax.scan(
                    lambda a, _: (fq12.cyclotomic_square(a), None), acc, None, length=run
                )
        if j < n:  # bits[j] == 1: square then multiply
            acc = fq12.cyclotomic_square(acc)
            acc = fq12.mul(acc, f)
            j += 1
        i = j
    return fq12.conjugate(acc)


def final_exponentiation(f: jnp.ndarray) -> jnp.ndarray:
    """Easy part + the reference/zkcrypto hard-part chain, computing
    f^(3*(p^12-1)/r) (see utils/refmodel.py HARD_PART_MULTIPLE; reference
    miller_loop.rs:128-178)."""
    t0 = fq12.conjugate(f)  # f^(p^6)
    t1 = fq12.inv(f)
    t2 = fq12.mul(t0, t1)
    t1 = t2
    t2 = fq12.frobenius_pow(t2, 2)
    t2 = fq12.mul(t2, t1)  # easy part done

    t1 = fq12.conjugate(fq12.cyclotomic_square(t2))
    t3 = cyclotomic_exp(t2)
    t4 = fq12.cyclotomic_square(t3)
    t5 = fq12.mul(t1, t3)
    t1 = cyclotomic_exp(t5)
    t0 = cyclotomic_exp(t1)
    t6 = cyclotomic_exp(t0)
    t6 = fq12.mul(t6, t4)
    t4 = cyclotomic_exp(t6)
    t5 = fq12.conjugate(t5)
    t4 = fq12.mul(t4, fq12.mul(t5, t2))
    t5 = fq12.conjugate(t2)
    t1 = fq12.mul(t1, t2)
    t1 = fq12.frobenius_pow(t1, 3)
    t6 = fq12.mul(t6, t5)
    t6 = fq12.frobenius_map(t6)
    t3 = fq12.mul(t3, t0)
    t3 = fq12.frobenius_pow(t3, 2)
    t3 = fq12.mul(t3, t1)
    t3 = fq12.mul(t3, t6)
    return fq12.mul(t3, t4)


def _cyc_pow(m: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """m^exponent for cyclotomic m: one uniform square-and-select-multiply scan
    (dense ~381-bit exponents would explode an unrolled graph)."""
    if exponent == 0:
        return jnp.broadcast_to(fq12.one(), m.shape)
    bits = np.array(
        [(exponent >> i) & 1 for i in range(exponent.bit_length() - 1, -1, -1)],
        dtype=np.int32,
    )

    def body(acc, bit):
        sq = fq12.cyclotomic_square(acc)
        wm = fq12.mul(sq, m)
        return jnp.where(bit != 0, wm, sq), None

    acc, _ = jax.lax.scan(body, m, jnp.asarray(bits[1:]))
    return acc


def final_exponentiation_canonical(f: jnp.ndarray) -> jnp.ndarray:
    """f^((p^12-1)/r) with the exact canonical exponent, via base-p digits of
    the hard part (utils/refmodel.py final_exponentiation_canonical)."""
    t0 = fq12.conjugate(f)
    t1 = fq12.inv(f)
    t2 = fq12.mul(t0, t1)
    m = fq12.mul(fq12.frobenius_pow(t2, 2), t2)

    out = None
    acc = m
    for i, d in enumerate(C_HARD_DIGITS):
        p_i = _cyc_pow(acc, d)
        term = fq12.frobenius_pow(p_i, 0) if i == 0 else fq12.frobenius_pow(p_i, i)
        out = term if out is None else fq12.mul(out, term)
    return out


from ..utils import refmodel as _rm  # noqa: E402

C_HARD_DIGITS = _rm.HARD_PART_DIGITS


# ---------------------------------------------------------------------------
# Top-level pairing API
# ---------------------------------------------------------------------------


def pairing(p: G1Affine, q: G2Affine) -> jnp.ndarray:
    """Batched full pairing e(P, Q): (..., 12, NLIMBS) Gt elements
    (reference pairing intent, miller_loop.rs:459-492)."""
    coeffs = prepare_g2(q)
    f = miller_loop(p, coeffs, q.infinity)
    return final_exponentiation(f)


def multi_pairing(ps: list, qs: list) -> jnp.ndarray:
    """prod_i e(P_i, Q_i) with one fused Miller loop + one final exponentiation."""
    prepared = [prepare_g2(q) for q in qs]
    f = miller_loop(ps, prepared, [q.infinity for q in qs])
    return final_exponentiation(f)


def pairing_check(ps: list, qs: list) -> jnp.ndarray:
    """True iff prod_i e(P_i, Q_i) == 1 (the BLS/KZG verification predicate)."""
    return fq12.is_one(multi_pairing(ps, qs))
