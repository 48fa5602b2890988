"""Oracle self-validation: algebra-level properties of the exact-int model.

Replicates the reference's arkworks-as-oracle methodology (SURVEY.md §4) without
arkworks: the model is pinned by ring/field axioms, Frobenius identities,
published generator constants, and the pairing laws (bilinearity, r-torsion,
non-degeneracy) — and closes the reference's end-to-end gap (its nontrivial
e(P,Q) test is commented out; ours is not).
"""

import random

import pytest

from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm


def test_fp_basics(rng):
    a, b = rm.rand_fp(rng), rm.rand_fp(rng)
    assert rm.fp_mul(a, rm.fp_inv(a)) == 1
    assert rm.fp_inv(0) == 0  # inv0 convention
    assert rm.fp_add(a, rm.fp_neg(a)) == 0
    assert rm.fp_mul(rm.fp_add(a, b), a) == rm.fp_add(rm.fp_mul(a, a), rm.fp_mul(b, a))
    sq = rm.fp_mul(a, a)
    assert rm.fp_is_square(sq)
    s = rm.fp_sqrt(sq)
    assert s in (a, rm.P - a)
    assert rm.sgn0(1) == 1 and rm.sgn0(2) == 0


def test_fq2_field_axioms(rng):
    a, b, c = (rm.rand_fq2(rng) for _ in range(3))
    assert (a + b) * c == a * c + b * c
    assert a * b == b * a
    assert a.square() == a * a
    assert a * a.inv() == rm.Fq2.one()
    assert rm.Fq2.zero().inv() == rm.Fq2.zero()
    # u^2 = -1
    u = rm.Fq2(0, 1)
    assert u * u == rm.Fq2(rm.P - 1, 0)
    # nonresidue: xi = u+1
    assert a.mul_by_nonresidue() == a * rm.XI
    # frobenius = pow p
    assert a.frobenius_map() == a.pow(rm.P)
    s = a.square().sqrt()
    assert s is not None and s.square() == a.square()


def test_fq6_field_axioms(rng):
    a, b, c = (rm.rand_fq6(rng) for _ in range(3))
    assert (a + b) * c == a * c + b * c
    assert a.square() == a * a
    assert a * a.inv() == rm.Fq6.one()
    b1 = rm.rand_fq2(rng)
    b0 = rm.rand_fq2(rng)
    assert a.mul_by_1(b1) == a * rm.Fq6(rm.Fq2.zero(), b1, rm.Fq2.zero())
    assert a.mul_by_01(b0, b1) == a * rm.Fq6(b0, b1, rm.Fq2.zero())
    # v^3 = xi
    v = rm.Fq6(rm.Fq2.zero(), rm.Fq2.one(), rm.Fq2.zero())
    assert v * v * v == rm.Fq6(rm.XI, rm.Fq2.zero(), rm.Fq2.zero())
    assert a.mul_by_nonresidue() == a * v
    # frobenius
    f = a.frobenius_map()
    expect = rm.Fq6(
        a.c0.pow(rm.P) if False else a.c0.conjugate(),
        a.c1.conjugate() * rm.FROB_GAMMA6_1[1],
        a.c2.conjugate() * rm.FROB_GAMMA6_2[1],
    )
    assert f == expect


def test_fq12_field_axioms(rng):
    a, b, c = (rm.rand_fq12(rng) for _ in range(3))
    assert (a + b) * c == a * c + b * c
    assert a.square() == a * a
    assert a * a.inv() == rm.Fq12.one()
    assert a.frobenius_pow(12) == a
    assert a.frobenius_map() == a.pow(rm.P)
    assert a.conjugate() == a.frobenius_pow(6)
    # sparse mul_by_014 vs dense
    c0, c1, c4 = (rm.rand_fq2(rng) for _ in range(3))
    sparse = rm.Fq12(
        rm.Fq6(c0, c1, rm.Fq2.zero()),
        rm.Fq6(rm.Fq2.zero(), c4, rm.Fq2.zero()),
    )
    assert a.mul_by_014(c0, c1, c4) == a * sparse
    # w^2 = v
    w = rm.Fq12(rm.Fq6.zero(), rm.Fq6.one())
    v = rm.Fq6(rm.Fq2.zero(), rm.Fq2.one(), rm.Fq2.zero())
    assert w * w == rm.Fq12(v, rm.Fq6.zero())
    # round trip flat coeffs
    assert rm.Fq12.from_coeffs(a.coeffs()) == a


def test_generators_on_curve_and_torsion():
    g1, g2 = rm.G1Affine.generator(), rm.G2Affine.generator()
    assert g1.is_on_curve() and g2.is_on_curve()
    assert g1.mul(rm.R).infinity
    assert g2.mul(rm.R).infinity


def test_curve_group_laws(rng):
    p1, p2 = rm.rand_g1(rng), rm.rand_g1(rng)
    assert p1.add(p2) == p2.add(p1)
    assert p1.add(p1.neg()).infinity
    assert p1.add(rm.G1Affine.identity()) == p1
    q1, q2 = rm.rand_g2(rng), rm.rand_g2(rng)
    assert q1.add(q2) == q2.add(q1)
    assert q1.add(q1.neg()).infinity
    assert q1.add(q2).is_on_curve()


def test_prepare_g2_line_count(rng):
    coeffs = rm.prepare_g2(rm.G2Affine.generator())
    assert len(coeffs) == rm.NUM_LINE_COEFFS == 68


def test_pairing_bilinearity(rng):
    g1, g2 = rm.G1Affine.generator(), rm.G2Affine.generator()
    e = rm.pairing(g1, g2)
    assert e != rm.Fq12.one()  # non-degeneracy
    assert e.pow(rm.R) == rm.Fq12.one()  # lands in G_T
    a, b = rng.randrange(2, 1 << 40), rng.randrange(2, 1 << 40)
    assert rm.pairing(g1.mul(a), g2.mul(b)) == e.pow(a * b)
    assert rm.pairing(g1.mul(a), g2) == rm.pairing(g1, g2.mul(a))
    assert rm.pairing(g1.neg(), g2) == e.inv()


def test_pairing_identity_inputs():
    g1, g2 = rm.G1Affine.generator(), rm.G2Affine.generator()
    assert rm.pairing(rm.G1Affine.identity(), g2) == rm.Fq12.one()
    assert rm.pairing(g1, rm.G2Affine.identity()) == rm.Fq12.one()


def test_multi_pairing_product(rng):
    """prod e(P_i, Q_i) via one fused Miller loop == product of separate pairings."""
    pairs = [(rm.rand_g1(rng), rm.rand_g2(rng)) for _ in range(3)]
    fused = rm.multi_pairing(pairs)
    sep = rm.Fq12.one()
    for p, q in pairs:
        sep = sep * rm.pairing(p, q)
    assert fused == sep


def test_multi_pairing_cancellation(rng):
    """e(aP, Q) * e(-P, aQ) == 1 — the standard pairing-check identity."""
    p, q = rm.rand_g1(rng), rm.rand_g2(rng)
    a = rng.randrange(2, rm.R)
    out = rm.multi_pairing([(p.mul(a), q), (p.neg(), q.mul(a))])
    assert out == rm.Fq12.one()


def test_final_exponentiation_exponents(rng):
    """Chain computes f^(3*(p^12-1)/r); canonical computes the exact exponent."""
    f = rm.multi_miller_loop([(rm.rand_g1(rng), rm.prepare_g2(rm.rand_g2(rng)))])
    d = (rm.P**12 - 1) // rm.R
    raw = f.pow(d)
    assert rm.final_exponentiation_canonical(f) == raw
    assert rm.final_exponentiation(f) == raw.pow(rm.HARD_PART_MULTIPLE)


def test_cyclotomic_ops_match_generic(rng):
    f = rm.multi_miller_loop([(rm.rand_g1(rng), rm.prepare_g2(rm.rand_g2(rng)))])
    # put f into the cyclotomic subgroup (easy part)
    m = (f.frobenius_pow(6) * f.inv())
    m = m.frobenius_pow(2) * m
    assert rm.cyclotomic_square(m) == m.square()
    assert rm.cyclotomic_exp(m) == m.pow(rm.BLS_X).conjugate()
