"""End-to-end pairing tests: bit-exact vs the exact-int oracle.

Closes the reference's biggest test gap (SURVEY.md §4: its nontrivial e(P,Q)
cross-check is commented out): the full batched pipeline — G2 preparation,
fused Miller loop, final exponentiation — is compared limb-for-limb against
the oracle, including infinity inputs and multi-pairing products."""

import random

import jax
import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu.ops import fq2, fq12
from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.models import pairing as mp
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

B = 2


@pytest.fixture(scope="module")
def points():
    r = random.Random(31337)
    ps = [r.randrange(1, rm.R) for _ in range(B)]
    qs = [r.randrange(1, rm.R) for _ in range(B)]
    g1s = [rm.G1Affine.generator().mul(k) for k in ps]
    g2s = [rm.G2Affine.generator().mul(k) for k in qs]
    return g1s, g2s


def test_prepare_g2_matches_oracle(points):
    _, g2s = points
    coeffs = np.array(jax.jit(mp.prepare_g2)(G2Affine.encode(g2s)))
    ref = [rm.prepare_g2(q) for q in g2s]
    for i in range(B):
        got = [tuple(fq2.decode(coeffs[i, j, k]) for k in range(3)) for j in range(68)]
        assert got == ref[i]


def test_full_pairing_bit_exact(points):
    g1s, g2s = points
    P, Q = G1Affine.encode(g1s), G2Affine.encode(g2s)
    e = fq12.decode(np.array(jax.jit(mp.pairing)(P, Q)))
    want = [rm.pairing(p, q) for p, q in zip(g1s, g2s)]
    assert list(e) == want


def test_pairing_infinity_inputs(points):
    g1s, g2s = points
    P = G1Affine.encode([rm.G1Affine.identity(), g1s[1]])
    Q = G2Affine.encode([g2s[0], rm.G2Affine.identity()])
    e = fq12.decode(np.array(jax.jit(mp.pairing)(P, Q)))
    assert list(e) == [rm.Fq12.one(), rm.Fq12.one()]


def test_multi_pairing_and_check(points):
    g1s, g2s = points
    r = random.Random(99)
    a = r.randrange(2, rm.R)
    # e(aP, Q) * e(-P, aQ) == 1, batched
    p1 = G1Affine.encode([g1s[0].mul(a), g1s[1].mul(a)])
    q1 = G2Affine.encode(g2s)
    p2 = G1Affine.encode([g1s[0].neg(), g1s[1].neg()])
    q2 = G2Affine.encode([g2s[0].mul(a), g2s[1].mul(a)])
    ok = np.array(jax.jit(mp.pairing_check)([p1, p2], [q1, q2]))
    assert ok.all()
    # and the product matches the oracle when nontrivial
    out = fq12.decode(
        np.array(jax.jit(mp.multi_pairing)([p1, p2], [q1, q2]))
    )
    want = [
        rm.multi_pairing([(g1s[i].mul(a), g2s[i]), (g1s[i].neg(), g2s[i].mul(a))])
        for i in range(B)
    ]
    assert list(out) == want


@pytest.mark.slow
def test_final_exponentiation_canonical(points):
    g1s, g2s = points
    P, Q = G1Affine.encode(g1s[:1]), G2Affine.encode(g2s[:1])
    f = jax.jit(lambda p, q: mp.miller_loop(p, mp.prepare_g2(q), q.infinity))(P, Q)
    e = fq12.decode(np.array(jax.jit(mp.final_exponentiation_canonical)(f)))
    want = [
        rm.final_exponentiation_canonical(
            rm.multi_miller_loop([(g1s[0], rm.prepare_g2(g2s[0]))])
        )
    ]
    assert list(e) == want


def test_cyclotomic_ops(points):
    g1s, g2s = points
    fm = rm.multi_miller_loop([(g1s[0], rm.prepare_g2(g2s[0]))])
    m = fm.frobenius_pow(6) * fm.inv()
    m = m.frobenius_pow(2) * m  # cyclotomic subgroup element
    enc = fq12.encode([m])
    got = fq12.decode(np.array(jax.jit(fq12.cyclotomic_square)(enc)))
    assert list(got) == [rm.cyclotomic_square(m)]
    got2 = fq12.decode(np.array(jax.jit(mp.cyclotomic_exp)(enc)))
    assert list(got2) == [rm.cyclotomic_exp(m)]


@pytest.mark.slow
def test_numden_pairing_matches_flagship(points):
    """The inversion-free num/den Miller loop (models/pairing_numden.py, the
    corrected equivalent of the reference's optimized_miller_loop,
    src/miller_loop_native_optimized.rs:81-127) yields the same e(P,Q) — and
    its raw Miller value differs from the flagship's only by the Fq6-subfield
    vertical factors that final exponentiation kills."""
    from plonky2_bls12_381_pairing_tpu.models import pairing_numden as nd

    g1s, g2s = points
    P, Q = G1Affine.encode(g1s), G2Affine.encode(g2s)
    e = fq12.decode(np.array(jax.jit(nd.optimized_pairing)(P, Q)))
    want = [rm.pairing(p, q) for p, q in zip(g1s, g2s)]
    assert list(e) == want
