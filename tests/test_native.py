"""C++ native-tier tests: the fast host oracle must agree with the exact-int
Python oracle (the framework's three tiers — Python ints, C++, JAX limb
tensors — are mutually cross-checkable; see native/bls12_381.cpp)."""

import random

import pytest

from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

native = pytest.importorskip("plonky2_bls12_381_pairing_tpu.native")
if not native.available():
    pytest.skip("no C++ toolchain available", allow_module_level=True)

N = 4


@pytest.fixture(scope="module")
def rng0():
    return random.Random(0xC0FFEE)


def test_fp_batches(rng0):
    xs = [rng0.randrange(rm.P) for _ in range(16)] + [0, 1, rm.P - 1]
    ys = [rng0.randrange(rm.P) for _ in range(16)] + [rm.P - 1, 0, 1]
    assert native.fp_mul_batch(xs, ys) == [x * y % rm.P for x, y in zip(xs, ys)]
    # Fermat inverse; inv0 convention maps 0 -> 0
    assert native.fp_inv_batch(xs) == [pow(x, rm.P - 2, rm.P) for x in xs]


def test_scalar_mul_batches(rng0):
    ks = [rng0.randrange(1, rm.R) for _ in range(N)] + [0, 1, rm.R]
    g1s = native.g1_mul_batch(ks)
    g2s = native.g2_mul_batch(ks)
    for k, p, q in zip(ks, g1s, g2s):
        assert p == rm.G1Affine.generator().mul(k)
        assert q == rm.G2Affine.generator().mul(k)
    assert g1s[-1].infinity and g2s[-1].infinity  # r*G = O


def test_pairing_batch_matches_oracle(rng0):
    ks = [rng0.randrange(1, rm.R) for _ in range(N)]
    js = [rng0.randrange(1, rm.R) for _ in range(N)]
    g1s = native.g1_mul_batch(ks)
    g2s = native.g2_mul_batch(js)
    got = native.pairing_batch(g1s, g2s)
    want = [rm.pairing(p, q) for p, q in zip(g1s, g2s)]
    assert got == want


def test_pairing_batch_infinity():
    g1 = rm.G1Affine.generator()
    g2 = rm.G2Affine.generator()
    es = native.pairing_batch(
        [rm.G1Affine.identity(), g1], [g2, rm.G2Affine.identity()]
    )
    assert es == [rm.Fq12.one(), rm.Fq12.one()]


def test_multi_pairing_product(rng0):
    ks = [rng0.randrange(1, rm.R) for _ in range(3)]
    g1s = native.g1_mul_batch(ks)
    g2s = native.g2_mul_batch(ks[::-1])
    gt = native.multi_pairing_product(g1s, g2s)
    acc = rm.Fq12.one()
    for p, q in zip(g1s, g2s):
        acc = acc * rm.pairing(p, q)
    assert gt == acc


def test_bilinearity_via_native(rng0):
    """e(aP, bQ) == e(P, Q)^(ab) computed entirely through the native tier."""
    a = rng0.randrange(2, 1 << 64)
    b = rng0.randrange(2, 1 << 64)
    (pa,) = native.g1_mul_batch([a])
    (qb,) = native.g2_mul_batch([b])
    (g1,) = native.g1_mul_batch([1])
    (g2,) = native.g2_mul_batch([1])
    lhs, base = native.pairing_batch([pa, g1], [qb, g2])
    assert lhs == base.pow(a * b % rm.R)
