"""Tower (Fq2/Fq6/Fq12) tests: bit-exact vs the exact-int oracle.

Parity with the reference's tree-mode gadget tests
(src/fields_as_trees/fq2_target_tree.rs:220-420, fq6_target_tree.rs:329-647,
fq12_target_tree.rs:447-1020): ring ops, sparse muls, Frobenius, inverses,
sqrt — on random batches, all limbs compared exactly."""

import random

import jax
import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu.ops import fq2, fq6, fq12
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

B = 3


@pytest.fixture(scope="module")
def r():
    return random.Random(4321)


def eq(got, want):
    return all(g == w for g, w in zip(list(got), want))


# ---------------------------------------------------------------------------
# Fq2
# ---------------------------------------------------------------------------


def test_fq2_ops(r):
    A = [rm.rand_fq2(r) for _ in range(B)]
    Bv = [rm.rand_fq2(r) for _ in range(B)]
    a, b = fq2.encode(A), fq2.encode(Bv)
    assert eq(fq2.decode(np.array(jax.jit(fq2.mul)(a, b))), [x * y for x, y in zip(A, Bv)])
    assert eq(fq2.decode(np.array(jax.jit(fq2.square)(a))), [x.square() for x in A])
    assert eq(fq2.decode(np.array(jax.jit(fq2.add)(a, b))), [x + y for x, y in zip(A, Bv)])
    assert eq(fq2.decode(np.array(jax.jit(fq2.sub)(a, b))), [x - y for x, y in zip(A, Bv)])
    assert eq(fq2.decode(np.array(jax.jit(fq2.conjugate)(a))), [x.conjugate() for x in A])
    assert eq(
        fq2.decode(np.array(jax.jit(fq2.mul_by_nonresidue)(a))),
        [x.mul_by_nonresidue() for x in A],
    )


def test_fq2_inv_sqrt_sgn(r):
    A = [rm.rand_fq2(r) for _ in range(B)]
    a = fq2.encode(A)
    assert eq(fq2.decode(np.array(jax.jit(fq2.inv)(a))), [x.inv() for x in A])
    z = fq2.encode([rm.Fq2.zero()] * B)
    assert eq(fq2.decode(np.array(jax.jit(fq2.inv)(z))), [rm.Fq2.zero()] * B)
    sq = [x.square() for x in A]
    s = fq2.decode(np.array(jax.jit(fq2.sqrt)(fq2.encode(sq))))
    assert all(g.square() == w for g, w in zip(list(s), sq))
    assert list(np.array(jax.jit(fq2.sgn0)(a))) == [rm.sgn0_fq2(x) for x in A]
    assert np.array(jax.jit(fq2.is_square)(fq2.encode(sq))).all()


# ---------------------------------------------------------------------------
# Fq6
# ---------------------------------------------------------------------------


def test_fq6_ops(r):
    A = [rm.rand_fq6(r) for _ in range(B)]
    Bv = [rm.rand_fq6(r) for _ in range(B)]
    a, b = fq6.encode(A), fq6.encode(Bv)
    assert eq(fq6.decode(np.array(jax.jit(fq6.mul)(a, b))), [x * y for x, y in zip(A, Bv)])
    assert eq(fq6.decode(np.array(jax.jit(fq6.square)(a))), [x.square() for x in A])
    assert eq(
        fq6.decode(np.array(jax.jit(fq6.mul_by_nonresidue)(a))),
        [x.mul_by_nonresidue() for x in A],
    )
    b0 = [rm.rand_fq2(r) for _ in range(B)]
    b1 = [rm.rand_fq2(r) for _ in range(B)]
    assert eq(
        fq6.decode(np.array(jax.jit(fq6.mul_by_01)(a, fq2.encode(b0), fq2.encode(b1)))),
        [x.mul_by_01(y, z) for x, y, z in zip(A, b0, b1)],
    )
    assert eq(
        fq6.decode(np.array(jax.jit(fq6.mul_by_1)(a, fq2.encode(b1)))),
        [x.mul_by_1(y) for x, y in zip(A, b1)],
    )
    assert eq(
        fq6.decode(np.array(jax.jit(fq6.frobenius_map)(a))), [x.frobenius_map() for x in A]
    )


def test_fq6_inv(r):
    A = [rm.rand_fq6(r) for _ in range(B)]
    a = fq6.encode(A)
    assert eq(fq6.decode(np.array(jax.jit(fq6.inv)(a))), [x.inv() for x in A])


# ---------------------------------------------------------------------------
# Fq12
# ---------------------------------------------------------------------------


def test_fq12_ops(r):
    A = [rm.rand_fq12(r) for _ in range(B)]
    Bv = [rm.rand_fq12(r) for _ in range(B)]
    a, b = fq12.encode(A), fq12.encode(Bv)
    assert list(fq12.decode(a)) == A  # roundtrip
    assert eq(fq12.decode(np.array(jax.jit(fq12.mul)(a, b))), [x * y for x, y in zip(A, Bv)])
    assert eq(fq12.decode(np.array(jax.jit(fq12.square)(a))), [x.square() for x in A])
    assert eq(fq12.decode(np.array(jax.jit(fq12.conjugate)(a))), [x.conjugate() for x in A])
    c0 = [rm.rand_fq2(r) for _ in range(B)]
    c1 = [rm.rand_fq2(r) for _ in range(B)]
    c4 = [rm.rand_fq2(r) for _ in range(B)]
    assert eq(
        fq12.decode(
            np.array(
                jax.jit(fq12.mul_by_014)(
                    a, fq2.encode(c0), fq2.encode(c1), fq2.encode(c4)
                )
            )
        ),
        [x.mul_by_014(y, z, w) for x, y, z, w in zip(A, c0, c1, c4)],
    )
    assert eq(
        fq12.decode(np.array(jax.jit(fq12.frobenius_map)(a))),
        [x.frobenius_map() for x in A],
    )


def test_fq12_inv(r):
    A = [rm.rand_fq12(r) for _ in range(B)]
    a = fq12.encode(A)
    assert eq(fq12.decode(np.array(jax.jit(fq12.inv)(a))), [x.inv() for x in A])
    # a * a^-1 == 1
    prod = jax.jit(lambda x: fq12.mul(x, fq12.inv(x)))(a)
    assert eq(fq12.decode(np.array(prod)), [rm.Fq12.one()] * B)


def test_fq12_frobenius_tower_identity(r):
    """frob(a*b) == frob(a)*frob(b) and frob^2 == frobenius_pow(2)."""
    A = [rm.rand_fq12(r) for _ in range(B)]
    a = fq12.encode(A)
    f2 = jax.jit(lambda x: fq12.frobenius_pow(x, 2))(a)
    assert eq(fq12.decode(np.array(f2)), [x.frobenius_pow(2) for x in A])
