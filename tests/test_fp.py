"""Limb-core Fp tests: bit-exact vs the exact-int oracle (SURVEY.md §7 step 1-2).

Covers the API surface of the reference's FqTarget (src/fields/fq_target.rs):
ring ops, inv0, sqrt/sqrt_with_sgn, legendre/is_square, sgn0, select/is_equal,
(de)serialization — plus adversarial normalize inputs (carry-ripple patterns)."""

import random

import jax
import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu import constants as C
from plonky2_bls12_381_pairing_tpu.ops import fp
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

B = 5


@pytest.fixture(scope="module")
def data():
    r = random.Random(1234)
    a_int = [r.randrange(rm.P) for _ in range(B)]
    b_int = [r.randrange(rm.P) for _ in range(B)]
    return a_int, b_int, fp.encode(a_int), fp.encode(b_int)


def dec(x):
    return list(fp.decode(np.array(x)))


def test_encode_decode_roundtrip(data):
    a_int, _, a, _ = data
    assert dec(a) == a_int
    std = fp.encode(a_int, mont=False)
    assert list(fp.decode(std, mont=False)) == a_int


def test_mul(data):
    a_int, b_int, a, b = data
    assert dec(jax.jit(fp.mont_mul)(a, b)) == [x * y % rm.P for x, y in zip(a_int, b_int)]


def test_add_sub_neg(data):
    a_int, b_int, a, b = data
    assert dec(jax.jit(fp.add)(a, b)) == [(x + y) % rm.P for x, y in zip(a_int, b_int)]
    assert dec(jax.jit(fp.sub)(a, b)) == [(x - y) % rm.P for x, y in zip(a_int, b_int)]
    assert dec(jax.jit(fp.neg)(a)) == [(-x) % rm.P for x in a_int]
    z = fp.encode([0] * B)
    assert dec(jax.jit(fp.neg)(z)) == [0] * B


def test_edge_values():
    """0, 1, p-1, and values with all-0xFF limb patterns (carry ripple)."""
    vals = [0, 1, rm.P - 1, (1 << 376) - 1, rm.P - (1 << 320)]
    a = fp.encode(vals)
    assert dec(jax.jit(fp.add)(a, a)) == [(2 * v) % rm.P for v in vals]
    assert dec(jax.jit(fp.mont_mul)(a, a)) == [v * v % rm.P for v in vals]


def test_inv_and_inv0(data):
    a_int, _, a, _ = data
    assert dec(jax.jit(fp.inv)(a)) == [pow(x, rm.P - 2, rm.P) for x in a_int]
    z = fp.encode([0] * B)
    assert dec(jax.jit(fp.inv)(z)) == [0] * B  # inv0 convention


def test_sqrt_legendre_sgn0(data):
    a_int, _, a, _ = data
    sq = jax.jit(fp.mont_square)(a)
    got = dec(jax.jit(fp.sqrt)(sq))
    assert all(g in (x, rm.P - x) for g, x in zip(got, a_int))
    leg = dec(jax.jit(fp.legendre)(sq))
    assert leg == [1] * B
    assert np.array(jax.jit(fp.is_square)(sq)).all()
    sg = np.array(jax.jit(fp.sgn0)(a))
    assert list(sg) == [x % 2 for x in a_int]
    # sqrt_with_sgn returns the root with the requested sign
    for want in (0, 1):
        s = jax.jit(fp.sqrt_with_sgn)(sq, np.full((B,), want, np.int32))
        assert list(np.array(jax.jit(fp.sgn0)(s))) == [want] * B


def test_select_eq(data):
    a_int, b_int, a, b = data
    m = np.array([1, 0, 1, 0, 1], dtype=np.int32)
    out = dec(fp.select(m, a, b))
    assert out == [x if mm else y for x, y, mm in zip(a_int, b_int, m)]
    assert list(np.array(fp.is_equal(a, a))) == [True] * B
    assert not np.array(fp.is_equal(a, b)).any()


def test_normalize_adversarial():
    """Signed columns with long ripple chains resolve exactly."""
    cases = [
        # (columns, expected value)
        ([255] * 48, (1 << 384) - 1),
        ([256] + [255] * 47, 1 << 384),  # full-length +1 ripple
        ([-1] + [0] * 46 + [2], (2 << (8 * 47)) - 1),  # borrow ripple down
        ([511] * 40 + [0] * 8, sum(511 << (8 * i) for i in range(40))),
    ]
    for cols, val in cases:
        arr = np.array([cols], dtype=np.int32)
        w = fp.Wide(arr, -1, 511, 0, val + 1)
        out = np.array(fp.normalize(w, 49))
        assert C.limbs_to_int(out[0]) == val, cols


def test_wide_lazy_accumulation():
    """(a*b + c*d - e*f) via Wide combine + one reduction == oracle."""
    r = random.Random(77)
    ints = [[r.randrange(rm.P) for _ in range(B)] for _ in range(6)]
    enc = [fp.encode(v) for v in ints]

    def f(a, b, c, d, e, g):
        w = fp.conv(a, b) + fp.conv(c, d) - fp.conv(e, g)
        return fp.mont_reduce(fp.nonneg(w))

    got = dec(jax.jit(f)(*enc))
    want = [
        (ints[0][i] * ints[1][i] + ints[2][i] * ints[3][i] - ints[4][i] * ints[5][i])
        % rm.P
        for i in range(B)
    ]
    assert got == want


def test_pow_static(data):
    a_int, _, a, _ = data
    e = 0xDEADBEEFCAFE
    assert dec(jax.jit(lambda x: fp.pow_static(x, e))(a)) == [pow(x, e, rm.P) for x in a_int]


def test_mul_small(data):
    a_int, _, a, _ = data
    for k in (0, 1, 2, 3, 8, 12):
        assert dec(fp.mul_small(a, k)) == [x * k % rm.P for x in a_int]


def test_get_naf():
    """NAF reconstructs the integer; no adjacent nonzero digits (reference
    get_naf, src/fields/helpers.rs:197-239)."""
    r = random.Random(11)
    for e in [0, 1, 2, 3, 7, 0xD201_0000_0001_0000] + [r.randrange(1 << 381) for _ in range(8)]:
        naf = fp.get_naf(e)
        assert sum(d << i for i, d in enumerate(naf)) == e
        assert all(d in (-1, 0, 1) for d in naf)
        assert all(not (naf[i] and naf[i + 1]) for i in range(len(naf) - 1))


def test_pow_naf(data):
    a_int, _, a, _ = data
    e = 0xD201_0000_0001_0000
    assert dec(jax.jit(lambda x: fp.pow_naf(x, e))(a)) == [pow(x, e, rm.P) for x in a_int]


def test_pow_dynamic(data):
    """Runtime per-instance exponents (the reference's witness-data NAF pow,
    src/fields/fq_target.rs:243-260): different exponent per batch element."""
    a_int, _, a, _ = data
    r = random.Random(41)
    es = [r.randrange(1 << 64) for _ in a_int]
    es[0] = 0  # x^0 == 1 edge
    bits = fp.bits_of(es, nbits=64)
    got = dec(jax.jit(fp.pow_dynamic)(a, jax.numpy.asarray(bits)))
    assert got == [pow(x, e, rm.P) for x, e in zip(a_int, es)]
