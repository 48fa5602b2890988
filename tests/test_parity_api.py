"""Named API-parity ops vs the reference (VERDICT r4 gaps #2-#4).

Every method named in fq_target.rs / fq2_target.rs / fq6_target.rs /
fq12_target.rs that was previously covered only by composition now exists by
name on both tiers and is tested here against the exact-int oracle:

  div (fq_target.rs:209, fq2_target.rs:227, fq12_target.rs:295)
  connect (fq_target.rs:88, fq2:48, fq6:47, fq12:50) — witness-checked rows
  conditional_mul (fq6_target.rs:358, fq12_target.rs:323)
  neg_conjugate (fq2_target.rs:240)
  RNS-tier Fq2 sgn0 / is_square / sqrt_with_sgn (fq2_target.rs:248-311)
  RNS G1Affine.identity / is_point_equal_to (g1_curve.rs:69-96)
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu.models import witness
from plonky2_bls12_381_pairing_tpu.ops import fp, fq2, fq6, fq12
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp
from plonky2_bls12_381_pairing_tpu.ops.rns import fq2 as rfq2
from plonky2_bls12_381_pairing_tpu.ops.rns import tower as rtw
from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine as RG1
from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G2Affine as RG2
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

P = rm.P
B = 4


@pytest.fixture
def rng():
    return random.Random(0xD1F)


# ---------------------------------------------------------------------------
# Limb tier
# ---------------------------------------------------------------------------


def test_limb_fp_div(rng):
    a = [rng.randrange(P) for _ in range(B)]
    b = [rng.randrange(1, P) for _ in range(B)] + []
    b[0] = 0  # inv0: x/0 = 0
    out = list(fp.decode(np.array(jax.jit(fp.div)(fp.encode(a), fp.encode(b)))))
    assert out == [x * rm.fp_inv(y) % P for x, y in zip(a, b)]


def test_limb_fq2_div_and_neg_conjugate(rng):
    a = [rm.rand_fq2(rng) for _ in range(B)]
    b = [rm.rand_fq2(rng) for _ in range(B)]
    A, Bv = fq2.encode(a), fq2.encode(b)
    got = list(fq2.decode(np.array(jax.jit(fq2.div)(A, Bv))))
    assert got == [x * y.inv() for x, y in zip(a, b)]
    got = list(fq2.decode(np.array(jax.jit(fq2.neg_conjugate)(A))))
    assert got == [rm.Fq2((-x.c0) % P, x.c1) for x in a]


def test_limb_fq12_div(rng):
    a, b = rand12(rng), rand12(rng)
    A, Bv = fq12.encode([a]), fq12.encode([b])
    got = list(fq12.decode(np.array(jax.jit(fq12.div)(A, Bv))))
    assert got == [a * b.inv()]


def rand12(rng):
    return rm.Fq12.from_coeffs([rng.randrange(P) for _ in range(12)])


def test_limb_conditional_mul(rng):
    a6 = rm.rand_fq6(rng)
    x6 = rm.rand_fq6(rng)
    A = jnp.broadcast_to(fq6.encode(a6), (2, 6, fp.NLIMBS))
    X = jnp.broadcast_to(fq6.encode(x6), (2, 6, fp.NLIMBS))
    flag = jnp.asarray([0, 1], dtype=jnp.int32)
    got = list(fq6.decode(np.array(jax.jit(fq6.conditional_mul)(A, X, flag))))
    assert got == [a6, a6 * x6]
    a12, x12 = rand12(rng), rand12(rng)
    A = jnp.broadcast_to(fq12.encode(a12), (2, 12, fp.NLIMBS))
    X = jnp.broadcast_to(fq12.encode(x12), (2, 12, fp.NLIMBS))
    got = list(fq12.decode(np.array(jax.jit(fq12.conditional_mul)(A, X, flag))))
    assert got == [a12, a12 * x12]


def test_limb_connect_records_checked_rows(rng):
    """connect is a CONSTRAINT: equal rows verify clean, a violated connect
    is counted by check_trace — the builder.connect analogue."""
    a = [rng.randrange(P) for _ in range(B)]
    b = list(a)
    b[-1] = (b[-1] + 1) % P  # one violated constraint

    def fn(x, y):
        m1 = fp.connect(x, x)
        m2 = fp.connect(x, y)
        return m1 & m2

    out, tr = witness.trace(fn, fp.encode(a), fp.encode(b))
    assert list(np.array(out)) == [True] * (B - 1) + [False]
    counts = witness.check_trace(tr)
    assert counts["connect"] == 1  # exactly the violated row
    # tower-level connects fold into the same kind
    z2 = fq2.encode([rm.rand_fq2(rng)])
    _, tr2 = witness.trace(lambda v: fq2.connect(v, v), z2)
    assert witness.check_trace(tr2)["connect"] == 0


# ---------------------------------------------------------------------------
# RNS tier
# ---------------------------------------------------------------------------


def test_rns_fp_div_connect(rng):
    a = [rng.randrange(P) for _ in range(B)]
    b = [0] + [rng.randrange(1, P) for _ in range(B - 1)]
    A, Bv = rfp.encode(a), rfp.encode(b)
    got = list(rfp.decode(np.array(jax.jit(rfp.div)(A, Bv))))[:B]
    assert got == [x * rm.fp_inv(y) % P for x, y in zip(a, b)]
    out, tr = witness.trace(lambda x, y: rfp.connect(x, y), A, A)
    assert bool(np.all(np.array(out)))
    assert witness.check_trace(tr)["rns_connect"] == 0


def enc2(zs):
    ints = np.empty((len(zs), 2), dtype=object)
    for i, z in enumerate(zs):
        ints[i, 0], ints[i, 1] = z.c0, z.c1
    return np.asarray(rfp.encode(ints))


def dec2(arr, n):
    ints = rfp.decode(np.asarray(arr))
    return [rm.Fq2(int(ints[i, 0]), int(ints[i, 1])) for i in range(n)]


def test_rns_fq2_ring_ops(rng):
    a = [rm.rand_fq2(rng) for _ in range(B)]
    b = [rm.rand_fq2(rng) for _ in range(B)]
    A, Bv = enc2(a), enc2(b)
    assert dec2(jax.jit(rfq2.mul)(A, Bv), B) == [x * y for x, y in zip(a, b)]
    assert dec2(jax.jit(rfq2.add)(A, Bv), B) == [x + y for x, y in zip(a, b)]
    assert dec2(jax.jit(rfq2.sub)(A, Bv), B) == [x - y for x, y in zip(a, b)]
    assert dec2(jax.jit(rfq2.square)(A), B) == [x.square() for x in a]
    assert dec2(jax.jit(rfq2.conjugate)(A), B) == [
        rm.Fq2(x.c0, (-x.c1) % P) for x in a]
    assert dec2(jax.jit(rfq2.neg_conjugate)(A), B) == [
        rm.Fq2((-x.c0) % P, x.c1) for x in a]
    assert dec2(jax.jit(rfq2.mul_by_nonresidue)(A), B) == [
        x.mul_by_nonresidue() for x in a]


def test_rns_fq2_inv_div(rng):
    a = [rm.rand_fq2(rng) for _ in range(B)]
    b = [rm.Fq2.zero()] + [rm.rand_fq2(rng) for _ in range(B - 1)]
    A, Bv = enc2(a), enc2(b)
    assert dec2(jax.jit(rfq2.inv)(Bv), B) == [y.inv() for y in b]
    assert dec2(jax.jit(rfq2.div)(A, Bv), B) == [x * y.inv() for x, y in zip(a, b)]


def test_rns_fq2_sgn0_is_square(rng):
    zs = ([rm.Fq2(0, 3), rm.Fq2(0, 4), rm.Fq2(2, 1), rm.Fq2(5, 0)]
          + [rm.rand_fq2(rng) for _ in range(B)])
    sq = [z.square() for z in zs]
    A = enc2(zs)
    got = np.array(jax.jit(rfq2.sgn0)(A)).reshape(-1)[: len(zs)]
    assert list(got) == [rm.sgn0_fq2(z) for z in zs]
    gots = np.array(jax.jit(rfq2.is_square)(enc2(sq))).reshape(-1)[: len(zs)]
    assert all(gots)
    # a non-square: multiply a square's norm check via known non-residue
    nonsq = [z * rm.XI for z in sq]  # xi is a non-square in Fq2
    gotn = np.array(jax.jit(rfq2.is_square)(enc2(nonsq))).reshape(-1)[: len(zs)]
    assert not any(gotn)


def test_rns_fq2_sqrt_with_sgn(rng):
    zs = [rm.rand_fq2(rng) for _ in range(B)]
    sq = [z.square() for z in zs]
    sgn = np.array([[i % 2, (i + 1) % 2] for i in range(B // 2)])  # packed
    out, tr = witness.trace(
        lambda x, s: rfq2.sqrt_with_sgn(x, s), enc2(sq),
        jnp.asarray(sgn.reshape(B // 2, 2)))
    got = dec2(np.array(out), B)
    flat_sgn = sgn.reshape(-1)
    for z, s, want_sgn in zip(got, sq, flat_sgn):
        assert z.square() == s
        assert rm.sgn0_fq2(z) == want_sgn
    counts = witness.check_trace(tr)
    assert counts.get("rns_fq2_sqrt", 0) == 0


def test_rns_fq12_div_connect_conditional_mul(rng):
    a, b = rand12(rng), rand12(rng)
    A = rtw.encode([a, a])
    Bv = rtw.encode([b, b])
    got = rtw.decode(np.array(jax.jit(rtw.div)(A, Bv)))
    assert list(got)[:2] == [a * b.inv()] * 2
    # conditional_mul with a per-packed-element lane mask
    mask = jnp.asarray(rfp.pack_mask(np.array([0, 1])))
    got = rtw.decode(np.array(jax.jit(rtw.conditional_mul)(A, Bv, mask)))
    assert list(got)[:2] == [a, a * b]
    out, tr = witness.trace(lambda x, y: rtw.connect(x, y), A, A)
    assert bool(np.all(np.array(out)))
    assert witness.check_trace(tr)["rns_connect"] == 0


def test_rns_curve_identity_equality(rng):
    ks = [1, 2, 3, 2]
    g1s = [rm.G1Affine.generator().mul(k) for k in ks]
    g2s = [rm.G2Affine.generator().mul(k) for k in ks]
    P1, P2 = RG1.encode(g1s), RG1.encode([g1s[0], g1s[1], g1s[3], g1s[3]])
    eq = np.array(P1.is_point_equal_to(P2)).reshape(-1)[:4]
    assert list(eq) == [True, True, False, True]
    Q1, Q2 = RG2.encode(g2s), RG2.encode([g2s[0], g2s[1], g2s[3], g2s[3]])
    eq = np.array(Q1.is_point_equal_to(Q2)).reshape(-1)[:4]
    assert list(eq) == [True, True, False, True]
    # identity: infinity mask everywhere, equal to itself, not to a point
    i1 = RG1.identity((4,))
    assert bool(np.all(np.array(i1.is_point_equal_to(RG1.identity((4,))))))
    assert not bool(np.any(np.array(i1.is_point_equal_to(P1))))
    i2 = RG2.identity((4,))
    assert bool(np.all(np.array(i2.is_point_equal_to(RG2.identity((4,))))))
    assert not bool(np.any(np.array(i2.is_point_equal_to(Q1))))
    # conditional_select parity on G1 (limb twin ops/curve.py)
    msel = jnp.asarray(rfp.pack_mask(np.array([1, 0, 1, 0])))
    sel = P1.conditional_select(msel, RG1.identity((4,)))
    eq = np.array(sel.is_point_equal_to(P1)).reshape(-1)[:4]
    assert list(eq) == [True, False, True, False]
