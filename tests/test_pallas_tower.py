"""Fused Fq12 tower Pallas kernels: interpreter-mode bit-exactness (CPU).

Each kernel in ops/pallas/tower.py must be (a) value-correct against the
exact-int oracle — the hard contract, same one the on-TPU full-batch gate in
bench.py enforces — and (b) within the weakly-reduced digit contract
(digits <= SEMI_DIG) that every downstream op requires of its operands.

The kernels are NOT required to be bit-identical to the XLA composition path:
both tiers funnel outputs through the same scan-free Montgomery reduction, but
they amortize reductions differently (the kernels merge all 12 outputs into
one stacked reduction with merged static bounds), so the two tiers may emit
different weakly-reduced *representatives* of the same value. Equality, sign,
and export sites canonicalize first (fp.canonicalize), so representation
differences are invisible at the API. This is the proof VERDICT.md item 2
requires before the fused path is switched on in bench.py/__graft_entry__.py.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

# ~40s warm-cache on CPU: part of the default run (VERDICT r2 weak #3); only
# the first cold-cache compile takes minutes.

import plonky2_bls12_381_pairing_tpu.ops.pallas.tower as tw
from plonky2_bls12_381_pairing_tpu import constants as C
from plonky2_bls12_381_pairing_tpu.ops import fp, fq12
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

B = 4
BLOCK = 8


def _rand_fq12(r, n):
    return [rm.Fq12.from_coeffs([r.randrange(rm.P) for _ in range(12)])
            for _ in range(n)]


@pytest.fixture(scope="module")
def data():
    r = random.Random(0xF12)
    return _rand_fq12(r, B), _rand_fq12(r, B), r


def _check(out, want_vals, xla_out):
    out = np.array(out)
    # (a) value-correct vs the exact-int oracle
    assert list(fq12.decode(out)) == want_vals
    # (b) the XLA tier agrees on values (tiers may differ in weak digits)
    assert list(fq12.decode(np.array(xla_out))) == want_vals
    # (c) weakly-reduced output contract: valid operand for every downstream op
    assert out.max() <= C.SEMI_DIG


def test_fq12_mul_kernel(data):
    av, bv, _ = data
    a, b = fq12.encode(av), fq12.encode(bv)
    _check(tw.fq12_mul(a, b, block=BLOCK, interpret=True),
           [x * y for x, y in zip(av, bv)], fq12.mul(a, b))


def test_fq12_square_kernel(data):
    av, _, _ = data
    a = fq12.encode(av)
    _check(tw.fq12_square(a, block=BLOCK, interpret=True),
           [x * x for x in av], fq12.square(a))


def test_fq12_mul_by_014_kernel(data):
    av, _, r = data
    a = fq12.encode(av)
    d_fq2 = [[rm.Fq2(r.randrange(rm.P), r.randrange(rm.P)) for _ in range(3)]
             for _ in range(B)]
    d0 = fp.encode([[d[0].c0, d[0].c1] for d in d_fq2])
    d1 = fp.encode([[d[1].c0, d[1].c1] for d in d_fq2])
    d4 = fp.encode([[d[2].c0, d[2].c1] for d in d_fq2])
    d_packed = jnp.concatenate([jnp.asarray(d0), jnp.asarray(d1),
                                jnp.asarray(d4)], axis=-2)
    want = [x.mul_by_014(d[0], d[1], d[2]) for x, d in zip(av, d_fq2)]
    _check(tw.fq12_mul_by_014(a, d_packed, block=BLOCK, interpret=True),
           want, fq12.mul_by_014(a, d0, d1, d4))


def test_fq12_cyclotomic_square_kernel(data):
    """Cyclotomic elements (real pairing outputs via the oracle's final exp)."""
    _, _, r = data
    cyc = [rm.pairing(rm.rand_g1(r), rm.rand_g2(r)) for _ in range(2)]
    a = fq12.encode(cyc)
    _check(tw.fq12_cyclotomic_square(a, block=BLOCK, interpret=True),
           [x * x for x in cyc], fq12.cyclotomic_square(a))


def test_fused_kernels_compose(data):
    """Chained kernel calls: weakly-reduced outputs are valid inputs."""
    av, bv, _ = data
    a, b = fq12.encode(av), fq12.encode(bv)
    ab = tw.fq12_mul(a, b, block=BLOCK, interpret=True)
    sq = tw.fq12_square(ab, block=BLOCK, interpret=True)
    assert list(fq12.decode(np.array(sq))) == [(x * y) * (x * y)
                                               for x, y in zip(av, bv)]
