"""Pallas kernel correctness in interpreter mode (runs on CPU).

The real-hardware path is exercised by bench.py's bit-exactness gate; these
tests pin the kernel *algorithms* — the scan-free Montgomery reduction
(constant bias row + static passes + mod-65521 quotient test), the roll-MAC
convolution, and the weakly-reduced output contract — against the oracle,
including adversarial carry patterns and semi-input feedback."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import plonky2_bls12_381_pairing_tpu.ops.pallas.mont as pm
from plonky2_bls12_381_pairing_tpu import constants as C
from plonky2_bls12_381_pairing_tpu.ops import fp
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

B = 8


@pytest.fixture(scope="module")
def data():
    r = random.Random(0xA11CE)
    a = [r.randrange(rm.P) for _ in range(B)]
    b = [r.randrange(rm.P) for _ in range(B)]
    return a, b


def test_conv_kernel_matches_xla(data):
    a_int, b_int = data
    a, b = jnp.asarray(fp.encode(a_int)), jnp.asarray(fp.encode(b_int))
    cols_k = np.array(pm.conv(a, b, block=B, interpret=True))
    cols_x = np.array(fp.conv(a, b).cols)
    assert np.array_equal(cols_k, cols_x)


def test_mont_mul_kernel_bit_exact(data):
    a_int, b_int = data
    a, b = jnp.asarray(fp.encode(a_int)), jnp.asarray(fp.encode(b_int))
    out = np.array(pm.mont_mul(a, b, block=B, interpret=True))
    assert list(fp.decode(out)) == [x * y % rm.P for x, y in zip(a_int, b_int)]
    # weakly-reduced contract: digits bounded, value below SEMI_VAL
    assert out.max() <= C.SEMI_DIG
    for row in out:
        assert C.limbs_to_int(row) < C.SEMI_VAL


def test_mont_mul_edge_and_semi_feedback():
    edge = [0, 1, rm.P - 1, rm.P - 1, 0, 1, 2, 3]
    a = jnp.asarray(fp.encode(edge))
    b = jnp.asarray(fp.encode(list(reversed(edge))))
    o1 = pm.mont_mul(a, b, block=8, interpret=True)
    want1 = [x * y % rm.P for x, y in zip(edge, reversed(edge))]
    assert list(fp.decode(np.array(o1))) == want1
    # semi outputs (digits may exceed 255) must be valid inputs
    o2 = np.array(pm.mont_mul(o1, o1, block=8, interpret=True))
    assert list(fp.decode(o2)) == [v * v % rm.P for v in want1]


def test_mont_reduce_signed_wide(data):
    a_int, b_int = data
    r = random.Random(7)
    c_int = [r.randrange(rm.P) for _ in range(B)]
    d_int = [r.randrange(rm.P) for _ in range(B)]
    a, b = jnp.asarray(fp.encode(a_int)), jnp.asarray(fp.encode(b_int))
    c, d = jnp.asarray(fp.encode(c_int)), jnp.asarray(fp.encode(d_int))
    w = fp.conv(a, b) - fp.conv(c, d)  # value may be negative
    red = np.array(pm.mont_reduce(w.cols, w.col_lo, w.col_hi, block=B, interpret=True))
    want = [(x * y - u * v) % rm.P for x, y, u, v in zip(a_int, b_int, c_int, d_int)]
    assert list(fp.decode(red)) == want


def test_reduce_adversarial_columns():
    """All-0xFF carry-ripple columns and max-negative columns reduce exactly."""
    rows = np.zeros((4, 95), dtype=np.int32)
    rows[0, :] = 255 * 255 * 48  # max uniform conv columns
    rows[1, :48] = 255
    rows[2, 0] = -(1 << 25)  # deep negative low column
    rows[2, 1] = 1 << 25
    rows[3, 94] = 255 * 255 * 48
    vals = [C.limbs_to_int(r) for r in rows]
    red = np.array(pm.mont_reduce(jnp.asarray(rows), -(1 << 25), 255 * 255 * 48,
                                  block=4, interpret=True))
    rinv = pow(1 << C.R_BITS, -1, rm.P)
    got = [C.limbs_to_int(r) % rm.P for r in red]  # raw digits, one R division
    assert got == [v * rinv % rm.P for v in vals]


def test_semi_passes_bound_tracking():
    assert pm._static_pass_count(0, 255 * 255 * 48) >= 2
    assert pm._static_pass_count(-1, 257) == 0


def test_cyc_exp_run_matches_refmodel(rng):
    """Whole-exponent Granger-Scott kernel (interpret mode) vs refmodel
    cyclotomic_exp — the production TPU final-exp path."""
    import random

    from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
    from plonky2_bls12_381_pairing_tpu.ops.rns import pallas as rpk
    from plonky2_bls12_381_pairing_tpu.ops.rns import tower

    r = random.Random(0xC1C)
    f = rm.rand_fq12(r)
    t = f.frobenius_pow(6) * f.inv()
    cyc = t.frobenius_pow(2) * t
    F = tower.encode([cyc, cyc])
    out = rpk.cyc_exp_run(F, mpr._GS_SEGMENTS, interpret=True)
    got = tower.decode(np.asarray(tower.conjugate(out)))
    assert list(got)[:2] == [rm.cyclotomic_exp(cyc)] * 2


def test_kara_full_run_matches_refmodel():
    """Fully-fused Karabina kernel (chain + in-kernel decompression + shared
    tree inversion + snapshot product), interpret mode, incl. the identity
    element (all-zero compressed state -> one). Experimental path: ~25% fewer
    REDC rows than the production cyc_exp_run kernel, but its Mosaic compile
    exceeds 10 minutes on v5e, so it is not wired into the pipeline."""
    import random

    from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
    from plonky2_bls12_381_pairing_tpu.ops.rns import pallas as rpk
    from plonky2_bls12_381_pairing_tpu.ops.rns import tower

    r = random.Random(0xFA11)
    f = rm.rand_fq12(r)
    t = f.frobenius_pow(6) * f.inv()
    cyc = t.frobenius_pow(2) * t
    F = tower.encode([cyc, cyc * cyc, rm.Fq12.one(), cyc])
    segs = tuple(e - l for e, l in
                 zip(mpr._X_SET_BITS, [0] + mpr._X_SET_BITS[:-1]))
    out = rpk.kara_full_run(F, segs, block=8, interpret=True)
    got = list(tower.decode(np.asarray(tower.conjugate(out))))[:4]
    want = [rm.cyclotomic_exp(x)
            for x in (cyc, cyc * cyc, rm.Fq12.one(), cyc)]
    assert got == want
