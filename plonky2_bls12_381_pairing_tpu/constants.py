"""Generated numeric tables for the limb-vectorized BLS12-381 field core.

All constants are derived at import time from exact Python integers in
``utils/refmodel.py`` (the single source of truth — the analogue of the
reference's hardcoded consts in src/global_constants.rs:1-8 and the inline
Frobenius gamma tables at src/fields_as_trees/fq6_target_tree.rs:129-169 /
fq12_target_tree.rs:92-128, emitted once from exact integers per SURVEY.md §5
"config" plan).

Representation (see ops/fp.py):
  - radix  B = 2^8, canonical Fp element = 48 int32 limbs in [0, 255]
  - Montgomery radix R = 2^(8*49) = 2^392  (one guard limb of headroom so lazy
    tower accumulations stay below R*p ~ 2519 * p^2)
  - values a are stored as a*R mod p ("Montgomery form")
"""

from __future__ import annotations

import numpy as np

from .utils import refmodel as rm

# ---------------------------------------------------------------------------
# Limb geometry
# ---------------------------------------------------------------------------

LIMB_BITS = 8
LIMB_BASE = 1 << LIMB_BITS  # 256
NLIMBS = 48  # canonical limbs per Fp element (384 bits >= 381)
NRED = 49  # limbs of the Montgomery radix R = 2^392
R_BITS = LIMB_BITS * NRED  # 392

P = rm.P
R_MONT = 1 << R_BITS
R2 = R_MONT * R_MONT % P  # for to_mont: a*R = mont_mul(a, R^2)
PPRIME = (-pow(P, -1, R_MONT)) % R_MONT  # p' = -p^-1 mod R
ONE_MONT_INT = R_MONT % P

BLS_X = rm.BLS_X
BLS_X_IS_NEGATIVE = rm.BLS_X_IS_NEGATIVE
NUM_LINE_COEFFS = rm.NUM_LINE_COEFFS


def int_to_limbs(x: int, n: int) -> np.ndarray:
    """Base-2^8 little-endian digits of x as int32; asserts x fits in n limbs."""
    assert 0 <= x < (1 << (LIMB_BITS * n)), "value does not fit in limbs"
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = x & (LIMB_BASE - 1)
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs) -> int:
    """Exact integer value of (possibly non-canonical, signed) limb columns."""
    acc = 0
    for i, v in enumerate(np.asarray(limbs).astype(object)):
        acc += int(v) << (LIMB_BITS * i)
    return acc


# ---------------------------------------------------------------------------
# Canonical limb tables
# ---------------------------------------------------------------------------

P_LIMBS = int_to_limbs(P, NLIMBS)
PPRIME_LIMBS = int_to_limbs(PPRIME, NRED)
R2_LIMBS = int_to_limbs(R2, NLIMBS)
ONE_MONT = int_to_limbs(ONE_MONT_INT, NLIMBS)
ZERO_LIMBS = np.zeros(NLIMBS, dtype=np.int32)

#: 2^392 - p, used by the conditional-subtract (res < 2p -> canonical) step.
CSUB_LIMBS = int_to_limbs(R_MONT - P, NRED)

# ---------------------------------------------------------------------------
# Relaxed negation constant: NEGC = 11*p written with 48 digits all in
# [255, 510], so that NEGC - a is limb-wise non-negative for any canonical a.
# neg_relaxed(a) = NEGC - a represents -a (mod p) with 9-bit limbs, no carries.
# ---------------------------------------------------------------------------


def _relaxed_digits(value: int, n: int) -> np.ndarray:
    base_floor = (1 << (LIMB_BITS * n)) - 1  # all-255 digits value
    w = value - base_floor
    assert 0 <= w <= base_floor + (1 << (LIMB_BITS * (n - 1)))  # representable
    digits = int_to_limbs(w, n) + 255
    assert limbs_to_int(digits) == value
    return digits.astype(np.int32)


NEG_K = 11  # smallest k with k*p >= 2^384 - 1
NEGC_LIMBS = _relaxed_digits(NEG_K * P, NLIMBS)
assert NEGC_LIMBS.min() >= 255 and NEGC_LIMBS.max() <= 510

# ---------------------------------------------------------------------------
# Convolution matrices (f32, exact: all partial sums < 2^24)
# ---------------------------------------------------------------------------


def onehot_conv_matrix(na: int, nb: int) -> np.ndarray:
    """S[(i*nb + j), k] = 1 iff i + j == k; conv(a,b) = outer(a,b).reshape @ S."""
    s = np.zeros((na * nb, na + nb - 1), dtype=np.float32)
    for i in range(na):
        for j in range(nb):
            s[i * nb + j, i + j] = 1.0
    return s


def toeplitz_conv_matrix(const_limbs: np.ndarray, n_in: int, n_out: int) -> np.ndarray:
    """T[i, k] = const[k - i]; x @ T = conv(x, const) truncated to n_out columns."""
    nc = len(const_limbs)
    t = np.zeros((n_in, n_out), dtype=np.float32)
    for i in range(n_in):
        for d in range(nc):
            if i + d < n_out:
                t[i, i + d] = float(const_limbs[d])
    return t


#: m = (T mod R) * p' mod R: (49 in) x (49 out) truncated Toeplitz.
TOEP_PPRIME_MODR = toeplitz_conv_matrix(PPRIME_LIMBS, NRED, NRED)
#: U = m * p: (49 in) x (96 out) full Toeplitz.
TOEP_P = toeplitz_conv_matrix(P_LIMBS, NRED, NRED + NLIMBS - 1)
#: x * (R mod p): embeds stored Montgomery limbs into the product-wide domain
#: (a conv-product of two stored values carries an extra R factor; multiplying
#: a lone stored value by R mod p matches that domain exactly).
TOEP_ONE_MONT = toeplitz_conv_matrix(ONE_MONT, NLIMBS, 2 * NLIMBS - 1)

# ---------------------------------------------------------------------------
# Frobenius coefficients in Montgomery limb form
#   gamma6_1 = xi^((p-1)/3), gamma6_2 = xi^((2p-2)/3), gamma12 = xi^((p-1)/6)
# Each is an Fq2 element -> shape (2, NLIMBS).
# ---------------------------------------------------------------------------


def fp_to_mont_limbs(x: int) -> np.ndarray:
    return int_to_limbs(x * R_MONT % P, NLIMBS)


def fq2_to_mont_limbs(x: rm.Fq2) -> np.ndarray:
    return np.stack([fp_to_mont_limbs(x.c0), fp_to_mont_limbs(x.c1)])


FROB_GAMMA6_1_MONT = fq2_to_mont_limbs(rm.FROB_GAMMA6_1[1])
FROB_GAMMA6_2_MONT = fq2_to_mont_limbs(rm.FROB_GAMMA6_2[1])
FROB_GAMMA12_MONT = fq2_to_mont_limbs(rm.FROB_GAMMA12[1])

# ---------------------------------------------------------------------------
# Miller-loop schedule: static bit table of BLS_X >> 1, MSB-first after the
# leading one (reference loop skeleton fields_as_trees/miller_loop.rs:316-344).
# Entry semantics per processed iteration: (do_add_step,).
# ---------------------------------------------------------------------------


def miller_schedule() -> np.ndarray:
    """Bits of BLS_X>>1 after the leading 1, MSB-first (62 iterations)."""
    x = BLS_X >> 1
    bits = [(x >> i) & 1 for i in range(x.bit_length() - 2, -1, -1)]
    arr = np.array(bits, dtype=np.int32)
    # 62 iterations; 5 add steps; 62 + 5 + 1 final doubling = 68 line triples.
    assert len(arr) == 62 and arr.sum() == 5
    return arr


MILLER_BITS = miller_schedule()

#: Bits of BLS_X itself, MSB-first (for cyclotomic exponentiation by x;
#: reference miller_loop.rs:106-126).
BLS_X_BITS = np.array(
    [(BLS_X >> i) & 1 for i in range(BLS_X.bit_length() - 1, -1, -1)], dtype=np.int32
)
