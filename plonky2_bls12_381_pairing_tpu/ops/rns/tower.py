"""Fq2/Fq6/Fq12 tower on RNS channels.

Same field semantics and formulas as the positional-limb tower (ops/fq2.py,
ops/fq6.py, ops/fq12.py — themselves the TPU re-design of the reference's
tree-mode gadgets, src/fields_as_trees/fq{2,6,12}_target_tree.rs), expressed
over the RNS Fp core: every product is one int32 lane-multiply, linear
combinations ride the bound-tracked `R` accumulator (subtractions need no
relaxed-digit tricks — negative channel values are fine and `redc` biases
with a constant k*p row), and each tower op ends in ONE stacked RNS Montgomery
reduction for all 12 (or 6/2) Fp output components.

Element layout matches the limb tier: Fq12 = (..., 12, LANES) int32 in flat
tower order [c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ... import rns_constants as RC
from ...utils import refmodel as rm
from . import fp

R = fp.R
LANES = fp.LANES

#: Operand channel budget: multiply operands are canonicalized above this so
#: products stay int32-exact through the deepest combination sums.
_OPERAND_BUDGET = 2 * (RC.PRIME_MAX - 1)


def _canon_list(xs: list[R]) -> list[R]:
    return [x.maybe_canon(_OPERAND_BUDGET + 1) for x in xs]


# ---------------------------------------------------------------------------
# Fq2 on R pairs
# ---------------------------------------------------------------------------


def fq2_mul_r(a0: R, a1: R, b0: R, b1: R) -> tuple[R, R]:
    """Karatsuba complex product over u^2 = -1 (ops/fq2.py mul_wide).

    Outputs are channel-canonicalized: Fq2 products are the accumulation
    roots of every tower formula, and canonical (+-m) channels keep the
    deepest downstream combinations trivially inside int32 AND small enough
    that fp.redc can skip its input canonicalization pass."""
    a0, a1, b0, b1 = _canon_list([a0, a1, b0, b1])
    t0 = fp.mul_rr(a0, b0)
    t1 = fp.mul_rr(a1, b1)
    tsum = fp.mul_rr((a0 + a1).maybe_canon(_OPERAND_BUDGET + 1),
                     (b0 + b1).maybe_canon(_OPERAND_BUDGET + 1))
    return (t0 - t1).canon(), (tsum - t0 - t1).canon()


def fq2_nonres(x: tuple[R, R]) -> tuple[R, R]:
    """(u+1) * (x0 + x1 u) = (x0 - x1) + (x0 + x1) u."""
    return x[0] - x[1], x[0] + x[1]


def _pair_add(x, y):
    return x[0] + y[0], x[1] + y[1]


def _pair_sub(x, y):
    return x[0] - y[0], x[1] - y[1]


def _pair_scale(x, k):
    return x[0].scale(k), x[1].scale(k)


# ---------------------------------------------------------------------------
# Fq6 on flat 6-lists of R
# ---------------------------------------------------------------------------


def _fq6_mul(a: list[R], b: list[R]) -> list[R]:
    """Interpolation product (ops/fq6.py mul_wide)."""
    a = _canon_list(a)
    b = _canon_list(b)
    t0 = fq2_mul_r(a[0], a[1], b[0], b[1])
    t1 = fq2_mul_r(a[2], a[3], b[2], b[3])
    t2 = fq2_mul_r(a[4], a[5], b[4], b[5])
    m12 = fq2_mul_r(a[2] + a[4], a[3] + a[5], b[2] + b[4], b[3] + b[5])
    m01 = fq2_mul_r(a[0] + a[2], a[1] + a[3], b[0] + b[2], b[1] + b[3])
    m02 = fq2_mul_r(a[0] + a[4], a[1] + a[5], b[0] + b[4], b[1] + b[5])
    s0 = _pair_add(t0, fq2_nonres(_pair_sub(_pair_sub(m12, t1), t2)))
    s1 = _pair_add(_pair_sub(_pair_sub(m01, t0), t1), fq2_nonres(t2))
    s2 = _pair_add(_pair_sub(_pair_sub(m02, t0), t2), t1)
    return [s0[0], s0[1], s1[0], s1[1], s2[0], s2[1]]


def _fq6_nonres(t: list[R]) -> list[R]:
    x = fq2_nonres((t[4], t[5]))
    return [x[0], x[1], t[0], t[1], t[2], t[3]]


def _fq6_mul_by_01(a: list[R], b00: R, b01: R, b10: R, b11: R) -> list[R]:
    """Sparse product with (b0 + b1 v) (ops/fq6.py mul_by_01_wide)."""
    a = _canon_list(a)
    b00, b01, b10, b11 = _canon_list([b00, b01, b10, b11])
    t0 = fq2_mul_r(a[0], a[1], b00, b01)
    t1 = fq2_mul_r(a[2], a[3], b10, b11)
    m12 = fq2_mul_r(a[2] + a[4], a[3] + a[5], b10, b11)
    m01 = fq2_mul_r(a[0] + a[2], a[1] + a[3], b00 + b10, b01 + b11)
    t2 = fq2_mul_r(a[4], a[5], b00, b01)
    s0 = _pair_add(fq2_nonres(_pair_sub(m12, t1)), t0)
    s1 = _pair_sub(_pair_sub(m01, t0), t1)
    s2 = _pair_add(t2, t1)
    return [s0[0], s0[1], s1[0], s1[1], s2[0], s2[1]]


def _fq6_mul_by_1(a: list[R], b10: R, b11: R) -> list[R]:
    """Sparse product with (b1 v): (xi*(a2*b1), a0*b1, a1*b1)."""
    a = _canon_list(a)
    b10, b11 = _canon_list([b10, b11])
    x = fq2_nonres(fq2_mul_r(a[4], a[5], b10, b11))
    s1 = fq2_mul_r(a[0], a[1], b10, b11)
    s2 = fq2_mul_r(a[2], a[3], b10, b11)
    return [x[0], x[1], s1[0], s1[1], s2[0], s2[1]]


def _list_add(x, y):
    return [a + b for a, b in zip(x, y)]


def _list_sub(x, y):
    return [a - b for a, b in zip(x, y)]


# ---------------------------------------------------------------------------
# Fq12 stored-element API (mirrors ops/fq12.py)
# ---------------------------------------------------------------------------


def _comps(a: jnp.ndarray, lo: int, hi: int) -> list[R]:
    return [fp.wrap(a[..., i, :]) for i in range(lo, hi)]


def zero(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, 12, LANES), dtype=jnp.int32)


def one(batch_shape=()) -> jnp.ndarray:
    o = np.zeros((12, LANES), dtype=np.int32)
    o[0] = RC.ONE
    return jnp.broadcast_to(jnp.asarray(o), (*batch_shape, 12, LANES))


def encode(x) -> np.ndarray:
    """refmodel.Fq12 (nested lists ok) -> (..., 12, LANES)."""
    arr = np.asarray(x, dtype=object)
    ints = np.empty(arr.shape + (12,), dtype=object)
    for idx in np.ndindex(arr.shape):
        for j, v in enumerate(arr[idx].coeffs()):
            ints[idx + (j,)] = v
    return fp.encode(ints)


def decode(a):
    ints = fp.decode(a)
    shape = ints.shape[:-1]
    out = np.empty(shape, dtype=object)
    for idx in np.ndindex(shape):
        out[idx] = rm.Fq12.from_coeffs([int(ints[idx + (j,)]) for j in range(12)])
    return out if shape else out[()]


def select(mask, a, b):
    """mask: packed lane mask (..., LANES) — each element's 64-lane slot
    selects independently."""
    return jnp.where(mask[..., None, :] != 0, a, b)


def is_equal(a, b):
    """(..., PACK) bools per packed element."""
    return jnp.all(fp.is_equal(a, b), axis=-2)  # reduce the 12-comp axis


def is_one(a):
    return is_equal(a, jnp.broadcast_to(one(), a.shape))


def connect(a, b):
    """Equality constraint row (reference fq12_target.rs:50-54); returns
    (..., PACK) after reducing the 12-component axis."""
    return jnp.all(fp.connect(a, b), axis=-2)


def div(a, b):
    """a / b = a * b^-1 (reference fq12_target.rs:295-299; inv0 for b == 0)."""
    return mul(a, inv(b))


def conditional_mul(a, x, mask):
    """mask ? a*x : a (reference fq12_target.rs:323-331); mask: packed lane
    mask (..., LANES)."""
    return select(mask, mul(a, x), a)


def _fused(fn, key, in_comps, out_comps=12, block=64):
    from . import pallas as _pk

    return _pk.fused_op(fn, key, in_comps, out_comps, block)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Karatsuba over Fq6 with w^2 = v (ops/fq12.py mul)."""
    if fp.use_fused_tower():
        return _fused(_mul_impl, "fq12_mul", (12, 12))(a, b)
    return _mul_impl(a, b)


def _mul_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a0, a1 = _comps(a, 0, 6), _comps(a, 6, 12)
    b0, b1 = _comps(b, 0, 6), _comps(b, 6, 12)
    asum = _canon_list(_list_add(a0, a1))
    bsum = _canon_list(_list_add(b0, b1))
    t0 = _fq6_mul(a0, b0)
    t1 = _fq6_mul(a1, b1)
    t01 = _fq6_mul(asum, bsum)
    out0 = _list_add(t0, _fq6_nonres(t1))
    out1 = _list_sub(_list_sub(t01, t0), t1)
    return fp.redc_stack(out0 + out1)


def square(a: jnp.ndarray) -> jnp.ndarray:
    """Complex squaring: c0 = (a0+a1)(a0 + v a1) - ab - v ab, c1 = 2 ab."""
    if fp.use_fused_tower():
        return _fused(_square_impl, "fq12_square", (12,))(a)
    return _square_impl(a)


def _square_impl(a: jnp.ndarray) -> jnp.ndarray:
    a0, a1 = _comps(a, 0, 6), _comps(a, 6, 12)
    s = _canon_list(_list_add(a0, a1))
    # t = a0 + v*a1 with v*a1 = (xi*(a1c2), a1c0, a1c1); negatives are free.
    va1 = _fq6_nonres(a1)  # == v * a1 for the 6-list layout
    t = _canon_list(_list_add(a0, va1))
    ab = _fq6_mul(a0, a1)
    st = _fq6_mul(s, t)
    out0 = _list_sub(_list_sub(st, ab), _fq6_nonres(ab))
    out1 = [x.scale(2) for x in ab]
    return fp.redc_stack(out0 + out1)


def _pack_d(a, d0, d1, d4) -> jnp.ndarray:
    tgt = a[..., :2, :].shape
    # skip no-op broadcasts: a broadcast_in_dim on an already-full-shape
    # operand makes XLA's SPMD propagation replicate it (two small
    # all-gathers inside the Miller body at 8 virtual devices; test_mesh
    # asserts the per-instance graph is collective-free)
    return jnp.concatenate(
        [x if x.shape == tgt else jnp.broadcast_to(x, tgt)
         for x in (d0, d1, d4)], axis=-2)


def mul_by_014(a: jnp.ndarray, d0: jnp.ndarray, d1: jnp.ndarray,
               d4: jnp.ndarray) -> jnp.ndarray:
    """Sparse product with (d0 + d1 v) + (d4 v) w (ops/fq12.py mul_by_014);
    d0/d1/d4: (..., 2, LANES) stored Fq2 operands."""
    if fp.use_fused_tower():
        return _fused(_mul014_packed, "fq12_mul014", (12, 6))(
            a, _pack_d(a, d0, d1, d4))
    return _mul014_packed(a, _pack_d(a, d0, d1, d4))


def mul_by_014_square(a: jnp.ndarray, d0: jnp.ndarray, d1: jnp.ndarray,
                      d4: jnp.ndarray) -> jnp.ndarray:
    """square(mul_by_014(a, d)) — the fused Miller-step body (ell + square
    back-to-back in VMEM; VERDICT r2 task #1)."""
    if fp.use_fused_tower():
        return _fused(_mul014_square_packed, "fq12_mul014_sq", (12, 6),
                      block=32)(a, _pack_d(a, d0, d1, d4))
    return _square_impl(_mul014_packed(a, _pack_d(a, d0, d1, d4)))


def _mul014_square_packed(a: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    return _square_impl(_mul014_packed(a, d))


def _mul014_packed(a: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    a0, a1 = _comps(a, 0, 6), _comps(a, 6, 12)
    d00, d01 = fp.wrap(d[..., 0, :]), fp.wrap(d[..., 1, :])
    d10, d11 = fp.wrap(d[..., 2, :]), fp.wrap(d[..., 3, :])
    d40, d41 = fp.wrap(d[..., 4, :]), fp.wrap(d[..., 5, :])
    asum = _canon_list(_list_add(a0, a1))
    aa = _fq6_mul_by_01(a0, d00, d01, d10, d11)
    bb = _fq6_mul_by_1(a1, d40, d41)
    t1 = _fq6_mul_by_01(asum, d00, d01, d10 + d40, d11 + d41)
    out0 = _list_add(_fq6_nonres(bb), aa)
    out1 = _list_sub(_list_sub(t1, aa), bb)
    return fp.redc_stack(out0 + out1)


def conjugate(a: jnp.ndarray) -> jnp.ndarray:
    """f^(p^6): negate the w-part (4p - x, canonical channels)."""
    c0 = a[..., 0:6, :]
    c1 = a[..., 6:12, :]
    negc1 = fp.barrett(fp.cst(("pmul", 4)) - c1)
    return jnp.concatenate([c0, negc1], axis=-2)


# -- cyclotomic squaring ----------------------------------------------------


def _fp4_square(a0: R, a1: R, b0: R, b1: R):
    """Fq4 square (ops/fq12.py _fp4_square_wide)."""
    t0 = fq2_mul_r(a0, a1, a0, a1)
    t1 = fq2_mul_r(b0, b1, b0, b1)
    t2 = fq2_mul_r(a0 + b0, a1 + b1, a0 + b0, a1 + b1)
    t2 = _pair_sub(_pair_sub(t2, t0), t1)
    return _pair_add(fq2_nonres(t1), t0), t2


def cyclotomic_square(a: jnp.ndarray) -> jnp.ndarray:
    """Granger-Scott squaring (ops/fq12.py cyclotomic_square; reference
    miller_loop.rs:46-104)."""
    if fp.use_fused_tower():
        return _fused(_cyc_square_impl, "fq12_cycsq", (12,))(a)
    return _cyc_square_impl(a)


def _cyc_square_impl(a: jnp.ndarray) -> jnp.ndarray:
    z0 = (fp.wrap(a[..., 0, :]), fp.wrap(a[..., 1, :]))
    z4 = (fp.wrap(a[..., 2, :]), fp.wrap(a[..., 3, :]))
    z3 = (fp.wrap(a[..., 4, :]), fp.wrap(a[..., 5, :]))
    z2 = (fp.wrap(a[..., 6, :]), fp.wrap(a[..., 7, :]))
    z1 = (fp.wrap(a[..., 8, :]), fp.wrap(a[..., 9, :]))
    z5 = (fp.wrap(a[..., 10, :]), fp.wrap(a[..., 11, :]))

    t0_01, t1_01 = _fp4_square(*z0, *z1)
    t0_23, t1_23 = _fp4_square(*z2, *z3)
    t2_45, t3_45 = _fp4_square(*z4, *z5)

    # the bare 2*z terms must be lifted into the product domain before mixing
    # with the Fq4-square products (fp.to_prod)
    z0w = (fp.to_prod(a[..., 0, :]), fp.to_prod(a[..., 1, :]))
    z4w = (fp.to_prod(a[..., 2, :]), fp.to_prod(a[..., 3, :]))
    z3w = (fp.to_prod(a[..., 4, :]), fp.to_prod(a[..., 5, :]))
    z2w = (fp.to_prod(a[..., 6, :]), fp.to_prod(a[..., 7, :]))
    z1w = (fp.to_prod(a[..., 8, :]), fp.to_prod(a[..., 9, :]))
    z5w = (fp.to_prod(a[..., 10, :]), fp.to_prod(a[..., 11, :]))

    nz0 = _pair_sub(_pair_scale(t0_01, 3), _pair_scale(z0w, 2))
    nz1 = _pair_add(_pair_scale(t1_01, 3), _pair_scale(z1w, 2))
    nz4 = _pair_sub(_pair_scale(t0_23, 3), _pair_scale(z4w, 2))
    nz5 = _pair_add(_pair_scale(t1_23, 3), _pair_scale(z5w, 2))
    t3xi = fq2_nonres(t3_45)
    nz2 = _pair_add(_pair_scale(t3xi, 3), _pair_scale(z2w, 2))
    nz3 = _pair_sub(_pair_scale(t2_45, 3), _pair_scale(z3w, 2))

    return fp.redc_stack(
        [nz0[0], nz0[1], nz4[0], nz4[1], nz3[0], nz3[1],
         nz2[0], nz2[1], nz1[0], nz1[1], nz5[0], nz5[1]]
    )


# -- Karabina compressed cyclotomic squaring --------------------------------
#
# eprint 2010/542 (Karabina, "Squaring in cyclotomic subgroups"), in the
# Granger-Scott Fp4-tower labelling used by cyclotomic_square: a cyclotomic
# element is represented by (g2, g3, g4, g5) alone; squaring costs 4 Fq2
# products and 8 REDC rows (vs 9 and 12 for full Granger-Scott), and the
# dropped (g0, g1) are recovered with ONE Fq2 inversion — cheap here because
# fp.inv is a batched Montgomery tree, so all decompressions of an
# exponentiation share one inversion. Formulas validated bit-exactly against
# utils/refmodel.cyclotomic_square.

#: Flat component indices of (g2, g3, g4, g5): in the GS labelling
#: g2 = c1.c0, g3 = c0.c2, g4 = c0.c1, g5 = c1.c2.
_KARA_IDX = [6, 7, 4, 5, 2, 3, 10, 11]


def compress_cyclotomic(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 12, LANES) cyclotomic element -> (..., 8, LANES) compressed."""
    return a[..., _KARA_IDX, :]


def _kpairs(c: jnp.ndarray):
    g = lambda i: (fp.wrap(c[..., 2 * i, :]), fp.wrap(c[..., 2 * i + 1, :]))
    return g(0), g(1), g(2), g(3)  # g2, g3, g4, g5


def compressed_square(c: jnp.ndarray) -> jnp.ndarray:
    """One Karabina squaring on (..., 8, LANES) compressed data."""
    g2, g3, g4, g5 = _kpairs(c)
    B45 = fq2_mul_r(*g4, *g5)
    A45 = fq2_mul_r(g4[0] + g5[0], g4[1] + g5[1],
                    g4[0] + g5[0] - g5[1], g4[1] + g5[0] + g5[1])
    B23 = fq2_mul_r(*g2, *g3)
    A23 = fq2_mul_r(g2[0] + g3[0], g2[1] + g3[1],
                    g2[0] + g3[0] - g3[1], g2[1] + g3[0] + g3[1])
    t45 = _pair_sub(_pair_sub(A45, B45), fq2_nonres(B45))  # g4^2 + xi g5^2
    t23 = _pair_sub(_pair_sub(A23, B23), fq2_nonres(B23))  # g2^2 + xi g3^2
    g2p = (fp.to_prod(c[..., 0, :]), fp.to_prod(c[..., 1, :]))
    g3p = (fp.to_prod(c[..., 2, :]), fp.to_prod(c[..., 3, :]))
    g4p = (fp.to_prod(c[..., 4, :]), fp.to_prod(c[..., 5, :]))
    g5p = (fp.to_prod(c[..., 6, :]), fp.to_prod(c[..., 7, :]))
    h2 = _pair_add(_pair_scale(g2p, 2), _pair_scale(fq2_nonres(B45), 6))
    h3 = _pair_sub(_pair_scale(t45, 3), _pair_scale(g3p, 2))
    h4 = _pair_sub(_pair_scale(t23, 3), _pair_scale(g4p, 2))
    h5 = _pair_add(_pair_scale(g5p, 2), _pair_scale(B23, 6))
    return fp.redc_stack([h2[0], h2[1], h3[0], h3[1],
                          h4[0], h4[1], h5[0], h5[1]])


_QUARTER = None  # lazy RNS Montgomery row of 4^{-1} mod p


def _quarter_pair():
    global _QUARTER
    if _QUARTER is None:
        _QUARTER = RC.encode_int(pow(4, -1, RC.P))
    q = fp.wrap(fp.cst(("kara_quarter",), _QUARTER))
    return q


def decompress_cyclotomic(c: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, LANES) compressed -> (..., 12, LANES) full element.

    g1 = (xi g5^2 + 3 g4^2 - 2 g3) / (4 g2)            (g2 != 0)
       = (8 g4 g5) / (4 g3)                            (g2 == 0)
    g0 = xi (2 g1^2 + g2 g5 - 3 g3 g4) + 1  (covers both cases: g2 g5 = 0
    when g2 = 0), and all-zero input decompresses to one — the identity."""
    g2, g3, g4, g5 = _kpairs(c)
    g3p = (fp.to_prod(c[..., 2, :]), fp.to_prod(c[..., 3, :]))
    g5sq = fq2_mul_r(*g5, *g5)
    g4sq = fq2_mul_r(*g4, *g4)
    g4g5 = fq2_mul_r(*g4, *g5)
    num1 = _pair_sub(_pair_add(fq2_nonres(g5sq), _pair_scale(g4sq, 3)),
                     _pair_scale(g3p, 2))
    num2 = _pair_scale(g4g5, 8)
    s1 = fp.redc_stack([num1[0], num1[1], num2[0], num2[1]])
    # g2 == 0 test per packed element -> lane mask
    z2 = fp.is_zero(c[..., 0, :]) & fp.is_zero(c[..., 1, :])  # (..., PACK)
    zlane = jnp.repeat(z2.astype(jnp.int32), RC.SUB, axis=-1)[..., None, :]
    num = jnp.where(zlane != 0, s1[..., 2:4, :], s1[..., 0:2, :])
    den = jnp.where(zlane != 0, c[..., 2:4, :], c[..., 0:2, :])
    dinv = _fq2_inv(den)  # batched tree inversion
    q = _quarter_pair()
    dq = fp.redc_stack([fp.mul_rr(fp.wrap(dinv[..., 0, :]), q),
                        fp.mul_rr(fp.wrap(dinv[..., 1, :]), q)])  # dinv / 4
    g1w = fq2_mul_r(fp.wrap(num[..., 0, :]), fp.wrap(num[..., 1, :]),
                    fp.wrap(dq[..., 0, :]), fp.wrap(dq[..., 1, :]))
    g1s = fp.redc_stack([g1w[0], g1w[1]])
    g1 = (fp.wrap(g1s[..., 0, :]), fp.wrap(g1s[..., 1, :]))
    g1sq = fq2_mul_r(*g1, *g1)
    g2g5 = fq2_mul_r(*g2, *g5)
    g3g4 = fq2_mul_r(*g3, *g4)
    inner = _pair_sub(_pair_add(_pair_scale(g1sq, 2), g2g5),
                      _pair_scale(g3g4, 3))
    one_p = fp.to_prod(jnp.broadcast_to(jnp.asarray(RC.ONE), c[..., 0, :].shape))
    g0w = _pair_add(fq2_nonres(inner), (one_p, one_p.scale(0)))
    g0s = fp.redc_stack([g0w[0], g0w[1]])
    # reassemble flat order: c0 = (g0, g4, g3), c1 = (g2, g1, g5)
    return jnp.concatenate([
        g0s,                    # components 0,1
        c[..., 4:6, :],         # g4 -> components 2,3
        c[..., 2:4, :],         # g3 -> components 4,5
        c[..., 0:2, :],         # g2 -> components 6,7
        g1s,                    # components 8,9
        c[..., 6:8, :],         # g5 -> components 10,11
    ], axis=-2)

# Combined gamma constants: the fq6-level twists (gamma6_1, gamma6_2) and the
# fq12-level gamma12 products, in RNS Montgomery form (all derived from exact
# ints; same values as the limb tier's constants.FROB_*).
def _enc_fq2(x: rm.Fq2) -> np.ndarray:
    return np.stack([RC.encode_int(x.c0), RC.encode_int(x.c1)])

_G6_1 = rm.FROB_GAMMA6_1[1]
_G6_2 = rm.FROB_GAMMA6_2[1]
_G12 = rm.FROB_GAMMA12[1]
FROB_C = {
    "g6_1": _enc_fq2(_G6_1),
    "g6_2": _enc_fq2(_G6_2),
    "g12": _enc_fq2(_G12),
    "g12_1": _enc_fq2(_G6_1 * _G12),
    "g12_2": _enc_fq2(_G6_2 * _G12),
}


def _const_pair(name: str):
    arr = FROB_C[name]
    return (fp.wrap(fp.cst(("frob", name, 0), arr[0])),
            fp.wrap(fp.cst(("frob", name, 1), arr[1])))


def _conj_pair(a: jnp.ndarray, i: int) -> tuple[R, R]:
    """Conjugate of the i-th Fq2 component as an R pair (negation via 4p-x)."""
    c0 = fp.wrap(a[..., 2 * i, :])
    c1 = fp.neg_r(fp.wrap(a[..., 2 * i + 1, :]), 4)
    return c0, c1


def frobenius_map(a: jnp.ndarray) -> jnp.ndarray:
    """One Frobenius power (ops/fq12.py frobenius_map with the gamma6*gamma12
    products folded): out c0 = (conj c00, conj c01 * g6_1, conj c02 * g6_2),
    out c1 = (conj c10 * g12, conj c11 * g6_1*g12, conj c12 * g6_2*g12);
    ONE stacked REDC for the 10 multiplied components."""
    names = [None, "g6_1", "g6_2", "g12", "g12_1", "g12_2"]
    outs: list[R] = []
    for i, name in enumerate(names):
        pair = _conj_pair(a, i)
        if name is None:
            continue
        g = _const_pair(name)
        o0, o1 = fq2_mul_r(pair[0], pair[1], g[0], g[1])
        outs.extend([o0, o1])
    prod = fp.redc_stack(outs)  # (..., 10, LANES)
    c00 = a[..., 0:1, :]
    c01 = fp.barrett(fp.cst(("pmul", 4)) - a[..., 1:2, :])
    return jnp.concatenate([c00, c01, prod], axis=-2)


def frobenius_pow(a: jnp.ndarray, n: int) -> jnp.ndarray:
    for _ in range(n):
        a = frobenius_map(a)
    return a


# -- inversion --------------------------------------------------------------


def _fq2_inv(a: jnp.ndarray) -> jnp.ndarray:
    """(c0 - c1 u)/(c0^2 + c1^2) (ops/fq2.py inv): one Fp Fermat inverse."""
    c0 = fp.wrap(a[..., 0, :])
    c1 = fp.wrap(a[..., 1, :])
    norm = fp.redc(fp.mul_rr(c0, c0) + fp.mul_rr(c1, c1))
    ninv = fp.inv(norm)
    w = fp.wrap(ninv)
    return fp.redc_stack([fp.mul_rr(c0, w), fp.mul_rr(fp.neg_r(c1, 4), w)])


def _fq6_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Adjugate/norm closed form (ops/fq6.py inv), a: (..., 6, LANES)."""
    c = [fp.wrap(a[..., i, :]) for i in range(6)]
    a0, a1, a2 = (c[0], c[1]), (c[2], c[3]), (c[4], c[5])
    sq0 = fq2_mul_r(*a0, *a0)
    m12 = fq2_mul_r(*a1, *a2)
    t0 = _pair_sub(sq0, fq2_nonres(m12))
    sq2 = fq2_mul_r(*a2, *a2)
    m01 = fq2_mul_r(*a0, *a1)
    t1 = _pair_sub(fq2_nonres(sq2), m01)
    sq1 = fq2_mul_r(*a1, *a1)
    m02 = fq2_mul_r(*a0, *a2)
    t2 = _pair_sub(sq1, m02)
    ts = fp.redc_stack([t0[0], t0[1], t1[0], t1[1], t2[0], t2[1]])
    t0s = (fp.wrap(ts[..., 0, :]), fp.wrap(ts[..., 1, :]))
    t1s = (fp.wrap(ts[..., 2, :]), fp.wrap(ts[..., 3, :]))
    t2s = (fp.wrap(ts[..., 4, :]), fp.wrap(ts[..., 5, :]))
    n0 = fq2_mul_r(*a0, *t0s)
    n1 = fq2_mul_r(*a2, *t1s)
    n2 = fq2_mul_r(*a1, *t2s)
    norm_w = _pair_add(n0, fq2_nonres(_pair_add(n1, n2)))
    norm = fp.redc_stack([norm_w[0], norm_w[1]])
    ninv = _fq2_inv(norm)
    iv = (fp.wrap(ninv[..., 0, :]), fp.wrap(ninv[..., 1, :]))
    outs = []
    for t in (t0s, t1s, t2s):
        o = fq2_mul_r(*t, *iv)
        outs.extend([o[0], o[1]])
    return fp.redc_stack(outs)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """(c0 - c1 w)/(c0^2 - v c1^2) (ops/fq12.py inv)."""
    a0 = [fp.wrap(a[..., i, :]) for i in range(6)]
    a1 = [fp.wrap(a[..., i, :]) for i in range(6, 12)]
    sq0 = _fq6_mul(a0, a0)
    sq1 = _fq6_mul(a1, a1)
    t = fp.redc_stack(_list_sub(sq0, _fq6_nonres(sq1)))
    tinv = _fq6_inv(t)
    ti = [fp.wrap(tinv[..., i, :]) for i in range(6)]
    out0 = _fq6_mul(a0, ti)
    neg_a1 = [fp.neg_r(x, 4) for x in a1]
    out1 = _fq6_mul(neg_a1, ti)
    return fp.redc_stack(out0 + out1)
