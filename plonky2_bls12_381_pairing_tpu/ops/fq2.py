"""Batched Fq2 = Fp[u]/(u^2+1) on limb vectors.

TPU re-design of the reference's tree-mode Fq2 gadget
(src/fields_as_trees/fq2_target_tree.rs:12-164, flat variant
src/fields/fq2_target.rs): an element is (..., 2, NLIMBS) Montgomery limbs.

Two API tiers:
  * canonical ops (mul, square, inv, ...) returning reduced limbs;
  * ``*_wide`` ops returning pairs of fp.Wide — unreduced column accumulators
    that the Fq6/Fq12 layers combine before a single stacked Montgomery
    reduction per output component (lazy reduction; the batched analogue of
    accumulating nonnative products before one range-checked reduction).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fp

WidePair = tuple[fp.Wide, fp.Wide]


# ---------------------------------------------------------------------------
# Structure helpers
# ---------------------------------------------------------------------------


def c0(a: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0, :]


def c1(a: jnp.ndarray) -> jnp.ndarray:
    return a[..., 1, :]


def pack(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([x0, x1], axis=-2)


def zero(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, 2, fp.NLIMBS), dtype=jnp.int32)


def one(batch_shape=()) -> jnp.ndarray:
    return pack(fp.one_mont(batch_shape), fp.zeros(batch_shape))


def encode(x) -> jnp.ndarray:
    """refmodel.Fq2 (or nested lists of them) -> (..., 2, NLIMBS)."""
    import numpy as np

    arr = np.asarray(x, dtype=object)
    ints = np.empty(arr.shape + (2,), dtype=object)
    for idx in np.ndindex(arr.shape):
        ints[idx + (0,)] = arr[idx].c0
        ints[idx + (1,)] = arr[idx].c1
    return fp.encode(ints)


def decode(a):
    """(..., 2, NLIMBS) -> refmodel.Fq2 (object ndarray for batches)."""
    import numpy as np

    from ..utils import refmodel as rm

    ints = fp.decode(a)
    shape = ints.shape[:-1]
    out = np.empty(shape, dtype=object)
    for idx in np.ndindex(shape):
        out[idx] = rm.Fq2(int(ints[idx + (0,)]), int(ints[idx + (1,)]))
    return out if shape else out[()]


# ---------------------------------------------------------------------------
# Canonical linear ops
# ---------------------------------------------------------------------------


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return fp.add(a, b)  # component-wise; fp ops batch over the 2-axis


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return fp.sub(a, b)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return fp.neg(a)


def neg_conjugate(a: jnp.ndarray) -> jnp.ndarray:
    """(-a0, a1) (reference fq2_target.rs:240-246)."""
    return pack(fp.neg(c0(a)), c1(a))


def div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a / b = a * b^-1 (reference fq2_target.rs:227-230; inv0 for b == 0)."""
    return mul(a, inv(b))


def connect(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Equality constraint row (reference fq2_target.rs:48-52); see
    fp.connect."""
    return fp.connect(a, b)


def conjugate(a: jnp.ndarray) -> jnp.ndarray:
    """a0 - a1 u; also the Fq2 Frobenius map (reference fq2_target_tree.rs:93-95)."""
    return pack(c0(a), fp.neg(c1(a)))


frobenius_map = conjugate


def mul_by_nonresidue(a: jnp.ndarray) -> jnp.ndarray:
    """(u+1)*a = (a0 - a1) + (a0 + a1)u (reference fq2_target_tree.rs:137-142)."""
    return pack(fp.sub(c0(a), c1(a)), fp.add(c0(a), c1(a)))


def scale_fp(a: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Multiply both components by an Fp scalar k (..., NLIMBS)."""
    w0 = fp.conv(c0(a), k)
    w1 = fp.conv(c1(a), k)
    out = fp.mont_reduce_stack([w0, w1])
    return out


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    m = mask[..., None, None]
    return jnp.where(m != 0, a, b)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(fp.canonicalize(a) == 0, axis=(-1, -2))


def is_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(fp.canonicalize(a) == fp.canonicalize(b), axis=(-1, -2))


# ---------------------------------------------------------------------------
# Wide (lazy) products
# ---------------------------------------------------------------------------


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> WidePair:
    """Karatsuba product as unreduced columns:
    c0 = a0b0 - a1b1,  c1 = (a0+a1)(b0+b1) - a0b0 - a1b1."""
    a0, a1, b0, b1 = c0(a), c1(a), c0(b), c1(b)
    t0 = fp.conv(a0, b0)
    t1 = fp.conv(a1, b1)
    tsum = fp.conv(a0 + a1, b0 + b1, a_max=2 * fp.SEMI_DIG, b_max=2 * fp.SEMI_DIG,
                   a_val=2 * fp.SEMI_VAL, b_val=2 * fp.SEMI_VAL)
    return (t0 - t1, tsum - t0 - t1)


def square_wide(a: jnp.ndarray) -> WidePair:
    return mul_wide(a, a)


def mul_wide_generic(x: jnp.ndarray, y: jnp.ndarray, x_max: int = fp.SEMI_DIG,
                     x_val: int = fp.SEMI_VAL, y_max: int = fp.SEMI_DIG,
                     y_val: int = fp.SEMI_VAL) -> WidePair:
    """Wide Fq2 product for operands with relaxed (up to ~10-bit) limbs.

    Uses Karatsuba (3 convs) when the limb-sum operands still satisfy the f32
    exactness budget, else falls back to 4-conv schoolbook."""
    a0, a1 = c0(x), c1(x)
    b0, b1 = c0(y), c1(y)
    t0 = fp.conv(a0, b0, a_max=x_max, b_max=y_max, a_val=x_val, b_val=y_val)
    t1 = fp.conv(a1, b1, a_max=x_max, b_max=y_max, a_val=x_val, b_val=y_val)
    if fp.NLIMBS * (2 * x_max) * (2 * y_max) < fp._F32_EXACT:
        tsum = fp.conv(a0 + a1, b0 + b1, a_max=2 * x_max, b_max=2 * y_max,
                       a_val=2 * x_val, b_val=2 * y_val)
        return (t0 - t1, tsum - t0 - t1)
    t01 = fp.conv(a0, b1, a_max=x_max, b_max=y_max, a_val=x_val, b_val=y_val)
    t10 = fp.conv(a1, b0, a_max=x_max, b_max=y_max, a_val=x_val, b_val=y_val)
    return (t0 - t1, t01 + t10)


def mul_by_nonresidue_wide(w: WidePair) -> WidePair:
    return (w[0] - w[1], w[0] + w[1])


def add_wide(x: WidePair, y: WidePair) -> WidePair:
    return (x[0] + y[0], x[1] + y[1])


def sub_wide(x: WidePair, y: WidePair) -> WidePair:
    return (x[0] - y[0], x[1] - y[1])


def scale_fp_wide(a: jnp.ndarray, k: jnp.ndarray, k_max: int = fp.SEMI_DIG,
                  k_val: int = fp.SEMI_VAL) -> WidePair:
    """(a0*k, a1*k) as wides, k an Fp limb vector."""
    return (fp.conv(c0(a), k, b_max=k_max, b_val=k_val),
            fp.conv(c1(a), k, b_max=k_max, b_val=k_val))


def as_wide(a: jnp.ndarray, a_max: int = fp.SEMI_DIG, a_val: int = fp.SEMI_VAL) -> WidePair:
    """Embed Fq2 limbs as a wide pair with NO domain change (see fp.as_wide)."""
    return (fp.as_wide(c0(a), a_max, a_val), fp.as_wide(c1(a), a_max, a_val))


def to_wide_mont(a: jnp.ndarray, a_max: int = fp.SEMI_DIG) -> WidePair:
    """Embed stored Fq2 Montgomery limbs into the conv-product domain."""
    return (fp.to_wide_mont(c0(a), a_max), fp.to_wide_mont(c1(a), a_max))


def scale_small_wide(w: WidePair, k: int) -> WidePair:
    return (w[0].scale_small(k), w[1].scale_small(k))


def neg_wide(w: WidePair) -> WidePair:
    zero0 = fp.Wide(jnp.zeros_like(w[0].cols), 0, 0, 0, 0)
    zero1 = fp.Wide(jnp.zeros_like(w[1].cols), 0, 0, 0, 0)
    return (zero0 - w[0], zero1 - w[1])


def sub_relaxed(a: jnp.ndarray, b: jnp.ndarray):
    """a - b as a relaxed non-negative conv operand (carry-free).

    Returns (limbs, limb_max, val_max); no carry propagation needed."""
    negc = jnp.asarray(fp._NEGC_NP)
    return a + (negc - b), fp.SEMI_DIG + (fp.SEMI_DIG + 256), fp.SEMI_VAL + fp.C.NEG_K * fp._P


def reduce(w: WidePair) -> jnp.ndarray:
    """Stacked Montgomery reduction of a wide pair -> canonical (..., 2, NLIMBS)."""
    return fp.mont_reduce_stack([w[0], w[1]])


# ---------------------------------------------------------------------------
# Canonical multiplicative ops
# ---------------------------------------------------------------------------


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return reduce(mul_wide(a, b))


def square(a: jnp.ndarray) -> jnp.ndarray:
    return reduce(square_wide(a))


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """(a0 - a1 u)/(a0^2 + a1^2); 0 -> 0 via the Fermat-inverse inv0 property
    (reference fq2_target_tree.rs:54-78, hint replaced by on-device compute)."""
    n0 = fp.conv(c0(a), c0(a))
    n1 = fp.conv(c1(a), c1(a))
    norm = fp.mont_reduce(n0 + n1)
    ninv = fp.inv(norm)
    w0 = fp.conv(c0(a), ninv)
    neg_a1, m, v = fp.neg_relaxed(c1(a))
    w1 = fp.conv(neg_a1, ninv, a_max=m, a_val=v)
    out = fp.mont_reduce_stack([w0, w1])
    fp._record("fq2_inv", a, out)
    return out


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k for a small non-negative integer k (double-and-add on canonical limbs)."""
    return fp.mul_small(a, k)


def sgn0(a: jnp.ndarray) -> jnp.ndarray:
    """RFC-9380 sign of a0 + a1*u (reference src/fields/helpers.rs:169-174)."""
    s0 = fp.sgn0(c0(a))
    z0 = fp.is_zero(c0(a))
    s1 = fp.sgn0(c1(a))
    return s0 | (z0.astype(jnp.int32) & s1)


def legendre_norm(a: jnp.ndarray) -> jnp.ndarray:
    """Legendre symbol of the norm a0^2 + a1^2 (QR test in Fq2; reference
    fq2_target.rs:256-263 is_square via norm)."""
    norm = fp.mont_reduce(fp.conv(c0(a), c0(a)) + fp.conv(c1(a), c1(a)))
    return fp.legendre(norm)


def is_square(a: jnp.ndarray) -> jnp.ndarray:
    leg = legendre_norm(a)
    return ~fp.is_equal(leg, fp.neg(fp.one_mont(leg.shape[:-1])))


def sqrt(a: jnp.ndarray) -> jnp.ndarray:
    """Square root for p = 3 mod 4 extension (valid iff square(out) == a)."""
    # a1 = a^((p-3)/4); x0 = a1*a; alpha = a1*x0
    a1p = pow_static(a, (fp._P - 3) // 4)
    x0 = mul(a1p, a)
    alpha = mul(a1p, x0)
    # if alpha == -1: out = x0 * u ; else out = x0 * (1+alpha)^((p-1)/2)
    batch = alpha.shape[:-2]
    minus_one = pack(fp.neg(fp.one_mont(batch)), fp.zeros(batch))
    is_m1 = is_equal(alpha, minus_one)
    u_times = pack(fp.neg(c1(x0)), c0(x0))  # x0 * u
    b = pow_static(add(alpha, jnp.broadcast_to(one(), alpha.shape)), (fp._P - 1) // 2)
    other = mul(b, x0)
    return select(is_m1.astype(jnp.int32), u_times, other)


def sqrt_with_sgn(a: jnp.ndarray, sgn: jnp.ndarray) -> jnp.ndarray:
    """Of the roots +-s pick the one with sgn0 == sgn (reference
    fq2_target.rs:294-311 hint-then-verify, computed directly on device)."""
    s = sqrt(a)
    want = sgn0(s) == (sgn & 1)
    out = select(want.astype(jnp.int32), s, neg(s))
    fp._record("fq2_sqrt", a, sgn, out)
    return out


def pow_static(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """MSB-first square-and-multiply by a static exponent (lax.scan)."""
    import jax
    import numpy as np

    if exponent == 0:
        return jnp.broadcast_to(one(), a.shape)
    bits = np.array(
        [(exponent >> i) & 1 for i in range(exponent.bit_length() - 1, -1, -1)],
        dtype=np.int32,
    )

    def body(acc, bit):
        sq = square(acc)
        if fp._witness_sink is not None:
            # effect-uniform branches for witness-mode recording callbacks
            return select(bit, mul(sq, a), sq), None
        return jax.lax.cond(bit != 0, lambda s: mul(s, a), lambda s: s, sq), None

    acc, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
    return acc
