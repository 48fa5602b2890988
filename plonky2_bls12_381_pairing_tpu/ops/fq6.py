"""Batched Fq6 = Fq2[v]/(v^3 - (u+1)) on limb vectors.

TPU re-design of the reference's tree-mode Fq6 gadget
(src/fields_as_trees/fq6_target_tree.rs:12-293; flat variant
src/fields/fq6_target.rs): an element is (..., 6, NLIMBS) Montgomery limbs in
flat memory order [c0.c0, c0.c1, c1.c0, c1.c1, c2.c0, c2.c1] — flat layout,
tree algorithms (SURVEY.md §7 design stance).

Products use the interpolation-style formulas of the reference
(fq6_target_tree.rs:172-214) in *wide* (unreduced-column) form: 6 Fq2 wide
products are combined with cheap column adds/subs and reduced once per output
component (one stacked Montgomery reduction for all 6 Fp components).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fp, fq2

WideTriple = tuple[fq2.WidePair, fq2.WidePair, fq2.WidePair]


def c(a: jnp.ndarray, i: int) -> jnp.ndarray:
    """i-th Fq2 component, (..., 2, NLIMBS)."""
    return a[..., 2 * i : 2 * i + 2, :]


def pack(x0: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x0, x1, x2], axis=-2)


def zero(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, 6, fp.NLIMBS), dtype=jnp.int32)


def one(batch_shape=()) -> jnp.ndarray:
    return pack(fq2.one(batch_shape), fq2.zero(batch_shape), fq2.zero(batch_shape))


def encode(x) -> jnp.ndarray:
    import numpy as np

    arr = np.asarray(x, dtype=object)
    parts = np.empty(arr.shape + (3,), dtype=object)
    for idx in np.ndindex(arr.shape):
        parts[idx + (0,)] = arr[idx].c0
        parts[idx + (1,)] = arr[idx].c1
        parts[idx + (2,)] = arr[idx].c2
    enc = fq2.encode(parts)  # (..., 3, 2, NLIMBS)
    return enc.reshape(*enc.shape[:-3], 6, fp.NLIMBS)


def decode(a):
    import numpy as np

    from ..utils import refmodel as rm

    arr = np.asarray(a)
    parts = fq2.decode(arr.reshape(*arr.shape[:-2], 3, 2, fp.NLIMBS))
    shape = parts.shape[:-1]
    out = np.empty(shape, dtype=object)
    for idx in np.ndindex(shape):
        out[idx] = rm.Fq6(parts[idx + (0,)], parts[idx + (1,)], parts[idx + (2,)])
    return out if shape else out[()]


# ---------------------------------------------------------------------------
# Linear ops
# ---------------------------------------------------------------------------


def add(a, b):
    return fp.add(a, b)


def sub(a, b):
    return fp.sub(a, b)


def neg(a):
    return fp.neg(a)


def mul_by_nonresidue(a: jnp.ndarray) -> jnp.ndarray:
    """v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2
    (reference fq6_target_tree.rs:219-230)."""
    return pack(fq2.mul_by_nonresidue(c(a, 2)), c(a, 0), c(a, 1))


def select(mask, a, b):
    return jnp.where(mask[..., None, None] != 0, a, b)


def is_zero(a):
    return jnp.all(fp.canonicalize(a) == 0, axis=(-1, -2))


def is_equal(a, b):
    return jnp.all(fp.canonicalize(a) == fp.canonicalize(b), axis=(-1, -2))


def connect(a, b):
    """Equality constraint row (reference fq6_target.rs:47-51); see
    fp.connect."""
    return fp.connect(a, b)


def conditional_mul(a, x, flag):
    """flag ? a*x : a (reference fq6_target.rs:358-366). flag: (...,) mask."""
    return select(flag, mul(a, x), a)


# ---------------------------------------------------------------------------
# Wide products (interpolation formulas, lazily reduced)
# ---------------------------------------------------------------------------


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> WideTriple:
    """s0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2)
    s1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2
    s2 = (a0+a2)(b0+b2) - t0 - t2 + t1        (fq6_target_tree.rs:172-214)."""
    a0, a1, a2 = c(a, 0), c(a, 1), c(a, 2)
    b0, b1, b2 = c(b, 0), c(b, 1), c(b, 2)
    t0 = fq2.mul_wide(a0, b0)
    t1 = fq2.mul_wide(a1, b1)
    t2 = fq2.mul_wide(a2, b2)
    m12 = _mul_wide_sum(a1, a2, b1, b2)
    m01 = _mul_wide_sum(a0, a1, b0, b1)
    m02 = _mul_wide_sum(a0, a2, b0, b2)
    s0 = fq2.add_wide(t0, fq2.mul_by_nonresidue_wide(fq2.sub_wide(fq2.sub_wide(m12, t1), t2)))
    s1 = fq2.add_wide(fq2.sub_wide(fq2.sub_wide(m01, t0), t1), fq2.mul_by_nonresidue_wide(t2))
    s2 = fq2.add_wide(fq2.sub_wide(fq2.sub_wide(m02, t0), t2), t1)
    return (s0, s1, s2)


def _mul_wide_sum(x0, x1, y0, y1) -> fq2.WidePair:
    """fq2 wide product of limb-wise sums (x0+x1)(y0+y1), 9-bit operand limbs."""
    d2, v2 = 2 * fp.SEMI_DIG, 2 * fp.SEMI_VAL
    return fq2.mul_wide_generic(x0 + x1, y0 + y1, x_max=d2, x_val=v2,
                                y_max=d2, y_val=v2)


def square_wide(a: jnp.ndarray) -> WideTriple:
    return mul_wide(a, a)


def mul_by_01_wide(a: jnp.ndarray, b0: jnp.ndarray, b1: jnp.ndarray) -> WideTriple:
    """Sparse product with (b0 + b1 v) (reference fq6_target_tree.rs:232-259):
    s0 = xi*((a1+a2)*b1 - t1) + t0
    s1 = (b0+b1)(a0+a1) - t0 - t1
    s2 = a2*b0 + t1."""
    a0, a1, a2 = c(a, 0), c(a, 1), c(a, 2)
    t0 = fq2.mul_wide(a0, b0)
    t1 = fq2.mul_wide(a1, b1)
    m12 = _mul_wide_half(a1 + a2, b1)
    m01 = _mul_wide_half(a0 + a1, b0 + b1)
    t2 = fq2.mul_wide(a2, b0)
    s0 = fq2.add_wide(fq2.mul_by_nonresidue_wide(fq2.sub_wide(m12, t1)), t0)
    s1 = fq2.sub_wide(fq2.sub_wide(m01, t0), t1)
    s2 = fq2.add_wide(t2, t1)
    return (s0, s1, s2)


def _mul_wide_half(xs: jnp.ndarray, ys: jnp.ndarray) -> fq2.WidePair:
    """fq2 wide product where either operand may have limbs <= 510."""
    d2, v2 = 2 * fp.SEMI_DIG, 2 * fp.SEMI_VAL
    return fq2.mul_wide_generic(xs, ys, x_max=d2, x_val=v2,
                                y_max=d2, y_val=v2)


def mul_by_1_wide(a: jnp.ndarray, b1: jnp.ndarray) -> WideTriple:
    """Sparse product with (b1 v) (reference fq6_target_tree.rs:261-268):
    (xi*(a2*b1), a0*b1, a1*b1)."""
    s0 = fq2.mul_by_nonresidue_wide(fq2.mul_wide(c(a, 2), b1))
    s1 = fq2.mul_wide(c(a, 0), b1)
    s2 = fq2.mul_wide(c(a, 1), b1)
    return (s0, s1, s2)


def mul_by_nonresidue_wide(t: WideTriple) -> WideTriple:
    return (fq2.mul_by_nonresidue_wide(t[2]), t[0], t[1])


def add_wide(x: WideTriple, y: WideTriple) -> WideTriple:
    return tuple(fq2.add_wide(a, b) for a, b in zip(x, y))


def sub_wide(x: WideTriple, y: WideTriple) -> WideTriple:
    return tuple(fq2.sub_wide(a, b) for a, b in zip(x, y))


def reduce(t: WideTriple) -> jnp.ndarray:
    """One stacked Montgomery reduction for all 6 Fp components."""
    return fp.mont_reduce_stack([t[0][0], t[0][1], t[1][0], t[1][1], t[2][0], t[2][1]])


# ---------------------------------------------------------------------------
# Canonical multiplicative ops
# ---------------------------------------------------------------------------


def mul(a, b):
    return reduce(mul_wide(a, b))


def square(a):
    return reduce(square_wide(a))


def mul_by_01(a, b0, b1):
    return reduce(mul_by_01_wide(a, b0, b1))


def mul_by_1(a, b1):
    return reduce(mul_by_1_wide(a, b1))


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate/norm inverse (reference fq6_target_tree.rs:59-89):
    t0 = a0^2 - xi a1 a2; t1 = xi a2^2 - a0 a1; t2 = a1^2 - a0 a2
    norm = a0 t0 + xi (a2 t1 + a1 t2);  out = (t0, t1, t2) * norm^-1."""
    a0, a1, a2 = c(a, 0), c(a, 1), c(a, 2)
    t0 = fq2.reduce(fq2.sub_wide(fq2.square_wide(a0),
                                 fq2.mul_by_nonresidue_wide(fq2.mul_wide(a1, a2))))
    t1 = fq2.reduce(fq2.sub_wide(fq2.mul_by_nonresidue_wide(fq2.square_wide(a2)),
                                 fq2.mul_wide(a0, a1)))
    t2 = fq2.reduce(fq2.sub_wide(fq2.square_wide(a1), fq2.mul_wide(a0, a2)))
    norm_w = fq2.add_wide(
        fq2.mul_wide(a0, t0),
        fq2.mul_by_nonresidue_wide(
            fq2.add_wide(fq2.mul_wide(a2, t1), fq2.mul_wide(a1, t2))
        ),
    )
    norm = fq2.reduce(norm_w)
    ninv = fq2.inv(norm)
    out = pack(fq2.mul(t0, ninv), fq2.mul(t1, ninv), fq2.mul(t2, ninv))
    fp._record("fq6_inv", a, out)
    return out


def frobenius_map(a: jnp.ndarray) -> jnp.ndarray:
    """c0^p + gamma6_1 c1^p v + gamma6_2 c2^p v^2 with the generated constants
    (reference fq6_target_tree.rs:129-169)."""
    from .. import constants as C

    g1 = jnp.asarray(C.FROB_GAMMA6_1_MONT)
    g2 = jnp.asarray(C.FROB_GAMMA6_2_MONT)
    f0 = fq2.conjugate(c(a, 0))
    f1 = fq2.mul(fq2.conjugate(c(a, 1)), jnp.broadcast_to(g1, c(a, 1).shape))
    f2 = fq2.mul(fq2.conjugate(c(a, 2)), jnp.broadcast_to(g2, c(a, 2).shape))
    return pack(f0, f1, f2)
