"""Batched Fq12 = Fq6[w]/(w^2 - v) on limb vectors.

TPU re-design of the reference's tree-mode Fq12 gadget
(src/fields_as_trees/fq12_target_tree.rs:12-204; flat variant
src/fields/fq12_target.rs): an element is (..., 12, NLIMBS) Montgomery limbs in
flat tower order [c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1] — the flat
memory layout of the reference's MyFq12 (src/fields/helpers.rs:39-41) with the
tree algorithms of fields_as_trees (SURVEY.md §7 design stance).

All products are Karatsuba-over-Fq6 in wide (unreduced-column) form with one
stacked Montgomery reduction for all 12 Fp output components.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fp, fq2, fq6


def c0(a: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0:6, :]


def c1(a: jnp.ndarray) -> jnp.ndarray:
    return a[..., 6:12, :]


def pack(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x0, x1], axis=-2)


def zero(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, 12, fp.NLIMBS), dtype=jnp.int32)


def one(batch_shape=()) -> jnp.ndarray:
    return pack(fq6.one(batch_shape), fq6.zero(batch_shape))


def encode(x) -> jnp.ndarray:
    import numpy as np

    arr = np.asarray(x, dtype=object)
    ints = np.empty(arr.shape + (12,), dtype=object)
    for idx in np.ndindex(arr.shape):
        for j, v in enumerate(arr[idx].coeffs()):
            ints[idx + (j,)] = v
    return fp.encode(ints)


def decode(a):
    import numpy as np

    from ..utils import refmodel as rm

    ints = fp.decode(a)
    shape = ints.shape[:-1]
    out = np.empty(shape, dtype=object)
    for idx in np.ndindex(shape):
        out[idx] = rm.Fq12.from_coeffs([int(ints[idx + (j,)]) for j in range(12)])
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


def conjugate(a: jnp.ndarray) -> jnp.ndarray:
    """f^(p^6): negate the w-part (reference fq12_target_tree.rs:53-58)."""
    return pack(c0(a), fp.neg(c1(a)))


def select(mask, a, b):
    return jnp.where(mask[..., None, None] != 0, a, b)


def is_zero(a):
    return jnp.all(fp.canonicalize(a) == 0, axis=(-1, -2))


def is_equal(a, b):
    return jnp.all(fp.canonicalize(a) == fp.canonicalize(b), axis=(-1, -2))


def connect(a, b):
    """Equality constraint row (reference fq12_target.rs:50-54); see
    fp.connect."""
    return fp.connect(a, b)


def div(a, b):
    """a / b = a * b^-1 (reference fq12_target.rs:295-299; inv0 for b == 0)."""
    return mul(a, inv(b))


def conditional_mul(a, x, flag):
    """flag ? a*x : a (reference fq12_target.rs:323-331). flag: (...,) mask."""
    return select(flag, mul(a, x), a)


def is_one(a):
    return is_equal(a, jnp.broadcast_to(one(), a.shape))


# ---------------------------------------------------------------------------
# Products
# ---------------------------------------------------------------------------


def _reduce12(w0: fq6.WideTriple, w1: fq6.WideTriple) -> jnp.ndarray:
    wides = [p for tri in (w0, w1) for pair in tri for p in pair]
    return fp.mont_reduce_stack(wides)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Karatsuba over Fq6 with w^2 = v (reference fq12_target_tree.rs:130-141)."""
    if fp._use_fused():
        from .pallas import tower as _tw

        return _tw.fq12_mul(a, b, interpret=fp._fused_interpret())
    a0, a1, b0, b1 = c0(a), c1(a), c0(b), c1(b)
    t0 = fq6.mul_wide(a0, b0)
    t1 = fq6.mul_wide(a1, b1)
    t01 = fq6.mul_wide(fp.add(a0, a1), fp.add(b0, b1))
    out0 = fq6.add_wide(t0, fq6.mul_by_nonresidue_wide(t1))
    out1 = fq6.sub_wide(fq6.sub_wide(t01, t0), t1)
    return _reduce12(out0, out1)


def square(a: jnp.ndarray) -> jnp.ndarray:
    """Complex squaring (reference fq12_target_tree.rs:143-155):
    c0 = (a0+a1)(a0 + v a1) - ab - v ab;  c1 = 2 ab."""
    if fp._use_fused():
        from .pallas import tower as _tw

        return _tw.fq12_square(a, interpret=fp._fused_interpret())
    a0, a1 = c0(a), c1(a)
    ab = fq6.mul_wide(a0, a1)
    s = fp.add(a0, a1)
    t = fp.add(a0, fq6.mul_by_nonresidue(a1))
    st = fq6.mul_wide(s, t)
    out0 = fq6.sub_wide(fq6.sub_wide(st, ab), fq6.mul_by_nonresidue_wide(ab))
    out1 = fq6.add_wide(ab, ab)
    return _reduce12(out0, out1)


def mul_by_014(a: jnp.ndarray, d0: jnp.ndarray, d1: jnp.ndarray,
               d4: jnp.ndarray) -> jnp.ndarray:
    """Sparse product with (d0 + d1 v) + (d4 v) w (reference
    fq12_target_tree.rs:157-176):
    aa = a0.mul_by_01(d0, d1); bb = a1.mul_by_1(d4)
    out0 = v*bb + aa;  out1 = (a0+a1).mul_by_01(d0, d1+d4) - aa - bb."""
    if fp._use_fused():
        from .pallas import tower as _tw

        d = jnp.concatenate(
            [jnp.broadcast_to(x, a[..., :2, :].shape) for x in (d0, d1, d4)],
            axis=-2,
        )
        return _tw.fq12_mul_by_014(a, d, interpret=fp._fused_interpret())
    a0, a1 = c0(a), c1(a)
    aa = fq6.mul_by_01_wide(a0, d0, d1)
    bb = fq6.mul_by_1_wide(a1, d4)
    d14 = fq2.add(d1, d4)
    t1 = fq6.mul_by_01_wide(fp.add(a0, a1), d0, d14)
    out0 = fq6.add_wide(fq6.mul_by_nonresidue_wide(bb), aa)
    out1 = fq6.sub_wide(fq6.sub_wide(t1, aa), bb)
    return _reduce12(out0, out1)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """(c0 - c1 w)/(c0^2 - v c1^2) (reference fq12_target_tree.rs:77-90)."""
    a0, a1 = c0(a), c1(a)
    t = fq6.reduce(
        fq6.sub_wide(fq6.square_wide(a0),
                     fq6.mul_by_nonresidue_wide(fq6.square_wide(a1)))
    )
    tinv = fq6.inv(t)
    out0 = fq6.mul(a0, tinv)
    out1 = fq6.neg(fq6.mul(a1, tinv))
    out = pack(out0, out1)
    fp._record("fq12_inv", a, out)
    return out


def _fp4_square_wide(a: jnp.ndarray, b: jnp.ndarray):
    """Squaring in Fq4 = Fq2[w]/(w^2 - xi), wide outputs
    (reference miller_loop.rs:29-44)."""
    t0 = fq2.square_wide(a)
    t1 = fq2.square_wide(b)
    t2 = fq2.sub_wide(
        fq2.sub_wide(
            fq2.mul_wide_generic(a + b, a + b, x_max=2 * fp.SEMI_DIG,
                                 x_val=2 * fp.SEMI_VAL,
                                 y_max=2 * fp.SEMI_DIG, y_val=2 * fp.SEMI_VAL),
            t0,
        ),
        t1,
    )
    c0 = fq2.add_wide(fq2.mul_by_nonresidue_wide(t1), t0)
    return c0, t2


def cyclotomic_square(a: jnp.ndarray) -> jnp.ndarray:
    """Granger-Scott squaring, valid in the cyclotomic subgroup
    (reference miller_loop.rs:46-104). Three Fq4 squares + one stacked reduce."""
    if fp._use_fused():
        from .pallas import tower as _tw

        return _tw.fq12_cyclotomic_square(a, interpret=fp._fused_interpret())
    z0 = a[..., 0:2, :]
    z4 = a[..., 2:4, :]
    z3 = a[..., 4:6, :]
    z2 = a[..., 6:8, :]
    z1 = a[..., 8:10, :]
    z5 = a[..., 10:12, :]

    t0, t1 = _fp4_square_wide(z0, z1)
    nz0 = fq2.sub_wide(fq2.scale_small_wide(t0, 3), fq2.scale_small_wide(fq2.to_wide_mont(z0), 2))
    nz1 = fq2.add_wide(fq2.scale_small_wide(t1, 3), fq2.scale_small_wide(fq2.to_wide_mont(z1), 2))

    t0, t1 = _fp4_square_wide(z2, z3)
    t2, t3 = _fp4_square_wide(z4, z5)

    nz4 = fq2.sub_wide(fq2.scale_small_wide(t0, 3), fq2.scale_small_wide(fq2.to_wide_mont(z4), 2))
    nz5 = fq2.add_wide(fq2.scale_small_wide(t1, 3), fq2.scale_small_wide(fq2.to_wide_mont(z5), 2))
    t3xi = fq2.mul_by_nonresidue_wide(t3)
    nz2 = fq2.add_wide(fq2.scale_small_wide(t3xi, 3), fq2.scale_small_wide(fq2.to_wide_mont(z2), 2))
    nz3 = fq2.sub_wide(fq2.scale_small_wide(t2, 3), fq2.scale_small_wide(fq2.to_wide_mont(z3), 2))

    out = fp.mont_reduce_stack(
        [nz0[0], nz0[1], nz4[0], nz4[1], nz3[0], nz3[1],
         nz2[0], nz2[1], nz1[0], nz1[1], nz5[0], nz5[1]]
    )
    return out


def frobenius_map(a: jnp.ndarray) -> jnp.ndarray:
    """frob6(c0) + gamma12 * frob6(c1) w with the generated constant
    (reference fq12_target_tree.rs:92-128)."""
    from .. import constants as C

    f0 = fq6.frobenius_map(c0(a))
    f1 = fq6.frobenius_map(c1(a))
    g = jnp.asarray(C.FROB_GAMMA12_MONT)
    parts = []
    for i in range(3):
        comp = fq6.c(f1, i)
        parts.append(fq2.mul(comp, jnp.broadcast_to(g, comp.shape)))
    return pack(f0, fq6.pack(*parts))


def frobenius_pow(a: jnp.ndarray, n: int) -> jnp.ndarray:
    for _ in range(n):
        a = frobenius_map(a)
    return a


def pow_static(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
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
        return jax.lax.cond(bit != 0, lambda s: mul(s, a), lambda s: s, sq), None

    acc, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
    return acc
