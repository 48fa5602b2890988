"""Batched G1/G2 point types on limb vectors.

TPU re-design of the reference's curve layer (src/fields_as_trees/g1_curve.rs,
g2_curve.rs; flat variants src/curves/): points are pytree dataclasses of limb
tensors with an explicit infinity mask lane, batched over leading axes. The
reference's orphan-builder constructors (SURVEY.md defect #6) have no analogue
here — tracing is ambient.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import fp, fq2
from ..utils import refmodel as rm


@jax.tree_util.register_pytree_node_class
@dataclass
class G1Affine:
    """x, y: (..., NLIMBS) Montgomery limbs; infinity: (...,) int32 mask."""

    x: jnp.ndarray
    y: jnp.ndarray
    infinity: jnp.ndarray

    def tree_flatten(self):
        return (self.x, self.y, self.infinity), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @staticmethod
    def identity(batch_shape=()) -> "G1Affine":
        return G1Affine(
            fp.zeros(batch_shape),
            fp.one_mont(batch_shape),
            jnp.ones(batch_shape, dtype=jnp.int32),
        )

    @staticmethod
    def generator(batch_shape=()) -> "G1Affine":
        g = rm.G1Affine.generator()
        x = jnp.broadcast_to(jnp.asarray(fp.encode(g.x)), (*batch_shape, fp.NLIMBS))
        y = jnp.broadcast_to(jnp.asarray(fp.encode(g.y)), (*batch_shape, fp.NLIMBS))
        return G1Affine(x, y, jnp.zeros(batch_shape, dtype=jnp.int32))

    @staticmethod
    def encode(points) -> "G1Affine":
        """refmodel.G1Affine (or nested lists) -> batched G1Affine."""
        arr = np.asarray(points, dtype=object)
        xs = np.empty(arr.shape, dtype=object)
        ys = np.empty(arr.shape, dtype=object)
        inf = np.zeros(arr.shape, dtype=np.int32)
        for idx in np.ndindex(arr.shape):
            p = arr[idx]
            xs[idx], ys[idx], inf[idx] = p.x, p.y, int(p.infinity)
        return G1Affine(fp.encode(xs), fp.encode(ys), jnp.asarray(inf))

    def decode(self):
        xs = fp.decode(self.x)
        ys = fp.decode(self.y)
        inf = np.asarray(self.infinity)
        shape = inf.shape
        out = np.empty(shape, dtype=object)
        for idx in np.ndindex(shape):
            out[idx] = rm.G1Affine(int(xs[idx]), int(ys[idx]), bool(inf[idx]))
        return out if shape else out[()]

    def is_on_curve(self) -> jnp.ndarray:
        """y^2 == x^3 + 4 (or infinity)."""
        y2 = fp.mont_square(self.y)
        x3 = fp.mont_mul(fp.mont_square(self.x), self.x)
        b = fp.encode(rm.B_G1)
        rhs = fp.add(x3, jnp.broadcast_to(jnp.asarray(b), x3.shape))
        return fp.is_equal(y2, rhs) | (self.infinity != 0)

    def neg(self) -> "G1Affine":
        return G1Affine(self.x, fp.neg(self.y), self.infinity)

    def conditional_select(self, mask, other: "G1Affine") -> "G1Affine":
        """self where mask else other (reference g2_curve.rs conditional_select)."""
        return G1Affine(
            fp.select(mask, self.x, other.x),
            fp.select(mask, self.y, other.y),
            jnp.where(mask != 0, self.infinity, other.infinity),
        )

    def is_point_equal_to(self, other: "G1Affine") -> jnp.ndarray:
        """Predicate incl. infinity handling (reference g1_curve.rs:79-96)."""
        both_inf = (self.infinity != 0) & (other.infinity != 0)
        coords = fp.is_equal(self.x, other.x) & fp.is_equal(self.y, other.y)
        neither = (self.infinity == 0) & (other.infinity == 0)
        return both_inf | (neither & coords)


@jax.tree_util.register_pytree_node_class
@dataclass
class G2Affine:
    """x, y: (..., 2, NLIMBS) Fq2 limbs; infinity: (...,) int32 mask."""

    x: jnp.ndarray
    y: jnp.ndarray
    infinity: jnp.ndarray

    def tree_flatten(self):
        return (self.x, self.y, self.infinity), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @staticmethod
    def identity(batch_shape=()) -> "G2Affine":
        return G2Affine(
            fq2.zero(batch_shape),
            fq2.one(batch_shape),
            jnp.ones(batch_shape, dtype=jnp.int32),
        )

    @staticmethod
    def generator(batch_shape=()) -> "G2Affine":
        g = rm.G2Affine.generator()
        x = jnp.broadcast_to(jnp.asarray(fq2.encode(g.x)), (*batch_shape, 2, fp.NLIMBS))
        y = jnp.broadcast_to(jnp.asarray(fq2.encode(g.y)), (*batch_shape, 2, fp.NLIMBS))
        return G2Affine(x, y, jnp.zeros(batch_shape, dtype=jnp.int32))

    @staticmethod
    def encode(points) -> "G2Affine":
        arr = np.asarray(points, dtype=object)
        xs = np.empty(arr.shape, dtype=object)
        ys = np.empty(arr.shape, dtype=object)
        inf = np.zeros(arr.shape, dtype=np.int32)
        for idx in np.ndindex(arr.shape):
            p = arr[idx]
            xs[idx], ys[idx], inf[idx] = p.x, p.y, int(p.infinity)
        return G2Affine(fq2.encode(xs), fq2.encode(ys), jnp.asarray(inf))

    def decode(self):
        xs = fq2.decode(self.x)
        ys = fq2.decode(self.y)
        inf = np.asarray(self.infinity)
        shape = inf.shape
        out = np.empty(shape, dtype=object)
        for idx in np.ndindex(shape):
            out[idx] = rm.G2Affine(xs[idx], ys[idx], bool(inf[idx]))
        return out if shape else out[()]

    def is_on_curve(self) -> jnp.ndarray:
        y2 = fq2.square(self.y)
        x3 = fq2.mul(fq2.square(self.x), self.x)
        b = fq2.encode(rm.Fq2(*rm.B_G2))
        rhs = fq2.add(x3, jnp.broadcast_to(jnp.asarray(b), x3.shape))
        return fq2.is_equal(y2, rhs) | (self.infinity != 0)

    def neg(self) -> "G2Affine":
        return G2Affine(self.x, fq2.neg(self.y), self.infinity)

    def conditional_select(self, mask, other: "G2Affine") -> "G2Affine":
        return G2Affine(
            fq2.select(mask, self.x, other.x),
            fq2.select(mask, self.y, other.y),
            jnp.where(mask != 0, self.infinity, other.infinity),
        )

    def is_point_equal_to(self, other: "G2Affine") -> jnp.ndarray:
        both_inf = (self.infinity != 0) & (other.infinity != 0)
        coords = fq2.is_equal(self.x, other.x) & fq2.is_equal(self.y, other.y)
        neither = (self.infinity == 0) & (other.infinity == 0)
        return both_inf | (neither & coords)


@jax.tree_util.register_pytree_node_class
@dataclass
class G2Projective:
    """Jacobian (x/z^2, y/z^3): x, y, z are (..., 2, NLIMBS) Fq2 limbs
    (reference fields_as_trees/g2_curve.rs:26-48)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def tree_flatten(self):
        return (self.x, self.y, self.z), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @staticmethod
    def from_affine(q: G2Affine) -> "G2Projective":
        z = fq2.select(q.infinity, fq2.zero(q.infinity.shape), fq2.one(q.infinity.shape))
        return G2Projective(q.x, q.y, z)

    @staticmethod
    def identity(batch_shape=()) -> "G2Projective":
        """The point at infinity: (0, 1, 0)
        (reference fields_as_trees/g2_curve.rs:149-156)."""
        return G2Projective(fq2.zero(batch_shape), fq2.one(batch_shape),
                            fq2.zero(batch_shape))

    @staticmethod
    def generator(batch_shape=()) -> "G2Projective":
        """The subgroup generator with z = 1
        (reference fields_as_trees/g2_curve.rs:158-166)."""
        return G2Projective.from_affine(G2Affine.generator(batch_shape))

    @staticmethod
    def conditional_select(a: "G2Projective", b: "G2Projective",
                           flag: jnp.ndarray) -> "G2Projective":
        """flag != 0 selects a, else b, per batch element
        (reference fields_as_trees/g2_curve.rs:119-127)."""
        return G2Projective(fq2.select(flag, a.x, b.x),
                            fq2.select(flag, a.y, b.y),
                            fq2.select(flag, a.z, b.z))
