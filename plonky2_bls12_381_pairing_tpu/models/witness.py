"""Witness-trace mode: batched constraint rows + hint-then-verify kernels.

Parity with the reference's in-circuit purpose (SURVEY.md §7 step 7): the
plonky2 circuits consume per-operation rows — (input limbs, output limbs, hint
values) — where nondeterministic ops (inverse, sqrt) are produced off-circuit
by SimpleGenerator hints and *verified* in-circuit
(src/fields/fq_target.rs:316-355 FqSqrtGenerator,
src/fields/fq2_target.rs:314-422 Fq2Inverse/SqrtGenerator,
src/fields/fq12_target.rs:334-386 Fq12InverseGenerator).

TPU re-design: hints are computed by the same batched on-device kernels as the
forward path, and verification is a batched `check_*` kernel that recomputes
the defining constraint and counts mismatched limbs (the SURVEY.md §5
bit-exactness counter; zero is the gate). Traces are recorded eagerly —
`trace(fn, *args)` runs fn un-jitted with a recording sink installed — and
checked with one jitted pass over all stacked rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fp, fq2


@dataclass
class WitnessTrace:
    """Stacked constraint rows by op kind. Row tensors keep their original
    batch shapes; `rows[op]` is a list of tuples of limb tensors."""

    rows: dict = field(default_factory=dict)

    def add(self, op: str, tensors):
        self.rows.setdefault(op, []).append(tensors)

    def counts(self):
        return {op: len(v) for op, v in self.rows.items()}


def trace(fn, *args):
    """Run fn eagerly with witness recording; returns (output, WitnessTrace)."""
    sink: list = []
    fp._witness_sink = sink
    try:
        out = fn(*args)
    finally:
        fp._witness_sink = None
    tr = WitnessTrace()
    for op, tensors in sink:
        tr.add(op, tensors)
    return out, tr


# ---------------------------------------------------------------------------
# Hint kernels (the SimpleGenerator equivalents, computed on device)
# ---------------------------------------------------------------------------


def inverse_hint(x: jnp.ndarray) -> jnp.ndarray:
    """Fp inverse hint (0 -> 0), as FqTarget's inv gadget expects."""
    return fp.inv(x)


def sqrt_hint(x: jnp.ndarray, sgn: jnp.ndarray) -> jnp.ndarray:
    """Fp sqrt-with-sign hint (reference FqSqrtGenerator, fq_target.rs:316-355)."""
    return fp.sqrt_with_sgn(x, sgn)


def fq2_inverse_hint(x: jnp.ndarray) -> jnp.ndarray:
    """(reference Fq2InverseGenerator, fq2_target.rs:314-364)."""
    return fq2.inv(x)


def fq2_sqrt_hint(x: jnp.ndarray, sgn: jnp.ndarray) -> jnp.ndarray:
    """(reference Fq2SqrtGenerator, fq2_target.rs:366-422)."""
    return fq2.sqrt_with_sgn(x, sgn)


# ---------------------------------------------------------------------------
# Constraint-check kernels: recompute residuals, count mismatched limbs
# ---------------------------------------------------------------------------


def _mismatch_count(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((a != b).astype(jnp.int32))


@jax.jit
def check_mul_rows(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Verify c == a*b for stacked rows; returns mismatched-limb count (0 = ok)."""
    return _mismatch_count(fp.mont_mul(a, b), c)


@jax.jit
def check_inverse_rows(x: jnp.ndarray, xinv: jnp.ndarray) -> jnp.ndarray:
    """Verify x * xinv == 1 (or x == 0 and xinv == 0): the constraint the
    circuit applies to the hint (fq2_target.rs:194-204 pattern)."""
    prod = fp.mont_mul(x, xinv)
    one = jnp.broadcast_to(fp.one_mont(), prod.shape)
    ok_nonzero = jnp.all(prod == one, axis=-1)
    zero_in = fp.is_zero(x)
    zero_out = fp.is_zero(xinv)
    ok = jnp.where(zero_in, zero_out, ok_nonzero)
    return jnp.sum((~ok).astype(jnp.int32))


@jax.jit
def check_sqrt_rows(x: jnp.ndarray, sgn: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Verify s^2 == x and sgn0(s) == sgn (fq_target.rs:223-240 constraints)."""
    sq_ok = jnp.all(fp.mont_square(s) == x, axis=-1)
    sgn_ok = fp.sgn0(s) == (sgn & 1)
    return jnp.sum((~(sq_ok & sgn_ok)).astype(jnp.int32))


def check_trace(tr: WitnessTrace) -> dict:
    """Verify every recorded row; returns {op: mismatched_limb_count}.

    All-zero is the constraint-satisfaction gate — the batched analogue of
    'data.prove(pw) succeeds' in the reference's tests (SURVEY.md §4)."""
    out = {}
    if "mul" in tr.rows:
        a = jnp.concatenate([r[0].reshape(-1, fp.NLIMBS) for r in tr.rows["mul"]])
        b = jnp.concatenate([r[1].reshape(-1, fp.NLIMBS) for r in tr.rows["mul"]])
        c = jnp.concatenate([r[2].reshape(-1, fp.NLIMBS) for r in tr.rows["mul"]])
        out["mul"] = int(check_mul_rows(a, b, c))
    if "inv" in tr.rows:
        x = jnp.concatenate([r[0].reshape(-1, fp.NLIMBS) for r in tr.rows["inv"]])
        xi = jnp.concatenate([r[1].reshape(-1, fp.NLIMBS) for r in tr.rows["inv"]])
        out["inv"] = int(check_inverse_rows(x, xi))
    return out
