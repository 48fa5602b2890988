"""Witness-trace mode: batched constraint rows + hint-then-verify kernels.

Parity with the reference's in-circuit purpose (SURVEY.md §7 step 7): the
plonky2 circuits consume per-operation rows — (input limbs, output limbs, hint
values) — where nondeterministic ops (inverse, sqrt) are produced off-circuit
by SimpleGenerator hints and *verified* in-circuit. All five hint kinds of the
reference are recorded and checked:

  op kind      reference generator
  ---------    -------------------------------------------------------
  sqrt         FqSqrtGenerator        (src/fields/fq_target.rs:316-355)
  fq2_inv      Fq2InverseGenerator    (src/fields/fq2_target.rs:314-364)
  fq2_sqrt     Fq2SqrtGenerator       (src/fields/fq2_target.rs:366-422)
  fq6_inv      Fq6InverseGenerator    (src/fields/fq6_target.rs:378-430)
  fq12_inv     Fq12InverseGenerator   (src/fields/fq12_target.rs:334-386)

plus the deterministic `mul` and Fermat-`inv` rows of the Fp layer.

TPU re-design: hints are computed by the same batched on-device kernels as the
forward path; verification is a batched `check_*` kernel that recomputes the
*defining constraint* (x*x^-1 = 1, s^2 = x and sgn0(s) = sgn — the exact
relations the circuits constrain) and counts violating rows. Zero is the gate
— the batched analogue of `data.prove(pw)` succeeding.

Traces are recorded via a sink installed in ops.fp: eagerly for un-jitted
runs, and through `jax.experimental.io_callback` when the traced function is
jitted (`trace(fn, *args, jit=True)`), so the *real compiled pipeline* can be
traced. Row export in the reference's 12xu32-limb layout
(src/fields/fq_target.rs:288-314 to_vec/from_vec/set_witness) is provided by
`to_u32_limbs`/`from_u32_limbs`/`export_rows_u32`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fp, fq2, fq6, fq12


@dataclass
class WitnessTrace:
    """Stacked constraint rows by op kind. Row tensors keep their original
    batch shapes; `rows[op]` is a list of tuples of limb tensors."""

    rows: dict = field(default_factory=dict)

    def add(self, op: str, tensors):
        self.rows.setdefault(op, []).append(tensors)

    def counts(self):
        return {op: len(v) for op, v in self.rows.items()}


def trace(fn, *args, jit: bool = False, strict: bool = True):
    """Run fn with witness recording; returns (output, WitnessTrace).

    jit=False: fn runs eagerly; rows are the live device arrays.
    jit=True: fn is freshly jit-wrapped (a new wrapper each call, so recording
    callbacks are always embedded) and rows arrive through ordered
    io_callbacks — the compiled pipeline itself is traced.

    Records BOTH arithmetic tiers: the limb tier's mul/inv/sqrt hint rows
    (ops/fp.py) and the RNS production tier's stored-element mul/inv rows
    (ops/rns/fp.py, kinds "rns_mul"/"rns_inv") land in one shared sink, in
    execution order.

    Strategy interaction: fused Pallas kernels compute whole ops in-kernel
    and never reach the recording hooks, so a trace taken under a fused
    strategy would silently miss rows. Mirroring the reference — whose
    SimpleGenerators fire regardless of prover backend
    (src/fields/fq_target.rs:316-355) — trace() forces the recording-capable
    strategies (limb "auto", RNS unfused) for its duration and restores the
    caller's configuration afterwards.

    strict=True raises if fn recorded NOTHING — an empty trace almost always
    means the traced function performs no Fp-level mul/inv at all (or runs a
    path without hooks), and a vacuously clean check_trace would be
    misleading.
    """
    from ..ops.rns import fp as rfp

    sink: list = []
    prev_strategy = fp._STRATEGY
    prev_fused, prev_fused_tower = rfp._FUSED, rfp._FUSED_TOWER
    if prev_strategy == "fused":
        fp.set_strategy("auto")
    rfp.set_fused(False)
    fp._witness_sink = sink
    rfp._witness_sink = sink
    try:
        if jit:
            out = jax.jit(lambda *a: fn(*a))(*args)
            jax.block_until_ready(out)
        else:
            out = fn(*args)
    finally:
        fp._witness_sink = None
        rfp._witness_sink = None
        fp.set_strategy(prev_strategy)
        rfp.set_fused(prev_fused, prev_fused_tower)
    tr = WitnessTrace()
    for op, tensors in sink:
        tr.add(op, tensors)
    if strict and not tr.rows:
        raise RuntimeError(
            "witness trace recorded no rows: the traced function performs no "
            "recordable Fp mul/inv (pass strict=False if that is expected)")
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


def fq6_inverse_hint(x: jnp.ndarray) -> jnp.ndarray:
    """(reference Fq6InverseGenerator, fq6_target.rs:378-430)."""
    return fq6.inv(x)


def fq12_inverse_hint(x: jnp.ndarray) -> jnp.ndarray:
    """(reference Fq12InverseGenerator, fq12_target.rs:334-386)."""
    return fq12.inv(x)


# ---------------------------------------------------------------------------
# Constraint-check kernels: recompute the defining relation, count bad rows
# ---------------------------------------------------------------------------


def _canon_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Value-level equality of (possibly weakly-reduced) tower elements:
    all Fp components canonically equal. Reduces every trailing (K, L) or (L,)
    to the row's batch shape."""
    ca = fp.canonicalize(a)
    cb = fp.canonicalize(jnp.broadcast_to(b, a.shape))
    eq = ca == cb
    while eq.ndim > 1:
        eq = jnp.all(eq, axis=-1)
    return eq


def _is_zero_elem(x: jnp.ndarray) -> jnp.ndarray:
    return _canon_eq(x, jnp.zeros_like(x))


@jax.jit
def check_mul_rows(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Verify c == a*b for stacked rows; returns violating-row count (0 = ok)."""
    return jnp.sum((~_canon_eq(fp.mont_mul(a, b), c)).astype(jnp.int32))


def _check_inv(x, xinv, mul_fn, one_elem) -> jnp.ndarray:
    """x * xinv == 1, or x == 0 and xinv == 0 (the reference's inv0 constraint
    pattern, fq2_target.rs:194-225): the exact relation the circuit applies to
    the inverse hint at every tower level."""
    prod = mul_fn(x, xinv)
    ok = jnp.where(_is_zero_elem(x), _is_zero_elem(xinv), _canon_eq(prod, one_elem))
    return jnp.sum((~ok).astype(jnp.int32))


@jax.jit
def check_inverse_rows(x: jnp.ndarray, xinv: jnp.ndarray) -> jnp.ndarray:
    return _check_inv(x, xinv, fp.mont_mul, fp.one_mont())


@jax.jit
def check_fq2_inverse_rows(x: jnp.ndarray, xinv: jnp.ndarray) -> jnp.ndarray:
    return _check_inv(x, xinv, fq2.mul, fq2.one())


@jax.jit
def check_fq6_inverse_rows(x: jnp.ndarray, xinv: jnp.ndarray) -> jnp.ndarray:
    return _check_inv(x, xinv, fq6.mul, fq6.one())


@jax.jit
def check_fq12_inverse_rows(x: jnp.ndarray, xinv: jnp.ndarray) -> jnp.ndarray:
    return _check_inv(x, xinv, fq12.mul, fq12.one())


@jax.jit
def check_sqrt_rows(x: jnp.ndarray, sgn: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Verify s^2 == x and sgn0(s) == sgn (fq_target.rs:223-240 constraints)."""
    sq_ok = _canon_eq(fp.mont_square(s), x)
    sgn_ok = fp.sgn0(s) == (sgn & 1)
    return jnp.sum((~(sq_ok & sgn_ok)).astype(jnp.int32))


@jax.jit
def check_fq2_sqrt_rows(x: jnp.ndarray, sgn: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Verify s^2 == x and sgn0(s) == sgn (fq2_target.rs:294-311 constraints)."""
    sq_ok = _canon_eq(fq2.square(s), x)
    sgn_ok = fq2.sgn0(s) == (sgn & 1)
    return jnp.sum((~(sq_ok & sgn_ok)).astype(jnp.int32))


# -- RNS production-tier checkers (ops/rns/fp.py rows; packed lane layout) --


def _rns():
    from ..ops.rns import fp as rfp

    return rfp


@jax.jit
def check_rns_mul_rows(a, b, c) -> jnp.ndarray:
    """Verify c == a*b over stacked PACKED rows (each row = 2 elements)."""
    rfp = _rns()
    ok = rfp.is_equal(rfp.mul(a, b), c)  # (rows, PACK)
    return jnp.sum((~ok).astype(jnp.int32))


@jax.jit
def check_rns_inverse_rows(x, xinv) -> jnp.ndarray:
    """x * xinv == 1, or x == 0 and xinv == 0 (inv0) per packed element."""
    rfp = _rns()
    one = jnp.broadcast_to(jnp.asarray(rfp.one()), x.shape)
    ok = jnp.where(rfp.is_zero(x), rfp.is_zero(xinv),
                   rfp.is_equal(rfp.mul(x, xinv), one))
    return jnp.sum((~ok).astype(jnp.int32))


@jax.jit
def check_rns_sqrt_rows(x, sgn, s) -> jnp.ndarray:
    """Verify s^2 == x and sgn0(s) == sgn per packed element
    (fq_target.rs:223-240 constraints on the RNS tier)."""
    rfp = _rns()
    sq_ok = rfp.is_equal(rfp.mul(s, s), x)
    sgn_ok = rfp.sgn0(s) == (sgn & 1)
    return jnp.sum((~(sq_ok & sgn_ok)).astype(jnp.int32))


@jax.jit
def check_connect_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """builder.connect equality constraint (fq_target.rs:88-90): count of
    unequal rows. Tower component axes were folded into the row batch."""
    return jnp.sum((~_canon_eq(a, b)).astype(jnp.int32))


@jax.jit
def check_rns_connect_rows(a, b) -> jnp.ndarray:
    rfp = _rns()
    return jnp.sum((~rfp.is_equal(a, b)).astype(jnp.int32))


def _rns_fq2():
    from ..ops.rns import fq2 as rfq2

    return rfq2


@jax.jit
def check_rns_fq2_inverse_rows(x, xinv) -> jnp.ndarray:
    """x * xinv == 1 or x == xinv == 0, per packed element, at Fq2 level on
    the RNS tier (fq2_target.rs:194-225 constraints)."""
    rfq2 = _rns_fq2()
    one = jnp.broadcast_to(rfq2.one(), x.shape)
    ok = jnp.where(rfq2.is_zero(x), rfq2.is_zero(xinv),
                   rfq2.is_equal(rfq2.mul(x, xinv), one))
    return jnp.sum((~ok).astype(jnp.int32))


@jax.jit
def check_rns_fq2_sqrt_rows(x, sgn, s) -> jnp.ndarray:
    """Verify s^2 == x and sgn0(s) == sgn at Fq2 level on the RNS tier
    (fq2_target.rs:294-311 constraints)."""
    rfq2 = _rns_fq2()
    sq_ok = rfq2.is_equal(rfq2.square(s), x)
    sgn_ok = rfq2.sgn0(s) == (sgn & 1)
    return jnp.sum((~(sq_ok & sgn_ok)).astype(jnp.int32))


#: op kind -> (checker, arity) over stacked rows
_CHECKERS = {
    "mul": (check_mul_rows, 3),
    "inv": (check_inverse_rows, 2),
    "sqrt": (check_sqrt_rows, 3),
    "fq2_inv": (check_fq2_inverse_rows, 2),
    "fq2_sqrt": (check_fq2_sqrt_rows, 3),
    "fq6_inv": (check_fq6_inverse_rows, 2),
    "fq12_inv": (check_fq12_inverse_rows, 2),
    "rns_mul": (check_rns_mul_rows, 3),
    "rns_inv": (check_rns_inverse_rows, 2),
    "rns_sqrt": (check_rns_sqrt_rows, 3),
    "connect": (check_connect_rows, 2),
    "rns_connect": (check_rns_connect_rows, 2),
    "rns_fq2_inv": (check_rns_fq2_inverse_rows, 2),
    "rns_fq2_sqrt": (check_rns_fq2_sqrt_rows, 3),
}

#: trailing element shape per positional slot (None = scalar flag like sgn)
_ROW_NDIM = {
    "mul": (1, 1, 1), "inv": (1, 1), "sqrt": (1, 0, 1),
    "fq2_inv": (2, 2), "fq2_sqrt": (2, 0, 2),
    "fq6_inv": (2, 2), "fq12_inv": (2, 2),
    # RNS sgn flags are (rows, PACK) — elem_ndim 1 keeps the PACK axis
    # aligned with the checkers' per-packed-element (rows, PACK) masks
    "rns_mul": (1, 1, 1), "rns_inv": (1, 1), "rns_sqrt": (1, 1, 1),
    "connect": (1, 1), "rns_connect": (1, 1),
    "rns_fq2_inv": (2, 2), "rns_fq2_sqrt": (2, 1, 2),
}


def _stack_rows(rows, elem_ndim: int) -> jnp.ndarray:
    """Flatten each recorded tensor's batch axes and concatenate the rows."""
    flat = []
    for r in rows:
        r = jnp.asarray(r)
        tail = r.shape[r.ndim - elem_ndim:] if elem_ndim else ()
        flat.append(r.reshape((-1, *tail)))
    return jnp.concatenate(flat)


def check_trace(tr: WitnessTrace) -> dict:
    """Verify every recorded row of every hint kind; returns
    {op: violating_row_count}. All-zero is the constraint-satisfaction gate —
    the batched analogue of 'data.prove(pw) succeeds' in the reference's
    tests (SURVEY.md §4)."""
    out = {}
    for op, rows in tr.rows.items():
        checker, arity = _CHECKERS[op]
        ndims = _ROW_NDIM[op]
        cols = [
            _stack_rows([r[i] for r in rows], ndims[i]) for i in range(arity)
        ]
        out[op] = int(checker(*cols))
    return out


# ---------------------------------------------------------------------------
# plonky2-compatible row export: 12 x u32 limbs per Fp element
# (reference to_vec/from_vec/set_witness, src/fields/fq_target.rs:288-314)
# ---------------------------------------------------------------------------

U32_LIMBS = 12  # 381-bit value in 12 little-endian u32 limbs


def to_u32_limbs(x: jnp.ndarray) -> jnp.ndarray:
    """Montgomery (..., 48) radix-2^8 limbs -> standard-form (..., 12) uint32
    little-endian limbs — the exact layout FqTarget::from_vec consumes."""
    std = fp.canonicalize(fp.from_mont(x)).astype(jnp.uint32)
    groups = std.reshape(*std.shape[:-1], U32_LIMBS, 4)
    weights = jnp.asarray([1, 1 << 8, 1 << 16, 1 << 24], dtype=jnp.uint32)
    return jnp.sum(groups * weights, axis=-1, dtype=jnp.uint32)


def from_u32_limbs(u: jnp.ndarray) -> jnp.ndarray:
    """(..., 12) uint32 limbs -> canonical Montgomery (..., 48) limbs."""
    u = jnp.asarray(u, dtype=jnp.uint32)
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    bytes_ = ((u[..., None] >> shifts) & jnp.uint32(0xFF)).astype(jnp.int32)
    std = bytes_.reshape(*u.shape[:-1], U32_LIMBS * 4)
    return fp.to_mont(std)


def rns_to_u32_limbs(rows) -> np.ndarray:
    """Packed RNS rows (..., LANES) -> standard-form (..., PACK elements
    unpacked along axis 0, 12) uint32 little-endian limbs. Decode exits
    Montgomery form (ops/rns/fp.py decode), so the layout matches
    to_u32_limbs' output exactly."""
    rfp = _rns()
    ints = rfp.decode(np.asarray(rows))
    flat = ints.reshape(-1) if ints.shape else ints.reshape(1)
    out = np.zeros((flat.size, U32_LIMBS), dtype=np.uint32)
    for i, v in enumerate(flat):
        x = int(v)
        for j in range(U32_LIMBS):
            out[i, j] = (x >> (32 * j)) & 0xFFFFFFFF
    return out.reshape(*ints.shape, U32_LIMBS)


def export_rows_u32(tr: WitnessTrace) -> dict:
    """Export all recorded rows with every Fp component in the 12xu32 layout:
    {op: list of row tuples of np.uint32 arrays (sgn flags pass through)} —
    the feed for a plonky2 set_witness consumer. RNS-tier rows ("rns_*") are
    decoded out of residue/Montgomery form first (each packed row exports
    PACK elements)."""
    out = {}
    for op, rows in tr.rows.items():
        ndims = _ROW_NDIM[op]
        rns = op.startswith("rns_")
        exported = []
        for r in rows:
            exported.append(tuple(
                np.asarray(t) if ndims[i] == 0
                else (rns_to_u32_limbs(t) if rns
                      else np.asarray(to_u32_limbs(jnp.asarray(t))))
                for i, t in enumerate(r)
            ))
        out[op] = exported
    return out
