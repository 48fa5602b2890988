"""RNS-channel Fp core: the production fast tier of the Fp layer.

TPU re-design of the reference's nonnative Fp gadget layer
(src/fields/fq_target.rs:31-314, src/fields/bls12_381base.rs:83-172) with a
representation chosen for the hardware instead of for 32-bit circuit limbs:
an Fp element is its residue vector modulo 63 independent ~13-bit primes
(rns_constants.py), one residue per vector lane — and because an element
needs exactly 64 lanes, every 128-lane row PACKS TWO batch elements.

  * multiply      = ONE int32 lane-multiply (vs a 48-step limb convolution)
  * add/sub/neg   = lane add/sub (+ a constant k*p residue row), carry-free
  * reduction     = RNS Montgomery REDC: 4 lane-Barrett passes (one of them
                    a cheap signed representative) and two base-extension
                    matmuls against constant block-diagonal 128x128 matrices
                    (exact bf16 7/6-bit planes) on the MXU; both extension
                    wrap counts ride Kawamura fixed-point matrix columns

Stored elements are canonical per channel (residue < m) and redundantly
reduced at value level (<= 4p); lazy accumulations ride the `R` class, which
tracks exact channel- and value-level bounds statically (the analogue of
ops/fp.py's Wide) so every int32/f32/bf16 exactness invariant is asserted at
trace time.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ... import rns_constants as RC

LANES = RC.LANES
P = RC.P
STORED = RC.STORED_BOUND  # value bound of stored elements (4p, inclusive)
_CH_MAX = RC.PRIME_MAX - 1  # canonical channel bound
_I32 = 1 << 31
#: One-pass Barrett stays exact for |x| up to ~2^31: the f32 quotient error is
#: <= 0.5 (round) + |x|*2^-25/m (x rounding) + 2*(x/m)*2^-24 (mult + 1/m
#: rounding) < 0.6 for m >= 3557, so r = x - round(x/m)*m lands in
#: (-0.6m, 0.6m) and one masked +m canonicalizes. The margin below 2^31 keeps
#: q*m inside int32.
_BARRETT_DOM = (1 << 31) - (1 << 27)


# ---------------------------------------------------------------------------
# Host-side encode/decode
# ---------------------------------------------------------------------------


def encode(values) -> np.ndarray:
    """Python ints -> packed residue rows, Montgomery form x*MA mod p.

    Scalars (ndim 0) produce one (LANES,) row holding the value in BOTH
    packed slots (the right form for constants). Arrays pack PAIRS of
    elements along axis 0: shape (B, ...) -> (ceil(B/2), ..., LANES), row r
    slot 0 = element 2r, slot 1 = element 2r+1 (odd tails replicate the last
    element)."""
    arr = np.asarray(values, dtype=object)
    if arr.ndim == 0:
        return np.tile(RC.encode_int_slot(int(arr[()])), RC.PACK)
    b = arr.shape[0]
    rows = -(-b // RC.PACK)
    out = np.zeros((rows,) + arr.shape[1:] + (LANES,), dtype=np.int32)
    for idx in np.ndindex(arr.shape):
        r, slot = idx[0] // RC.PACK, idx[0] % RC.PACK
        out[(r,) + idx[1:] + (slice(slot * RC.SUB, (slot + 1) * RC.SUB),)] = (
            RC.encode_int_slot(int(arr[idx])))
    if b % RC.PACK:  # replicate the tail element into the empty slot
        out[(rows - 1,) + (Ellipsis, slice(RC.SUB, LANES))] = np.where(
            out[(rows - 1,) + (Ellipsis, slice(RC.SUB, LANES))].any(axis=-1,
                                                                    keepdims=True),
            out[(rows - 1,) + (Ellipsis, slice(RC.SUB, LANES))],
            out[(rows - 1,) + (Ellipsis, slice(0, RC.SUB))])
    return out


def decode(rows) -> np.ndarray:
    """Packed rows (R, ..., LANES) -> object ndarray of field ints with the
    element axis unpacked: shape (R*PACK, ...). Callers slice [:B]."""
    arr = np.asarray(rows)
    shape = arr.shape[:-1]
    out = np.empty((shape[0] * RC.PACK,) + shape[1:], dtype=object) if shape \
        else np.empty((), dtype=object)
    if not shape:
        return RC.decode_int_slot(arr[: RC.SUB])
    for idx in np.ndindex(shape):
        for slot in range(RC.PACK):
            out[(idx[0] * RC.PACK + slot,) + idx[1:]] = RC.decode_int_slot(
                arr[idx + (slice(slot * RC.SUB, (slot + 1) * RC.SUB),)])
    return out


def pack_mask(mask) -> np.ndarray:
    """Per-element mask (B, ...) -> packed lane mask (ceil(B/2), ..., LANES)
    int32 (each element's mask broadcast over its 64-lane slot)."""
    arr = np.asarray(mask).astype(np.int32)
    b = arr.shape[0]
    rows = -(-b // RC.PACK)
    if b % RC.PACK:
        arr = np.concatenate([arr, arr[-1:]], axis=0)
    # (rows, PACK, ...) -> move PACK next to a new lane axis
    g = arr.reshape((rows, RC.PACK) + arr.shape[1:])
    g = np.moveaxis(g, 1, -1)  # (rows, ..., PACK)
    return np.repeat(g, RC.SUB, axis=-1)  # (rows, ..., LANES)


# ---------------------------------------------------------------------------
# Constant provider: every constant tensor used by the arithmetic goes
# through cst(), so the fused Pallas kernels (ops/rns/pallas.py) can replace
# module-level tables with kernel input refs (Pallas rejects captured
# constants) while the XLA path sees plain jnp constants.
# ---------------------------------------------------------------------------

_M_I32 = RC.M_I32
_INV_M = RC.INV_M_F32

_const_hook = None  # callable(tag, np_value) -> jnp array, or None


def set_const_hook(hook):
    global _const_hook
    prev = _const_hook
    _const_hook = hook
    return prev


#: Fused-kernel mode (ops/rns/pallas.py): TPU-only execution strategy.
#: Measured on v5e: the whole-scan Fermat-pow kernel is ~3x the XLA while
#: loop (no per-step overhead), but the per-op Fq12 tower kernels LOSE to
#: XLA's own fusion (~1.5x slower — the tower work is VPU-elementwise-bound
#: and XLA already fuses it tightly), so tower fusion is opt-in for
#: experiments while pow fusion is the production default.
_FUSED = False        # whole-scan pow kernels (production on TPU)
_FUSED_TOWER = False  # per-op tower kernels (experimental)


def set_fused(on: bool, tower: bool = False) -> None:
    global _FUSED, _FUSED_TOWER
    _FUSED = bool(on)
    _FUSED_TOWER = bool(tower)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_fused() -> bool:
    if not _FUSED or _const_hook is not None:  # never nest kernels
        return False
    return _on_tpu()


def use_fused_tower() -> bool:
    if not _FUSED_TOWER or _const_hook is not None:
        return False
    return _on_tpu()


def _const_np(tag):
    """Numpy value for an fp-internal constant tag."""
    kind = tag[0]
    if kind == "pmul":
        return RC.p_mult_row(tag[1])
    if kind == "c_mamod_slot":
        return RC.C_MAMOD_BY_SLOT[tag[1]]
    if kind == "c_mbmod_slot":
        return RC.C_MBMOD_BY_SLOT[tag[1]]
    table = {
        "m": _M_I32, "inv_m": _INV_M,
        "c_sigma": RC.C_SIGMA, "c_mainv": RC.C_MAINV,
        "c_pmainv": RC.C_PMAINV,
        "c_mainv_mbinv": RC.C_MAINV_MBINV,
        "c_pmainv_mbinv": RC.C_PMAINV_MBINV,
        "ma_modp": RC.MA_MODP_ROW,
        "is_a": RC.IS_A.astype(np.int32),
        "c_crt_cinv": RC.C_CRT_CINV,
    }
    if kind in table:
        return table[kind]
    raise KeyError(tag)


def cst(tag, np_val=None) -> jnp.ndarray:
    """Fetch a constant tensor by tag (tuple, first element a string)."""
    if np_val is None:
        np_val = _const_np(tag)
    if _const_hook is not None:
        return _const_hook(tag, np_val)
    return jnp.asarray(np_val)


# ---------------------------------------------------------------------------
# Channel Barrett reduction
# ---------------------------------------------------------------------------


def barrett_raw(x: jnp.ndarray) -> jnp.ndarray:
    """Per-lane signed representative of x mod m for |x| < _BARRETT_DOM: one
    round-mult-sub lands in (-0.6m, 0.6m) (see _BARRETT_DOM error analysis).
    Use where any representative is acceptable (products taken mod m later)."""
    m = cst(("m",))
    q = jax.lax.round(x.astype(jnp.float32) * cst(("inv_m",)),
                      jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(jnp.int32)
    return x - q * m


def barrett(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical x mod m: barrett_raw plus one masked add. Padding lanes
    (m = 1) map to 0."""
    r = barrett_raw(x)
    return jnp.where(r < 0, r + cst(("m",)), r)


# ---------------------------------------------------------------------------
# R: lazy channel accumulator with static bounds
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class R:
    """Raw channel values (..., LANES) int32 plus exact static bounds.

    `lo`/`hi` bound every per-channel int; `vlo`/`vhi` bound the represented
    integer value (of the abstract computation over Z). Canonicalizing
    channels (Barrett) never changes the represented value — residues are
    preserved — so `canon` is free at value level.
    """

    ch: jnp.ndarray
    lo: int
    hi: int
    vlo: int
    vhi: int

    def tree_flatten(self):
        return (self.ch,), (self.lo, self.hi, self.vlo, self.vhi)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    def _chk(self) -> "R":
        assert -_I32 < self.lo and self.hi < _I32, "int32 channel overflow"
        return self

    def __add__(self, o: "R") -> "R":
        return R(self.ch + o.ch, self.lo + o.lo, self.hi + o.hi,
                 self.vlo + o.vlo, self.vhi + o.vhi)._chk()

    def __sub__(self, o: "R") -> "R":
        return R(self.ch - o.ch, self.lo - o.hi, self.hi - o.lo,
                 self.vlo - o.vhi, self.vhi - o.vlo)._chk()

    def scale(self, k: int) -> "R":
        assert k >= 0
        return R(self.ch * k, self.lo * k, self.hi * k,
                 self.vlo * k, self.vhi * k)._chk()

    def canon(self) -> "R":
        """Barrett-canonicalize channels (value bounds unchanged)."""
        assert -_BARRETT_DOM < self.lo and self.hi < _BARRETT_DOM
        return R(barrett(self.ch), 0, _CH_MAX, self.vlo, self.vhi)

    def maybe_canon(self, budget: int = 1 << 14) -> "R":
        """Canonicalize only when channel growth threatens product exactness."""
        return self.canon() if (self.hi >= budget or self.lo <= -budget) else self

    def bias(self, k: int) -> "R":
        """Add the constant k*p (residue row): clears value-level negativity."""
        row = RC.p_mult_row(k)
        return R(self.ch + cst(("pmul", k)), self.lo, self.hi + int(row.max()),
                 self.vlo + k * P, self.vhi + k * P)


def wrap(a: jnp.ndarray) -> R:
    """Stored canonical element -> R."""
    return R(a, 0, _CH_MAX, 0, STORED)


#: Trace-time op counters (profiling.rns_op_report): when set, mul_rr/redc
#: record how many packed Fp-element rows they process. Counting happens
#: during tracing (jax.eval_shape) so it costs nothing at runtime — the
#: RNS analogue of the reference's dbg!(degree_bits) circuit-size probe.
_op_counter: dict | None = None


def _count(kind: str, shape) -> None:
    if _op_counter is not None:
        import math

        rows = math.prod(shape[:-1]) if len(shape) > 1 else 1
        _op_counter[kind] = _op_counter.get(kind, 0) + rows * RC.PACK


def count_fp_ops(fn, *args) -> dict:
    """Exact Fp-op counts of fn's computation in ELEMENT units (each packed
    element counted separately), measured by abstract tracing — zero runtime
    cost. Keys: fp_mul (channel products), redc (Montgomery reductions)."""
    global _op_counter
    prev = _op_counter
    _op_counter = {}
    try:
        # a fresh lambda defeats eval_shape's jit trace cache, which would
        # otherwise skip tracing (and the counters) on repeat calls
        jax.eval_shape(lambda *a: fn(*a), *args)
        return dict(_op_counter)
    finally:
        _op_counter = prev


def mul_rr(a: R, b: R) -> R:
    """Channel product; exact while |a_ch*b_ch| < 2^31 (asserted)."""
    am = max(abs(a.lo), abs(a.hi))
    bm = max(abs(b.lo), abs(b.hi))
    assert am * bm < _I32, f"int32 channel product overflow: {am}*{bm}"
    vals = [a.vlo * b.vlo, a.vlo * b.vhi, a.vhi * b.vlo, a.vhi * b.vhi]
    out = R(a.ch * b.ch, -am * bm, am * bm, min(vals), max(vals))
    _count("fp_mul", out.ch.shape)
    return out


def mul_ss(a: jnp.ndarray, b: jnp.ndarray) -> R:
    """Product of two stored elements."""
    return mul_rr(wrap(a), wrap(b))


def to_prod(a: jnp.ndarray) -> R:
    """Lift a stored element into the product domain (x one extra MA factor,
    mod p) so it can be summed with products of two stored elements before a
    REDC (ops/fp.py to_wide_mont analogue). One lane-multiply by the constant
    residue row of (MA mod p)."""
    row = RC.MA_MODP_ROW
    c = R(cst(("ma_modp",)), 0, int(row.max()), 0, RC.MA_MODP_INT)
    return mul_rr(wrap(a), c)


# ---------------------------------------------------------------------------
# RNS Montgomery reduction (rns_constants.py docstring, steps 1-4)
# ---------------------------------------------------------------------------

_BF16_CACHE: dict = {}


def _bf16(mat: np.ndarray, tag: str):
    if tag not in _BF16_CACHE:
        import ml_dtypes

        assert mat.max() <= 256
        _BF16_CACHE[tag] = mat.astype(np.float32).astype(ml_dtypes.bfloat16)
    return _BF16_CACHE[tag]


def _mm(x: jnp.ndarray, mat) -> jnp.ndarray:
    if _const_hook is None:
        # XLA path: keep the native rank-N contraction — flattening with
        # reshape breaks XLA's fusion around the matmul (measured 2x slowdown
        # of every REDC phase)
        return jnp.einsum("...k,kj->...j", x.astype(jnp.bfloat16),
                          jnp.asarray(mat),
                          preferred_element_type=jnp.float32).astype(jnp.int32)
    # kernel path: Mosaic supports only 2D dots
    shp = x.shape
    x2 = x.reshape(-1, shp[-1]) if x.ndim != 2 else x
    out = jnp.dot(x2.astype(jnp.bfloat16), jnp.asarray(mat),
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    return out.reshape(shp) if x.ndim != 2 else out


_PB = RC.PLANE_BITS


def _ext_matmul(x: jnp.ndarray, lo, hi, sm) -> jnp.ndarray:
    """Exact x @ T for canonical 13-bit x and T, via 7/6-bit planes and a
    Karatsuba combine (3 bf16 MXU matmuls)."""
    xl = x & ((1 << _PB) - 1)
    xh = x >> _PB
    ll = _mm(xl, lo)
    hh = _mm(xh, hi)
    cross = _mm(xl + xh, sm) - ll - hh
    return ll + (cross << _PB) + (hh << (2 * _PB))


def _t1_planes():
    return (cst(("t1lo",), _bf16(RC.T1_LO, "t1lo")),
            cst(("t1hi",), _bf16(RC.T1_HI, "t1hi")),
            cst(("t1sum",), _bf16(RC.T1_SUM, "t1sum")))


def _t2_planes():
    return (cst(("t2lo",), _bf16(RC.T2_LO, "t2lo")),
            cst(("t2hi",), _bf16(RC.T2_HI, "t2hi")),
            cst(("t2sum",), _bf16(RC.T2_SUM, "t2sum")))


def _crt_planes():
    return (cst(("crtlo",), _bf16(RC.CRT_LO, "crtlo")),
            cst(("crthi",), _bf16(RC.CRT_HI, "crthi")),
            cst(("crtsum",), _bf16(RC.CRT_SUM, "crtsum")))


def nonneg(x: R) -> R:
    """Bias by the smallest multiple of p making the value provably >= 0."""
    if x.vlo >= 0:
        return x
    return x.bias(-(-(-x.vlo) // P))


def redc(x: R) -> jnp.ndarray:
    """X (value in [0, MA*p)) -> stored element V = X*MA^{-1} + k*p (mod-p
    equal to X*MA^{-1}), canonical channels, value < 3p. Negative value
    bounds are cleared with a constant k*p residue row first."""
    x = nonneg(x)
    assert x.vhi <= RC.REDC_MAX, "redc input exceeds MA*p"
    # Barrett reduces ANY representative of X mod m: if channel bounds keep
    # both product sites exact in int32 (sigma's x*C_SIGMA and step 3's
    # x*C_MAINV + qhat*C_PMAINV, the latter within the Barrett domain), the
    # dedicated canonicalization pass is skipped. With Fq2-product outputs
    # canonicalized at the tower level this is the common case.
    _skip_max = ((_BARRETT_DOM - (1 << 26)) // (RC.PRIME_MAX - 1))
    if -_skip_max < x.lo and x.hi < _skip_max:
        xc = x.ch
    else:
        xc = x.canon().ch
    _count("redc", x.ch.shape)
    # step 1: sigma_i = X * (-p^-1) * (MA/a_i)^-1 mod a_i  (A lanes)
    sigma = barrett(xc * cst(("c_sigma",)))
    # step 2: extend q to B+r; each packed slot's alpha rides as an extra
    # matrix column of its block. qhat only ever enters products taken mod m,
    # so the signed barrett_raw representative suffices (no canonical pass).
    s = _ext_matmul(sigma, *_t1_planes())
    corr = 0
    for k in range(RC.PACK):
        lane = k * RC.SUB + RC.ALPHA_LANE
        alpha_k = s[..., lane : lane + 1] >> RC.ALPHA_T
        corr = corr + alpha_k * cst(("c_mamod_slot", k))
    qhat = barrett_raw(s - corr)
    # steps 3+4 fused: sigma'_j = r_j * (MB/b_j)^-1 mod b_j directly from
    # (X, qhat) with folded constants — r itself is only canonicalized once,
    # in the final merged Barrett below.
    sigma2 = barrett(xc * cst(("c_mainv_mbinv",))
                     + qhat * cst(("c_pmainv_mbinv",)))
    s2 = _ext_matmul(sigma2, *_t2_planes())
    # exact Kawamura beta (rns_constants.py step 4): the +1/2 offset makes
    # the fixed-point wrap count exact because r < 3p << MB.
    corr2 = 0
    for k in range(RC.PACK):
        lane = k * RC.SUB + RC.ALPHA_LANE
        beta_k = (s2[..., lane : lane + 1] + (1 << (RC.BETA_T - 1))) >> RC.BETA_T
        corr2 = corr2 + beta_k * cst(("c_mbmod_slot", k))
    # one canonical Barrett over the where-merged halves: A lanes get the
    # back-extended value, B+r lanes get r = (X + qhat*p) * MA^-1.
    pre = jnp.where(cst(("is_a",)) != 0, s2 - corr2,
                    xc * cst(("c_mainv",)) + qhat * cst(("c_pmainv",)))
    return barrett(pre)


def redc_stack(rs: list[R], axis: int = -2) -> jnp.ndarray:
    """One stacked REDC for k lazy values -> (..., k, LANES) stored."""
    rs = [nonneg(r) for r in rs]
    ch = jnp.stack([r.ch for r in rs], axis=axis)
    merged = R(ch, min(r.lo for r in rs), max(r.hi for r in rs),
               min(r.vlo for r in rs), max(r.vhi for r in rs))
    return redc(merged)


def row1(r: R) -> R:
    """A single-row R ((..., LANES)) -> 1-row stacked form ((..., 1, LANES));
    the redc_cat entry form. Keeping one entry per abstract value preserves
    redc_stack's PER-VALUE nonneg biasing (bit-identical rows)."""
    return R(r.ch[..., None, :], r.lo, r.hi, r.vlo, r.vhi)


def redc_cat(rs: list[R], axis: int = -2) -> jnp.ndarray:
    """One stacked REDC over ALREADY multi-row R values ((..., k_i, LANES)),
    concatenated along `axis`. Per-entry nonneg biasing first (matching
    redc_stack), so each entry's rows are bit-identical to what a separate
    redc of that entry would produce.

    NOTE (ADVICE r4): per-entry biasing makes each entry bit-identical to its
    own separate redc. Bit-identity with a caller that instead MERGES several
    entries into one R (one shared bias — e.g. _ell_scaled's r0/r1 merge)
    additionally requires those entries to have identical vlo: nonneg biases
    by ceil(-vlo/p)*p, so unequal vlo would pick different multiples of p and
    produce representatives differing by p (equal mod p, different rows).
    All current cross-path callers (doubling_step/addition_step scaled mode
    vs _ell_scaled) satisfy this: r0 = c0*py and r1 = c1*px are products of
    stored elements with identical bounds."""
    rs = [nonneg(r) for r in rs]
    ch = jnp.concatenate([r.ch for r in rs], axis=axis)
    merged = R(ch, min(r.lo for r in rs), max(r.hi for r in rs),
               min(r.vlo for r in rs), max(r.vhi for r in rs))
    return redc(merged)


# ---------------------------------------------------------------------------
# Stored-element ring ops
# ---------------------------------------------------------------------------


def zeros(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, LANES), dtype=jnp.int32)


def one(batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(RC.ONE), (*batch_shape, LANES))


#: Witness-trace sink (models/witness.py): when set, stored-element products
#: and inverses append (op_name, inputs..., output) rows — parity of the RNS
#: production tier with the reference's hint generators, which fire
#: regardless of prover backend (src/fields/fq_target.rs:316-355). The sink
#: object is SHARED with ops/fp.py's: models/witness.py installs one list in
#: both modules so rows interleave in execution order.
_witness_sink = None


def _record(op: str, *tensors):
    if _witness_sink is None or _const_hook is not None:
        return  # no host callbacks inside Pallas kernel bodies
    if any(isinstance(t, jax.core.Tracer) for t in tensors):
        from functools import partial as _partial

        from jax.experimental import io_callback

        io_callback(_partial(_record_cb, op), None, *tensors, ordered=True)
    else:
        _witness_sink.append((op, tensors))


def _record_cb(op: str, *vals):
    if _witness_sink is not None:
        _witness_sink.append((op, tuple(np.asarray(v) for v in vals)))


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product of stored elements (the Fp multiply)."""
    out = redc(mul_ss(a, b))
    _record("rns_mul", a, b, out)
    return out


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def neg_r(b: R, k: int | None = None) -> R:
    """-b as k*p - b with the smallest adequate multiple of p."""
    if k is None:
        k = -(-b.vhi // P)
    row = RC.p_mult_row(k)
    return R(cst(("pmul", k)) - b.ch, -b.hi, int(row.max()) - b.lo,
             k * P - b.vhi, k * P - b.vlo)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    m = mask[..., None] if mask.ndim == a.ndim - 1 else mask
    return jnp.where(m != 0, a, b)


_IS_CH_J = None


def _ch_mask():
    global _IS_CH_J
    if _IS_CH_J is None:
        _IS_CH_J = np.asarray(RC.IS_CH)
    return _IS_CH_J


def _rows_match(x: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Per-slot test: does each packed slot of x match any constant row?
    Returns (..., PACK) bools."""
    eq = (x[..., None, :] == rows) | ~jnp.asarray(_ch_mask())
    eqs = eq.reshape(*eq.shape[:-1], RC.PACK, RC.SUB)
    return jnp.any(jnp.all(eqs, axis=-1), axis=-2)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Per packed element: stored value (<= 4p, canonical channels) == 0 mod
    p iff its residue slot equals that of k*p for some k in 0..4. Returns
    (..., PACK) bools (slot-major element order)."""
    return _rows_match(a, jnp.asarray(RC.ZERO_TEST_ROWS))


def is_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per packed element: a == b (mod p) via the k*p rows of a - b + 4p.
    Returns (..., PACK) bools."""
    d = barrett(a - b + jnp.asarray(RC.p_mult_row(4)))
    return _rows_match(d, jnp.asarray(RC.EQ_TEST_ROWS))


# ---------------------------------------------------------------------------
# RNS -> positional bridge + the non-arithmetic FqTarget surface
# (reference src/fields/fq_target.rs:215-281; closes the r3 parity gap —
# sgn0/comparisons have no meaning on bare residues, so they run on an exact
# on-device conversion to the limb tier's canonical radix-2^8 layout)
# ---------------------------------------------------------------------------


def to_limbs(a: jnp.ndarray) -> jnp.ndarray:
    """Stored (..., LANES) -> canonical standard-form (..., PACK, 48) int32
    radix-2^8 limbs (the limb tier's exact element layout, ops/fp.py).

    One REDC exits Montgomery form (value v < 3p, v = x mod p), one Barrett
    yields the CRT coefficients c_i = v*(MA/a_i)^{-1} mod a_i, and ONE
    extension-style MXU matmul against the digit matrix produces the lazy
    positional digits of sum_i c_i*(MA/a_i) together with its exact Kawamura
    wrap count k (rns_constants.CRT); v's digits follow as cols - k*MA_digits,
    finished by the limb tier's carry normalization and two conditional
    subtractions of p."""
    from .. import fp as limb_fp

    s = redc(wrap(a))
    c = barrett(s * cst(("c_crt_cinv",)))
    d = _ext_matmul(c, *_crt_planes())
    mad = cst(("ma_digits",), RC.MA_DIGITS)
    per_slot = []
    for k in range(RC.PACK):
        lane = k * RC.SUB + RC.ALPHA_LANE
        kw = (d[..., lane : lane + 1] + (1 << (RC.BETA_T - 1))) >> RC.BETA_T
        cols = d[..., k * RC.SUB : k * RC.SUB + RC.CRT_DIGITS] - kw * mad
        per_slot.append(cols)
    cols = jnp.stack(per_slot, axis=-2)  # (..., PACK, CRT_DIGITS)
    hi = RC.NCH * (RC.PRIME_MAX - 1) * 255
    w = limb_fp.Wide(cols, -RC.NCH * 255, hi, 0, 3 * P - 1)
    v51 = limb_fp.normalize(w, RC.CRT_DIGITS)  # canonical digits, v < 3p
    return limb_fp._cond_subtract_p(limb_fp._cond_subtract_p(v51))


def neg(b: jnp.ndarray) -> jnp.ndarray:
    """Stored negation 4p - b (canonical channels, value <= 4p)."""
    return barrett(cst(("pmul", 4)) - b)


def sgn0(a: jnp.ndarray) -> jnp.ndarray:
    """RFC-9380 sign bit of the standard-form value per packed element:
    (..., PACK) (reference fq_target.rs:215-219)."""
    return to_limbs(a)[..., 0] & 1


def sqrt(a: jnp.ndarray) -> jnp.ndarray:
    """Candidate square root a^((p+1)/4) (p = 3 mod 4). Valid iff out^2 == a."""
    return _pow_api(a, (P + 1) // 4)


def legendre(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p-1)/2) in Montgomery form: one / neg(one) / 0."""
    return _pow_api(a, (P - 1) // 2)


def is_square(a: jnp.ndarray) -> jnp.ndarray:
    """True for QRs and zero, per packed element (..., PACK)
    (reference src/fields/fq_target.rs:262-281)."""
    leg = legendre(a)
    neg_one = jnp.broadcast_to(neg(jnp.asarray(RC.ONE)), a.shape)
    return ~is_equal(leg, neg_one)


def sqrt_with_sgn(a: jnp.ndarray, sgn: jnp.ndarray) -> jnp.ndarray:
    """Square root with prescribed sign bit (reference fq_target.rs:223-240):
    of the two roots +-s, return the one with sgn0 == sgn (assumes a is a
    QR). sgn: per packed element (..., PACK)."""
    s = sqrt(a)
    want = sgn0(s) == (sgn & 1)  # (..., PACK)
    mask = jnp.repeat(want.astype(jnp.int32), RC.SUB, axis=-1)
    out = jnp.where(mask != 0, s, neg(s))
    _record("rns_sqrt", a, sgn, out)
    return out


def div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a / b = a * b^-1 (reference fq_target.rs:209-213; b == 0 -> 0 via the
    inv0 convention of the batched tree inverse)."""
    return mul(a, inv(b))


def connect(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """The builder-equality constraint on the production tier (reference
    fq_target.rs:88-90): records an equality row verified by
    models/witness.check_trace, returns (..., PACK) equality per packed
    element. Component axes (tower levels) fold into the row batch."""
    _record("rns_connect", a, b)
    return is_equal(a, b)  # (..., PACK); tower wrappers reduce component axes


# ---------------------------------------------------------------------------
# Fixed-exponent powers (Fermat inverse)
# ---------------------------------------------------------------------------


def pow_static(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent: MSB-first square-and-multiply lax.scan over the static bit
    table (same schedule as ops/fp.py pow_static). Montgomery in/out."""
    if exponent == 0:
        return one(a.shape[:-1])
    bits = np.array(
        [(exponent >> i) & 1 for i in range(exponent.bit_length() - 1, -1, -1)],
        dtype=np.int32,
    )

    def body(acc, bit):
        sq = mul(acc, acc)
        if _witness_sink is not None:
            # witness mode: select (not cond) so the recording callback's
            # io_callback never sits inside a cond branch
            return jnp.where(bit != 0, mul(sq, a), sq), None
        return jax.lax.cond(bit != 0, lambda s: mul(s, a), lambda s: s, sq), None

    acc, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
    return acc


def _pow_api(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """Fixed-exponent power via the fused whole-loop kernel on TPU, the XLA
    scan elsewhere (Montgomery in/out)."""
    if use_fused():
        from . import pallas as _pk

        return _pk.pow_static_fused(a, exponent, block=min(512, _pow_block(a)))
    return pow_static(a, exponent)


def _fermat_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Per-element Fermat inverse a^(p-2) (0 -> 0 rides the pow)."""
    return _pow_api(a, P - 2)


def pow_naf(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """Power over the signed NAF digit table (reference get_naf/pow schedule,
    src/fields/helpers.rs:176-239, fq_target.rs:243-260): one inverse then a
    scan over digits in {-1, 0, +1}."""
    from .. import fp as limb_fp

    naf = limb_fp.get_naf(exponent)  # LSB-first signed digits
    if not naf:
        return one(a.shape[:-1])
    a_inv = inv(a)
    digits = jnp.asarray(np.array(naf[::-1], dtype=np.int32))  # MSB-first

    def body(acc, d):
        sq = mul(acc, acc)
        pos = mul(sq, a)
        neg_ = mul(sq, a_inv)
        return jnp.where(d > 0, pos, jnp.where(d < 0, neg_, sq)), None

    # seed from the leading digit (always +1 for positive exponents)
    acc, _ = jax.lax.scan(body, jnp.broadcast_to(a, a.shape), digits[1:])
    return acc


def pow_dynamic(a: jnp.ndarray, e_bits: jnp.ndarray) -> jnp.ndarray:
    """Power with a RUNTIME bit vector (MSB-first (nbits,) int32): the
    exponent arrives as data, so every step does square + masked multiply
    (reference pow semantics with witness-supplied exponents)."""

    def body(acc, bit):
        sq = mul(acc, acc)
        withm = mul(sq, a)
        return jnp.where(bit != 0, withm, sq), None

    acc, _ = jax.lax.scan(body, one(a.shape[:-1]), e_bits)
    return acc


def _pow_block(a: jnp.ndarray) -> int:
    rows = 1
    for d in a.shape[:-1]:
        rows *= d
    return max(8, rows)


#: Row count at which the inverse product tree hands over to the Fermat pow.
#: Slope-measured on v5e at the decompression width (6144 rows, 5-deep
#: chains): 0.34 ms/inv at 64, 0.11 at 128, 0.42 at 256 — the pow kernel is
#: latency-bound (570 dependent steps) up to ~128 rows, so the wider floor
#: saves two tree levels for free.
_TREE_FLOOR = 128


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse, 0 -> 0 (the reference's inv0 convention,
    src/fields/fq2_target.rs:207-225).

    Montgomery's product-tree trick over the batch rows: a log-depth up-sweep
    of pairwise products down to a _TREE_FLOOR-row block, ONE whole-loop
    Fermat kernel on that block, and a log-depth down-sweep
    (inv(child) = inv(parent) * sibling) — ~3 multiply+REDC passes over the
    batch in place of ~570 full-width Fermat passes per element (measured
    ~25% of the whole pairing pipeline before this change). Zero elements are
    masked to 1 on the way up and restored to 0 at the end."""
    rows = a.reshape(-1, LANES)
    n = rows.shape[0]
    z = is_zero(rows)  # (n, PACK) bools
    zm = jnp.repeat(z.astype(jnp.int32), RC.SUB, axis=-1)  # (n, LANES)
    safe = jnp.where(zm != 0, one((n,)), rows)
    size = 1
    while size < n:
        size *= 2
    if size != n:
        safe = jnp.concatenate(
            [safe, jnp.broadcast_to(one(), (size - n, LANES))], axis=0)
    # Up-sweep stops at _TREE_FLOOR rows: each tree level is a small XLA op
    # whose fixed dispatch cost (~0.3 ms on the tunneled v5e) dwarfs its
    # arithmetic, while the whole-loop Fermat kernel costs ~1 ms regardless
    # of width — so the last few levels are cheaper inside the root pow.
    stack = []
    cur = safe
    while cur.shape[0] > _TREE_FLOOR:
        stack.append(cur)
        h = cur.shape[0] // 2
        cur = mul(cur[:h], cur[h:])
    invc = _fermat_inv(cur)          # the one real (multi-row) inversion
    for level in reversed(stack):
        h = level.shape[0] // 2
        invc = jnp.concatenate(
            [mul(invc, level[h:]), mul(invc, level[:h])], axis=0)
    out = jnp.where(zm != 0, jnp.zeros_like(invc[:n]), invc[:n]).reshape(a.shape)
    _record("rns_inv", a, out)
    return out
