"""Limb-vectorized Fp (BLS12-381 base field) arithmetic for TPU.

TPU-native re-design of the reference's native/nonnative Fp layers
(src/fields/bls12_381base.rs:83-172 native scalar field;
src/fields/fq_target.rs:31-314 in-circuit FqTarget): an Fp element is a vector
of 48 radix-2^8 limbs (int32) in Montgomery form (a*R mod p, R = 2^408), with a
trailing limb axis so every operation batches over arbitrary leading axes.

Design (SURVEY.md §7 step 1):
  * **Multiplication = convolution = matmul.** The 48x48 limb product is an
    outer product (VPU) contracted against a constant one-hot matrix (MXU);
    multiplications by the *constants* p and p' inside Montgomery reduction are
    matmuls against constant Toeplitz matrices. All matmul operands/partials
    are integers < 2^24, so f32 MXU accumulation (precision=HIGHEST) is exact.
  * **Lazy wide accumulation.** Products live as 95..97 signed int32 "columns"
    (class Wide) that can be added/subtracted cheaply; one Montgomery reduction
    per *output* element (the TPU analogue of the reference's per-gadget
    nonnative reductions, amortized).
  * **Carry propagation without serialization.** normalize() runs a few
    shift-add passes (static count derived from tracked column bounds) to bring
    columns into [-1, 256], then resolves residual +-1 ripples with a log-depth
    carry-lookahead `lax.associative_scan` (3-state monotone map composition).
  * **Branch-free special cases.** Fermat inverse (inv0: 0 -> 0 for free),
    sqrt/legendre by fixed-exponent scans, subtraction via the relaxed
    complement constant NEGC = 11p whose digits are all >= 255.

Exactness invariants (asserted statically via tracked bounds):
  conv operands a, b satisfy  min(na, nb) * max(a) * max(b) < 2^24
  every Wide fed to mont_reduce satisfies  0 <= value < R*p.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

NLIMBS = C.NLIMBS  # 48
NRED = C.NRED  # 51
LIMB_BITS = C.LIMB_BITS
MASK = C.LIMB_BASE - 1  # 255

_F32_EXACT = 1 << 24
_I32_EXACT = 1 << 31
_HI = jax.lax.Precision.HIGHEST

#: Kernel strategy:
#:   "xla"    — pure XLA composition (CPU tests, fallback)
#:   "pallas" — Pallas conv/mont_reduce primitives under XLA glue
#:   "fused"  — additionally use the fully-fused Fq12 tower kernels
#:   "auto"   — "pallas" on TPU, "xla" elsewhere
_STRATEGY = "auto"


def set_strategy(mode: str) -> None:
    global _STRATEGY
    assert mode in ("auto", "pallas", "xla", "fused")
    _STRATEGY = mode


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas() -> bool:
    """Pallas tiers are selected on TPU only: interpret-mode kernels embedded
    in large jitted graphs are pathological on the CPU backend, so off-TPU the
    composition path always runs XLA (kernels are interpret-tested standalone
    by tests/test_pallas_kernels.py / test_pallas_tower.py)."""
    return _STRATEGY in ("auto", "pallas", "fused") and _on_tpu()


def _use_fused() -> bool:
    """The fused tower kernels are a TPU-only tier: interpret-mode kernels
    embedded in the full jitted pairing graph are pathological on the CPU
    backend (their standalone bit-exactness is proven by
    tests/test_pallas_tower.py in interpret mode); off-TPU a "fused" strategy
    falls back to the XLA composition path for tower ops."""
    return _STRATEGY == "fused" and _on_tpu()


def _fused_interpret() -> bool:
    """Interpret mode for the fused tower kernels off-TPU (the sanitizer tier
    of SURVEY.md §5; exercised by direct kernel calls in tests)."""
    return not _on_tpu()

# Static JAX constants (created lazily per backend by closure over np arrays).
_P_NP = C.P_LIMBS
_CSUB_NP = C.CSUB_LIMBS
_NEGC_NP = C.NEGC_LIMBS
_TOEP_PPRIME = C.TOEP_PPRIME_MODR
_TOEP_P = C.TOEP_P

# value-level bounds (exact Python ints, statically tracked)
_P = C.P
_RP = (1 << C.R_BITS) * _P  # Montgomery input ceiling

#: Stored elements are *weakly reduced*: digits <= SEMI_DIG, value < SEMI_VAL
#: (the scan-free TPU kernels output < ~1.2p; the XLA path outputs < p).
#: Equality/sign/export sites canonicalize first (fp.canonicalize).
SEMI_DIG = C.SEMI_DIG  # 258
SEMI_VAL = C.SEMI_VAL  # 1.25 p

# derived digit-widths of the Montgomery pipeline (for NRED = 51: 99 / 100)
_NT = -(-(C.R_BITS + 381) // LIMB_BITS)  # digits holding T < R*p
_NS = _NT + 1  # digits holding T + m*p < 2*R*p


# ---------------------------------------------------------------------------
# Host-side encode/decode
# ---------------------------------------------------------------------------


def encode(values, mont: bool = True) -> np.ndarray:
    """Python ints (nested lists ok) -> limb array (..., NLIMBS), Montgomery form."""
    arr = np.asarray(values, dtype=object)
    out = np.zeros(arr.shape + (NLIMBS,), dtype=np.int32)
    for idx in np.ndindex(arr.shape):
        v = int(arr[idx]) % _P
        if mont:
            v = v * (1 << C.R_BITS) % _P
        out[idx] = C.int_to_limbs(v, NLIMBS)
    return out


def decode(limbs, mont: bool = True):
    """Limb array (..., NLIMBS) -> object ndarray of Python ints (standard form)."""
    arr = np.asarray(limbs)
    shape = arr.shape[:-1]
    out = np.empty(shape, dtype=object)
    rinv = pow(1 << C.R_BITS, -1, _P)
    for idx in np.ndindex(shape):
        v = C.limbs_to_int(arr[idx])
        if mont:
            v = v * rinv % _P
        out[idx] = v
    return out if shape else out[()]


# ---------------------------------------------------------------------------
# Wide: lazy signed-column accumulator with static bounds
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class Wide:
    """Unreduced value as signed int32 columns: value = sum cols[i] * 2^(8i).

    Static metadata (exact Python-int bounds) rides along so every operation
    can assert the f32/int32 exactness invariants at trace time.
    """

    cols: jnp.ndarray  # (..., K) int32
    col_lo: int  # per-column lower bound
    col_hi: int  # per-column upper bound
    val_lo: int  # value lower bound
    val_hi: int  # value upper bound

    def tree_flatten(self):
        return (self.cols,), (self.col_lo, self.col_hi, self.val_lo, self.val_hi)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def ncols(self) -> int:
        return self.cols.shape[-1]

    def __add__(self, o: "Wide") -> "Wide":
        a, b = _pad_match(self.cols, o.cols)
        return Wide(
            a + b,
            self.col_lo + o.col_lo,
            self.col_hi + o.col_hi,
            self.val_lo + o.val_lo,
            self.val_hi + o.val_hi,
        )

    def __sub__(self, o: "Wide") -> "Wide":
        a, b = _pad_match(self.cols, o.cols)
        return Wide(
            a - b,
            self.col_lo - o.col_hi,
            self.col_hi - o.col_lo,
            self.val_lo - o.val_hi,
            self.val_hi - o.val_lo,
        )

    def double(self) -> "Wide":
        return Wide(
            self.cols * 2, 2 * self.col_lo, 2 * self.col_hi, 2 * self.val_lo, 2 * self.val_hi
        )

    def scale_small(self, k: int) -> "Wide":
        """Multiply by a small static non-negative integer (column scaling)."""
        assert k >= 0
        return Wide(self.cols * k, k * self.col_lo, k * self.col_hi,
                    k * self.val_lo, k * self.val_hi)

    def shift_bias(self, k_p2: int) -> "Wide":
        """Add the constant k_p2 * p^2 (a multiple of p) to make the value
        non-negative before Montgomery reduction."""
        v = k_p2 * _P * _P
        ncols = max(self.ncols, (v.bit_length() + LIMB_BITS - 1) // LIMB_BITS)
        return self + _wide_const(v, ncols)


def _pad_match(a: jnp.ndarray, b: jnp.ndarray):
    k = max(a.shape[-1], b.shape[-1])
    return _pad_to(a, k), _pad_to(b, k)


def _pad_to(x: jnp.ndarray, k: int) -> jnp.ndarray:
    if x.shape[-1] == k:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k - x.shape[-1])]
    return jnp.pad(x, pad)


def _wide_const(value: int, ncols: int) -> Wide:
    limbs = C.int_to_limbs(value, ncols)
    return Wide(jnp.asarray(limbs), 0, int(limbs.max()), value, value)


# ---------------------------------------------------------------------------
# Convolution (limb products)
# ---------------------------------------------------------------------------

_ONEHOT_CACHE: dict = {}


def _onehot(na: int, nb: int) -> np.ndarray:
    key = (na, nb)
    if key not in _ONEHOT_CACHE:
        _ONEHOT_CACHE[key] = C.onehot_conv_matrix(na, nb)
    return _ONEHOT_CACHE[key]


def _plane_matmul(x: jnp.ndarray, s_bf16: jnp.ndarray, x_max: int,
                  nterms: int) -> jnp.ndarray:
    """Exact x @ s for non-negative int32 x (entries <= x_max) and a constant
    0/1-or-small-digit matrix s, as SINGLE-PASS bf16 MXU matmuls.

    bf16 represents integers in [0, 256] exactly and the MXU accumulates in
    f32, so each 8-bit plane of x contributes one exact one-pass matmul
    (nterms * 255 * 255 < 2^24 keeps the f32 accumulation exact). This replaces
    precision=HIGHEST (six bf16 passes) with ceil(bits(x_max)/8) passes —
    the single biggest MXU-throughput lever of the limb core."""
    nplanes = max(1, (int(x_max).bit_length() + 7) // 8)
    total = None
    rem = x
    for k in range(nplanes):
        plane = (rem & MASK) if k + 1 < nplanes else rem
        part = jnp.einsum(
            "...k,kj->...j", plane.astype(jnp.bfloat16), s_bf16,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        total = part if total is None else total + (part << (LIMB_BITS * k))
        if k + 1 < nplanes:
            rem = rem >> LIMB_BITS
    return total


_BF16_MAT_CACHE: dict = {}


def _bf16_const(mat: np.ndarray, tag) -> np.ndarray:
    # cached as a NUMPY bf16 array (a jnp array materialized inside a jit
    # trace would leak a tracer through the cache)
    if tag not in _BF16_MAT_CACHE:
        assert mat.max() <= 256, "constant matrix entries exceed bf16-exact range"
        import ml_dtypes

        _BF16_MAT_CACHE[tag] = mat.astype(np.float32).astype(ml_dtypes.bfloat16)
    return _BF16_MAT_CACHE[tag]


def conv(a: jnp.ndarray, b: jnp.ndarray, a_max: int = SEMI_DIG, b_max: int = SEMI_DIG,
         a_val: int = SEMI_VAL, b_val: int = SEMI_VAL) -> Wide:
    """Variable x variable limb convolution via outer product + one-hot matmul.

    a: (..., na), b: (..., nb) non-negative int32 limbs. The outer product is
    exact in f32 (a_max * b_max < 2^24, asserted); the one-hot contraction
    runs as exact single-pass bf16 planes (_plane_matmul).
    """
    na, nb = a.shape[-1], b.shape[-1]
    nterms = min(na, nb)
    hi = nterms * a_max * b_max
    if _use_pallas() and na == NLIMBS and nb == NLIMBS:
        assert hi < _I32_EXACT, (
            f"int32 exactness violated: {nterms}*{a_max}*{b_max} >= 2^31"
        )
        from .pallas import mont as _pm

        cols = _pm.conv(a, b, interpret=not _on_tpu())
        return Wide(cols, 0, hi, 0, a_val * b_val)
    assert hi < _F32_EXACT, (
        f"f32 exactness violated: {nterms}*{a_max}*{b_max} >= 2^24"
    )
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    outer = (af[..., :, None] * bf[..., None, :]).astype(jnp.int32)
    outer = outer.reshape(*outer.shape[:-2], na * nb)
    s = _bf16_const(_onehot(na, nb), ("onehot", na, nb))
    cols = _plane_matmul(outer, s, a_max * b_max, nterms)
    return Wide(cols, 0, hi, 0, a_val * b_val)


def conv_const(x: jnp.ndarray, toep: np.ndarray, x_max: int, n_const_terms: int) -> jnp.ndarray:
    """x (..., n_in) times a constant, as a Toeplitz matmul (exact bf16 planes)."""
    nterms = min(x.shape[-1], n_const_terms)
    assert nterms * x_max * 255 < _F32_EXACT
    s = _bf16_const(toep, ("toep", id(toep)))
    return _plane_matmul(x, s, x_max, nterms)


# ---------------------------------------------------------------------------
# Carry normalization
# ---------------------------------------------------------------------------


def _passes_needed(lo: int, hi: int) -> int:
    n = 0
    while lo < -1 or hi > 256:
        # after one pass: col in [min(0, lo>>8), 255 + max(0, hi>>8)]
        lo, hi = min(0, lo >> LIMB_BITS), 255 + max(0, hi >> LIMB_BITS)
        n += 1
        assert n < 8, "unbounded normalize"
    return n


def _carry_scan(v: jnp.ndarray):
    """Resolve residual carries for columns v in [-1, 256] via a 3-state
    carry-lookahead scan. Returns (carry_in, carry_out_total)."""
    fm1 = (v - 1) >> LIMB_BITS
    f0 = v >> LIMB_BITS
    fp1 = (v + 1) >> LIMB_BITS

    def combine(left, right):
        lm1, l0, lp1 = left
        rm1, r0, rp1 = right

        def sel(x):
            return jnp.where(x < 0, rm1, jnp.where(x > 0, rp1, r0))

        return sel(lm1), sel(l0), sel(lp1)

    _, g0, _ = jax.lax.associative_scan(combine, (fm1, f0, fp1), axis=-1)
    pad = [(0, 0)] * (g0.ndim - 1) + [(1, 0)]
    carry_in = jnp.pad(g0[..., :-1], pad)
    return carry_in, g0[..., -1]


def _shift_up(carry: jnp.ndarray) -> jnp.ndarray:
    """Move per-column carries one column up; the top carry is dropped (callers
    guarantee it is zero via guard columns, or want mod-2^(8K) semantics)."""
    return jnp.pad(carry[..., :-1], [(0, 0)] * (carry.ndim - 1) + [(1, 0)])


def _normalize_cols(cols: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Shift-add passes + 3-state carry-lookahead scan. Exact modulo 2^(8K)
    where K = cols.shape[-1] (top carries are dropped)."""
    for _ in range(_passes_needed(lo, hi)):
        cols = (cols & MASK) + _shift_up(cols >> LIMB_BITS)
        lo, hi = min(0, lo >> LIMB_BITS), 255 + max(0, hi >> LIMB_BITS)
    if lo < 0 or hi > 255:
        carry_in, _ = _carry_scan(cols)
        cols = (cols + carry_in) & MASK
    return cols


#: Guard columns appended inside normalize so intermediate carries compensated
#: by negative lower columns are never dropped (col_hi < 2^26 -> carries fit).
_GUARD = 3


def normalize(w: Wide, nout: int) -> jnp.ndarray:
    """Exact canonical base-256 digits of w's value, as (..., nout) int32.

    Requires 0 <= value < 2^(8*nout) (asserted from static bounds).
    """
    assert w.val_lo >= 0, f"normalize of possibly-negative value (lo={w.val_lo})"
    assert w.val_hi < 1 << (LIMB_BITS * nout), "normalize output width too small"
    assert -(1 << 30) < w.col_lo and w.col_hi < 1 << 30, "column bounds exceed int32 safety"
    if w.ncols > nout:
        raise ValueError("normalize cannot truncate columns")
    cols = _pad_to(w.cols, nout + _GUARD)
    return _normalize_cols(cols, w.col_lo, w.col_hi)[..., :nout]


def normalize_mod_r(w: Wide, nout: int) -> jnp.ndarray:
    """Canonical digits of (value mod 2^(8*nout)): carries beyond column
    nout-1 are discarded, which is exactly the modular truncation."""
    cols = _pad_to(w.cols, nout)[..., :nout]
    return _normalize_cols(cols, w.col_lo, w.col_hi)


# ---------------------------------------------------------------------------
# Montgomery reduction and multiplication
# ---------------------------------------------------------------------------


def _semi_pass_count(lo: int, hi: int) -> int:
    """Static shift-add passes until digits lie in [0, 257] (non-negative
    inputs); mirrors ops/pallas/mont.py _static_pass_count."""
    n = 0
    while lo < -1 or hi > 257:
        lo, hi = min(0, lo >> LIMB_BITS), 255 + max(0, hi >> LIMB_BITS)
        n += 1
        assert n < 9
    return n


def _semi_passes(cols: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Static shift-add passes; value-preserving mod 2^(8*K). No carry scan."""
    for _ in range(_semi_pass_count(lo, hi)):
        cols = (cols & MASK) + _shift_up(cols >> LIMB_BITS)
    return cols


#: BIAS_DIGITS (K_BIAS * p, digits >= 2^28 on the first NBIAS columns) padded
#: to the _NS-column working width of the scan-free reduction.
def _bias_cols() -> np.ndarray:
    out = np.zeros(_NS, dtype=np.int32)
    out[: C.NBIAS] = C.BIAS_DIGITS
    return out


_BIAS_COLS = _bias_cols()
_QW_COLS = C.QMOD_WEIGHTS[:_NS].copy()  # digit weights 2^(8k) mod QMOD, k < NRED


def _scanfree_ok(w: "Wide") -> bool:
    return (
        w.ncols <= C.NBIAS
        and w.val_lo > -C.BIAS_VALUE
        and w.val_hi + C.BIAS_VALUE < _RP
        and -C.BIAS_FLOOR < w.col_lo
        and w.col_hi + C.BIAS_FLOOR + 255 < (1 << 31)  # cols+bias stay int32
    )


def _mont_reduce_scanfree(w: "Wide") -> jnp.ndarray:
    """Scan-free Montgomery reduction (XLA mirror of the Pallas kernel
    ops/pallas/mont.py mont_reduce_lanes — bit-identical): the constant bias
    row K_BIAS*p clears column- and value-level negativity, static shift-add
    passes replace the carry-lookahead scan, the two constant products run as
    exact f32 matmuls, and the low-part quotient (provably 0 or R) is decided
    by a digit-weighted sum mod 65521. Output is weakly reduced: digits <=
    SEMI_DIG (258), value < 1.25 p."""
    cols = _pad_to(w.cols, _NS)
    t = _semi_passes(cols + jnp.asarray(_BIAS_COLS), min(w.col_lo, 0),
                     w.col_hi + C.BIAS_FLOOR + 255)
    t_low = t[..., :NRED]
    m = jnp.einsum(
        "...k,kj->...j", t_low.astype(jnp.float32),
        jnp.asarray(_TOEP_PPRIME, dtype=jnp.float32),
        precision=_HI,
    ).astype(jnp.int32)
    m = _semi_passes(m, 0, NRED * 257 * 255)  # top carries drop: mod R, exact
    u = jnp.einsum(
        "...k,kj->...j", m.astype(jnp.float32),
        jnp.asarray(_TOEP_P, dtype=jnp.float32),
        precision=_HI,
    ).astype(jnp.int32)
    s = _semi_passes(t + _pad_to(u, _NS), 0, 257 + NRED * 257 * 255)
    qsum = jnp.sum(s * jnp.asarray(_QW_COLS), axis=-1)
    q = ((qsum % C.QMOD) == C.R_MOD_QMOD).astype(jnp.int32)
    res = s[..., NRED : NRED + NLIMBS]
    return res.at[..., 0].add(q)


def _cond_subtract_p(res: jnp.ndarray) -> jnp.ndarray:
    """res (..., n) canonical limbs, value < 2p: return canonical value mod p."""
    n = res.shape[-1]
    csub = _pad_to(jnp.asarray(_CSUB_NP), max(NRED, n))
    d_w = Wide(_pad_to(res, max(NRED, n)) + csub, 0, 511,
               (1 << C.R_BITS) - _P, (1 << C.R_BITS) + 2 * _P)
    d = normalize(d_w, NRED + 1)
    ge = d[..., NRED:NRED + 1]  # 1 iff res >= p
    return jnp.where(ge == 1, d[..., :NLIMBS], res[..., :NLIMBS])


def mont_reduce(w: Wide) -> jnp.ndarray:
    """Montgomery reduction: value*R^-1 mod p, canonical 48 limbs in [0, p).

    SOS with constant-matrix products by p' and p (the TPU replacement for the
    reference's per-mul nonnative reduction gadgets).
    """
    if _use_pallas() and w.ncols <= C.NBIAS:
        # the kernel's constant bias row absorbs both column- and value-level
        # negativity; no caller-side p^2 bias needed
        assert w.val_lo > -C.BIAS_VALUE, "value negativity exceeds kernel bias"
        assert w.val_hi + C.BIAS_VALUE < _RP, "mont_reduce input exceeds R*p"
        assert -C.BIAS_FLOOR < w.col_lo
        assert w.col_hi + C.BIAS_FLOOR + 255 < (1 << 31)
        from .pallas import mont as _pm

        return _pm.mont_reduce(w.cols, w.col_lo, w.col_hi,
                               interpret=not _on_tpu())
    if _scanfree_ok(w):
        # bit-identical to the Pallas kernel; no carry-lookahead scan, so each
        # instance compiles ~7x faster than the exact path below
        return _mont_reduce_scanfree(w)
    if w.val_lo < 0:
        w = nonneg(w)
    assert w.val_hi < _RP, "mont_reduce input exceeds R*p"
    t = normalize(w, _NT)
    t_low = t[..., :NRED]
    m_cols = conv_const(t_low, _TOEP_PPRIME, 255, NRED)
    m_w = Wide(m_cols, 0, NRED * 255 * 255, 0, (1 << C.R_BITS) ** 2)
    m = normalize_mod_r(m_w, NRED)
    u_cols = conv_const(m, _TOEP_P, 255, NLIMBS)
    s = Wide(
        _pad_to(t, _NS) + _pad_to(u_cols, _NS),
        0,
        255 + NRED * 255 * 255,
        w.val_lo,
        w.val_hi + (1 << C.R_BITS) * _P,
    )
    sn = normalize(s, _NS)
    res = sn[..., NRED : NRED + NLIMBS]
    return _cond_subtract_p(res)


def as_wide(a: jnp.ndarray, a_max: int = 255, a_val: int = _P - 1) -> Wide:
    """Embed limbs as a Wide with NO domain change.

    CAUTION: a Wide produced by conv(x, y) of two stored Montgomery values is
    in the *product domain* (mont_reduce divides by R, leaving one R factor).
    Mixing as_wide(stored) with product wides changes the meaning — use
    to_wide_mont for that; as_wide is for standard-form column juggling only.
    """
    return Wide(a, 0, a_max, 0, a_val)


def to_wide_mont(a: jnp.ndarray, a_max: int = 255) -> Wide:
    """Embed stored Montgomery limbs into the conv-product domain:
    W = a * (R mod p), so mont_reduce(W + conv(x, y)) decodes consistently."""
    cols = conv_const(a, C.TOEP_ONE_MONT, a_max, NLIMBS)
    a_val_max = a_max * (((1 << (LIMB_BITS * NLIMBS)) - 1) // MASK)  # limb bound -> value bound
    return Wide(cols, 0, NLIMBS * a_max * 255, 0, a_val_max * C.ONE_MONT_INT)


def nonneg(w: Wide) -> Wide:
    """Shift w by the smallest multiple of p making its value provably >= 0."""
    if w.val_lo >= 0:
        return w
    k = (-w.val_lo + _P - 1) // _P
    v = k * _P
    ncols = max(w.ncols, (v.bit_length() + LIMB_BITS - 1) // LIMB_BITS)
    return w + _wide_const(v, ncols)


def mont_reduce_stack(wides: list[Wide], axis: int = -2) -> jnp.ndarray:
    """Reduce k Wides in one batched Montgomery reduction.

    Returns (..., k, NLIMBS): the stacked canonical results. This is the
    "stack independent Fp ops into one kernel invocation" move that keeps the
    MXU fed (SURVEY.md §7 design stance).
    """
    ncols = max(w.ncols for w in wides)
    cols = jnp.stack([_pad_to(w.cols, ncols) for w in wides], axis=axis)
    merged = Wide(
        cols,
        min(w.col_lo for w in wides),
        max(w.col_hi for w in wides),
        min(w.val_lo for w in wides),
        max(w.val_hi for w in wides),
    )
    return mont_reduce(merged)


#: Witness-trace sink (models/witness.py): when set, selected ops append
#: (op_name, inputs..., output) rows — the TPU analogue of the reference's
#: SimpleGenerator hint rows (src/fields/fq_target.rs:316-355).
_witness_sink = None


def _record(op: str, *tensors):
    if _witness_sink is None:
        return
    if any(isinstance(t, jax.core.Tracer) for t in tensors):
        # Under jit: record at *runtime* through an ordered host callback. The
        # callback reads the module-level sink dynamically, so a cached
        # executable re-run outside trace mode records nothing (and a re-trace
        # with a fresh sink records into the fresh one).
        from functools import partial as _partial

        from jax.experimental import io_callback

        io_callback(_partial(_record_cb, op), None, *tensors, ordered=True)
    else:
        _witness_sink.append((op, tensors))


def _record_cb(op: str, *vals):
    if _witness_sink is not None:
        _witness_sink.append((op, tuple(np.asarray(v) for v in vals)))


def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a*b*R^-1) mod p on canonical Montgomery operands — the Fp product."""
    out = mont_reduce(conv(a, b))
    _record("mul", a, b, out)
    return out


def mont_square(a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(a, a)


# ---------------------------------------------------------------------------
# Canonical ring ops
# ---------------------------------------------------------------------------


def zeros(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, NLIMBS), dtype=jnp.int32)


def one_mont(batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(C.ONE_MONT), (*batch_shape, NLIMBS))


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b, weakly reduced (inputs < SEMI_VAL each -> output < SEMI_VAL)."""
    s = Wide(a + b, 0, 2 * SEMI_DIG, 0, 2 * SEMI_VAL)
    return _cond_subtract_p(_cond_subtract_p(normalize(s, NRED)))


def neg(b: jnp.ndarray) -> jnp.ndarray:
    """2p - b mod-p-correct negation for weakly-reduced b (< 2p); branch-free.
    Output value <= p (the value-zero input maps to the representation p)."""
    twop = _pad_to(jnp.asarray(C.TWOP_LIMBS), NRED)
    cols = twop + (MASK - _pad_to(b, NRED))
    cols = cols.at[..., 0].add(1)
    # value = R + (2p - b) with 2p - b in (0, 2p]; drop the R carry digit
    w = Wide(cols, 0, MASK + int(C.TWOP_LIMBS.max()) + 1,
             1 << C.R_BITS, (1 << C.R_BITS) + 2 * _P)
    n = normalize(w, NRED + 1)[..., :NLIMBS]
    return _cond_subtract_p(n)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return add(a, neg(b))


def neg_relaxed(b: jnp.ndarray):
    """NEGC - b: represents -b (mod p) with digits <= SEMI_DIG + 256, no carries.

    Returns (limbs, limb_max, val_max) for use as a conv operand."""
    return jnp.asarray(_NEGC_NP) - b, SEMI_DIG + 256, C.NEG_K * _P


def canonicalize(a: jnp.ndarray) -> jnp.ndarray:
    """Exact canonical representative in [0, p) of a weakly-reduced element."""
    w = Wide(a, 0, SEMI_DIG, 0, 2 * _P - 1)
    return _cond_subtract_p(normalize(w, NRED))


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k mod p for small static k >= 0, by double-and-add on canonical limbs."""
    assert k >= 0
    if k == 0:
        return jnp.zeros_like(a)
    result = None
    base = a
    while k:
        if k & 1:
            result = base if result is None else add(result, base)
        k >>= 1
        if k:
            base = add(base, base)
    return result


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask (...,) or (...,1) int/bool: a where true else b."""
    m = mask[..., None] if mask.ndim == a.ndim - 1 else mask
    return jnp.where(m != 0, a, b)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canonicalize(a) == 0, axis=-1)


def is_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canonicalize(a) == canonicalize(b), axis=-1)


# ---------------------------------------------------------------------------
# Fixed-exponent powers: inverse, sqrt, legendre, pow
# ---------------------------------------------------------------------------


def pow_static(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent via an MSB-first square-and-multiply lax.scan over the static
    bit table (the batched analogue of the reference's NAF pow,
    src/fields/fq_target.rs:243-260). Montgomery in, Montgomery out."""
    if exponent == 0:
        return one_mont(a.shape[:-1])
    bits = np.array(
        [(exponent >> i) & 1 for i in range(exponent.bit_length() - 1, -1, -1)],
        dtype=np.int32,
    )

    def body(acc, bit):
        sq = mont_mul(acc, acc)
        if _witness_sink is not None:
            # witness mode: select (not cond) so the recording callback's
            # effect is identical on both paths (cond branches must agree)
            return select(bit, mont_mul(sq, a), sq), None
        # cond (not select): the multiply runs only on set bits at runtime
        return jax.lax.cond(bit != 0, lambda s: mont_mul(s, a), lambda s: s, sq), None

    # first bit is the leading 1: start from a
    acc, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
    return acc


def get_naf(exponent: int) -> list[int]:
    """Non-adjacent form of a nonnegative integer, LSB first, digits in
    {-1, 0, 1} (host-side; parity with reference src/fields/helpers.rs:197-239).
    Property: sum(d * 2^i) == exponent and no two adjacent nonzero digits."""
    assert exponent >= 0
    naf = []
    e = exponent
    while e > 0:
        if e & 1:
            d = 2 - (e & 3)  # 1 if e % 4 == 1 else -1
            e -= d
        else:
            d = 0
        naf.append(d)
        e >>= 1
    return naf


def pow_naf(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent via an MSB-first scan over the static NAF digit table
    (reference pow_fq, src/fields/helpers.rs:176-195). Uses one Fermat inverse
    for the -1 digits. On TPU this costs the same as pow_static (masked
    multiplies execute either way); it exists for API parity and for the
    witness-trace mode, whose rows mirror the reference's NAF schedule."""
    if exponent == 0:
        return one_mont(a.shape[:-1])
    naf = get_naf(exponent)[::-1]  # MSB first; leading digit is 1
    a_inv = inv(a)
    digits = jnp.asarray(np.array(naf[1:], dtype=np.int32))

    def body(acc, d):
        sq = mont_mul(acc, acc)
        out = jax.lax.switch(
            d + 1,
            [lambda s: mont_mul(s, a_inv), lambda s: s, lambda s: mont_mul(s, a)],
            sq,
        )
        return out, None

    acc, _ = jax.lax.scan(body, a, digits)
    return acc


def pow_dynamic(a: jnp.ndarray, e_bits: jnp.ndarray) -> jnp.ndarray:
    """a^e for a *runtime* exponent — the API-parity hole of pow_static: the
    reference's pow takes the exponent as witness data at proving time
    (src/fields/fq_target.rs:243-260 NAF pow over runtime bits).

    e_bits: (..., NBITS) little-endian bit tensor (0/1 int32), broadcastable
    against a's batch shape. One masked square-and-multiply lax.scan over the
    bit axis — uniform control flow, the multiply is select-masked per
    instance (batch elements may have different exponents).
    """
    bits = jnp.moveaxis(e_bits.astype(jnp.int32), -1, 0)  # (NBITS, ...)
    batch = jnp.broadcast_shapes(a.shape[:-1], bits.shape[1:])
    acc0 = one_mont(batch)
    base0 = jnp.broadcast_to(a, (*batch, NLIMBS))

    def body(carry, bit):
        acc, base = carry
        acc = select(bit, mont_mul(acc, base), acc)
        return (acc, mont_square(base)), None

    (acc, _), _ = jax.lax.scan(body, (acc0, base0), bits)
    return acc


def bits_of(exponents, nbits: int = 381) -> np.ndarray:
    """Host-side helper: ints -> (..., nbits) little-endian bit array for
    pow_dynamic (the encode step of a runtime exponent witness)."""
    arr = np.asarray(exponents, dtype=object)
    out = np.zeros(arr.shape + (nbits,), dtype=np.int32)
    for idx in np.ndindex(arr.shape):
        e = int(arr[idx])
        assert 0 <= e < (1 << nbits)
        for j in range(nbits):
            out[idx + (j,)] = (e >> j) & 1
    return out


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^(p-2); maps 0 -> 0 (the reference's inv0 convention,
    src/fields/fq2_target.rs:207-225, for free)."""
    out = pow_static(a, _P - 2)
    _record("inv", a, out)
    return out


def sqrt(a: jnp.ndarray) -> jnp.ndarray:
    """Candidate square root a^((p+1)/4) (p = 3 mod 4). Valid iff out^2 == a."""
    return pow_static(a, (_P + 1) // 4)


def legendre(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p-1)/2) in Montgomery form: one_mont / neg(one_mont) / 0."""
    return pow_static(a, (_P - 1) // 2)


def is_square(a: jnp.ndarray) -> jnp.ndarray:
    """True for QRs and zero (reference src/fields/fq_target.rs:262-281)."""
    leg = legendre(a)
    return ~is_equal(leg, neg(one_mont(a.shape[:-1])))


def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> standard form limbs (mont_mul by 1)."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one)


def to_mont(a_std: jnp.ndarray) -> jnp.ndarray:
    """Standard-form limbs -> Montgomery form (mont_mul by R^2)."""
    return mont_mul(a_std, jnp.asarray(C.R2_LIMBS))


def sgn0(a: jnp.ndarray) -> jnp.ndarray:
    """RFC-9380 sign bit of the standard-form value (reference
    src/fields/fq_target.rs:215-219 semantics)."""
    return canonicalize(from_mont(a))[..., 0] & 1


def sqrt_with_sgn(a: jnp.ndarray, sgn: jnp.ndarray) -> jnp.ndarray:
    """Square root with prescribed sign bit (reference fq_target.rs:223-240):
    of the two roots +-s, return the one with sgn0 == sgn (assumes a is a QR)."""
    s = sqrt(a)
    want = sgn0(s) == (sgn & 1)
    out = select(want.astype(jnp.int32), s, neg(s))
    _record("sqrt", a, sgn, out)
    return out


def div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a / b = a * b^-1 (reference fq_target.rs:209-213; b == 0 -> 0 via the
    inv0 convention)."""
    return mont_mul(a, inv(b))


def connect(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """The builder-equality constraint (reference fq_target.rs:88-90
    connect_nonnative): records an equality row into the witness trace —
    verified by models/witness.check_trace like every other constraint kind —
    and returns the equality mask for eager callers. Works at every tower
    level: component axes fold into the row batch."""
    _record("connect", a, b)
    eq = canonicalize(a) == canonicalize(b)
    while eq.ndim > 1:
        eq = jnp.all(eq, axis=-1)
    return eq
