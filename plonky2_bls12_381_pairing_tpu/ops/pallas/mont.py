"""Fused Pallas TPU kernels for Montgomery Fp arithmetic.

The XLA composition path (ops/fp.py) materializes every convolution's partial
products and every normalize pass through HBM — measured ~100ns/Fp-mul on v5e,
HBM-roundtrip-bound. These kernels keep the whole multiply (limb convolution,
carry normalization, Montgomery reduction, conditional subtract) in VMEM:
traffic drops to the 192-byte operands/result, and the VPU does the ~20K
lane-ops per element back to back.

In-kernel layout: batch on sublanes (block rows), limbs on lanes (padded to
128). Convolution is a 48-step unrolled roll-accumulate (static shifts);
multiplications by the constants p' and p use precomputed shifted-constant
matrices (pure broadcast-MACs, no rolls); carry normalization runs shift-add
passes to a fixpoint via `lax.while_loop` (exact; converges in ~3-4 passes on
random limbs, data-dependent only in timing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C

NLIMBS = C.NLIMBS  # 48
NRED = C.NRED  # 51
LANES = 128
MASK = 255


def _shifted_const_matrix(limbs: np.ndarray, n_shifts: int, n_cols: int) -> np.ndarray:
    """M[j, k] = limbs[k - j] (0 outside): row j is the constant shifted by j,
    truncated to n_cols columns; padded to LANES lanes."""
    m = np.zeros((n_shifts, LANES), dtype=np.int32)
    for j in range(n_shifts):
        for d in range(len(limbs)):
            if j + d < n_cols:
                m[j, j + d] = int(limbs[d])
    return m


#: p' shifted rows, truncated mod R (columns < NRED), as (128, 128) f32 for
#: the in-kernel MXU dot.
_PPRIME_SHIFTS = np.zeros((LANES, LANES), dtype=np.float32)
_PPRIME_SHIFTS[:NRED] = _shifted_const_matrix(C.PPRIME_LIMBS, NRED, NRED).astype(np.float32)
#: p shifted rows, full width (columns < NRED + NLIMBS - 1), f32.
_P_SHIFTS = np.zeros((LANES, LANES), dtype=np.float32)
_P_SHIFTS[:NRED] = _shifted_const_matrix(C.P_LIMBS, NRED, NRED + NLIMBS - 1).astype(np.float32)
#: 2^(8*NRED) - p padded to LANES (conditional-subtract constant, XLA-path parity).
_CSUB_PAD = np.zeros((LANES,), dtype=np.int32)
_CSUB_PAD[:NRED] = C.CSUB_LIMBS
#: The column-bias row: K_BIAS * p with digits >= BIAS_FLOOR (2^30) on the
#: first NBIAS (95) lanes; added to signed-column inputs to make every column
#: non-negative.
_BIAS_ROW = np.zeros((1, LANES), dtype=np.int32)
_BIAS_ROW[0, :C.NBIAS] = C.BIAS_DIGITS
#: Digit weights 2^(8k) mod QMOD on lanes < NRED (zero elsewhere).
_QW_ROW = C.QMOD_WEIGHTS.reshape(1, LANES).astype(np.int32)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _shift_up_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Move each lane's value one lane higher; lane 0 becomes 0 (top dropped)."""
    rolled = pltpu.roll(x, 1, axis=x.ndim - 1)
    return jnp.where(_lane_iota(x.shape) == 0, 0, rolled)


# (A while_loop-to-fixpoint carry normalizer was tried and removed: Mosaic
# compiles data-dependent loops pathologically — minutes of compile, pipeline
# stalls. The hot path uses the static `semi_passes` + scan-free reduction.)


def _static_pass_count(lo: int, hi: int) -> int:
    n = 0
    while lo < -1 or hi > 257:
        lo, hi = min(0, lo >> 8), 255 + max(0, hi >> 8)
        n += 1
        assert n < 9
    return n


def semi_passes(cols: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Static shift-add passes until digits lie in [-1, 257] ([0, 257] for
    non-negative inputs). Value-preserving mod 2^(8*LANES); no data-dependent
    control flow."""
    for _ in range(_static_pass_count(lo, hi)):
        cols = (cols & MASK) + _shift_up_lanes(cols >> 8)
    return cols


def _conv48_unrolled(a: jnp.ndarray, b_pad: jnp.ndarray) -> jnp.ndarray:
    """sum_i a[:, i] * shift_i(b): 48 static-roll MACs with 4-way ILP.
    a: (TB, 48)-active in (TB, LANES); b_pad: (TB, LANES) with b in lanes
    0..47. Result columns in lanes 0..94; products accumulate exactly in int32
    (callers guarantee nterms * a_max * b_max < 2^31)."""
    accs = [jnp.zeros_like(b_pad) for _ in range(4)]
    bs = [pltpu.roll(b_pad, k, axis=1) if k else b_pad for k in range(4)]
    for i in range(0, NLIMBS, 4):
        for k in range(4):
            accs[k] = accs[k] + a[:, i + k][:, None] * bs[k]
        if i + 4 < NLIMBS:
            bs = [pltpu.roll(x, 4, axis=1) for x in bs]
    return (accs[0] + accs[1]) + (accs[2] + accs[3])


def mont_reduce_lanes(tcols: jnp.ndarray, pp_shifts: jnp.ndarray,
                      p_shifts: jnp.ndarray, bias: jnp.ndarray,
                      qw: jnp.ndarray, col_lo: int = 0,
                      col_hi: int = NLIMBS * 255 * 255) -> jnp.ndarray:
    """Scan-free Montgomery reduction of lane-columns to a weakly-reduced
    48-digit result (digits <= 257+1, value < 1.25 p) in lanes 0..47.

    Fully static: the constant bias row (K_BIAS * p, digits >= 2^26) makes all
    columns non-negative, so a static number of shift-add passes brings digits
    into [0, 257]; the two constant products run as exact f32 MXU dots; the
    low-part quotient (provably 0 or R) is decided by a digit-weighted sum
    mod 65521. Requires col_lo > -BIAS_FLOOR and
    value + K_BIAS*p < R*p (asserted by callers)."""
    assert col_lo > -C.BIAS_FLOOR, "column negativity exceeds the bias row"
    assert col_hi + C.BIAS_FLOOR + 255 < (1 << 31)  # cols+bias stay int32
    lane = _lane_iota(tcols.shape)
    t = semi_passes(tcols + bias, 0, col_hi + C.BIAS_FLOOR + 255)
    t_low = jnp.where(lane < NRED, t, 0)
    m_cols = jnp.dot(t_low.astype(jnp.float32), pp_shifts,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    m = jnp.where(lane < NRED, semi_passes(m_cols, 0, NRED * 257 * 255), 0)
    u = jnp.dot(m.astype(jnp.float32), p_shifts,
                preferred_element_type=jnp.float32).astype(jnp.int32)
    s = semi_passes(t + u, 0, 257 + NRED * 257 * 255)
    # low NRED lanes hold a value in {0, R}; q = [it is R]
    qsum = jnp.sum(s * qw, axis=-1, keepdims=True)
    q = ((qsum % C.QMOD) == C.R_MOD_QMOD).astype(jnp.int32)
    res = pltpu.roll(s, LANES - NRED, axis=1)
    res = jnp.where(lane < NLIMBS, res, 0)
    return res + q * (lane == 0).astype(jnp.int32)


def _mont_mul_kernel(pp_ref, p_ref, bias_ref, qw_ref, a_ref, b_ref, out_ref):
    lane = _lane_iota(a_ref.shape)
    a = jnp.where(lane < NLIMBS, a_ref[...], 0)
    b = jnp.where(lane < NLIMBS, b_ref[...], 0)
    cols = _conv48_unrolled(a, b)
    out_ref[...] = mont_reduce_lanes(
        cols, pp_ref[...], p_ref[...], bias_ref[...], qw_ref[...],
        0, NLIMBS * C.SEMI_DIG * C.SEMI_DIG,
    )


def _conv_kernel(a_ref, b_ref, out_ref):
    out_ref[...] = _conv48_unrolled(a_ref[...], b_ref[...])


def _make_reduce_kernel(col_lo: int, col_hi: int):
    def kernel(pp_ref, p_ref, bias_ref, qw_ref, cols_ref, out_ref):
        out_ref[...] = mont_reduce_lanes(
            cols_ref[...], pp_ref[...], p_ref[...], bias_ref[...], qw_ref[...],
            col_lo, col_hi,
        )

    return kernel


def _flatten_pad(x: jnp.ndarray, block: int):
    """(..., k) -> ((N_padded, LANES), batch_shape, N) with zero padding."""
    batch_shape = x.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    npad = (-n) % block
    flat = x.reshape(n, x.shape[-1])
    flat = jnp.pad(flat, ((0, npad), (0, LANES - x.shape[-1])))
    return flat, batch_shape, n


_CONST_SPECS = [
    pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
]


def _consts():
    return (jnp.asarray(_PPRIME_SHIFTS), jnp.asarray(_P_SHIFTS),
            jnp.asarray(_BIAS_ROW), jnp.asarray(_QW_ROW))


def conv(a: jnp.ndarray, b: jnp.ndarray, block: int = 256,
         interpret: bool = False) -> jnp.ndarray:
    """Batched 48x48 limb convolution fully in VMEM: (..., 48) x (..., 48) ->
    (..., 95) int32 columns. int32 accumulation: exact while
    48 * a_max * b_max < 2^31 (callers assert)."""
    af, batch_shape, n = _flatten_pad(a, block)
    bf, _, _ = _flatten_pad(b, block)
    out = pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct(af.shape, jnp.int32),
        grid=(af.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(af, bf)
    return out[:n, : 2 * NLIMBS - 1].reshape(*batch_shape, 2 * NLIMBS - 1)


def mont_reduce(cols: jnp.ndarray, col_lo: int = 0,
                col_hi: int = NLIMBS * 255 * 255, block: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """Batched scan-free Montgomery reduction fully in VMEM:
    (..., K<=NBIAS) signed int32 columns (value in [-K_BIAS*p.., R*p-K_BIAS*p),
    col_lo > -2^26) -> weakly-reduced (..., 48) with digits <= 258."""
    cf, batch_shape, n = _flatten_pad(cols, block)
    out = pl.pallas_call(
        _make_reduce_kernel(col_lo, col_hi),
        out_shape=jax.ShapeDtypeStruct(cf.shape, jnp.int32),
        grid=(cf.shape[0] // block,),
        in_specs=_CONST_SPECS + [
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*_consts(), cf)
    return out[:n, :NLIMBS].reshape(*batch_shape, NLIMBS)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def mont_mul(a: jnp.ndarray, b: jnp.ndarray, block: int = 256,
             interpret: bool = False) -> jnp.ndarray:
    """Fused batched Montgomery multiply: (..., 48) x (..., 48) -> (..., 48).

    Equivalent to ops/fp.py mont_mul (bit-exact), with the whole pipeline
    (convolution, normalizations, reduction, conditional subtract) in VMEM.
    """
    ap, batch_shape, n = _flatten_pad(a, block)
    bp, _, _ = _flatten_pad(b, block)
    out = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct(ap.shape, jnp.int32),
        grid=(ap.shape[0] // block,),
        in_specs=_CONST_SPECS + [
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*_consts(), ap, bp)
    return out[:n, :NLIMBS].reshape(*batch_shape, NLIMBS)
