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
NRED = C.NRED  # 49
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
#: p shifted rows, full width (columns < NRED + NLIMBS - 1 = 96), f32.
_P_SHIFTS = np.zeros((LANES, LANES), dtype=np.float32)
_P_SHIFTS[:NRED] = _shifted_const_matrix(C.P_LIMBS, NRED, NRED + NLIMBS - 1).astype(np.float32)
#: 2^392 - p padded to LANES (conditional-subtract constant).
_CSUB_PAD = np.zeros((LANES,), dtype=np.int32)
_CSUB_PAD[:NRED] = C.CSUB_LIMBS


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _shift_up_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Move each lane's value one lane higher; lane 0 becomes 0 (top dropped)."""
    rolled = pltpu.roll(x, 1, axis=x.ndim - 1)
    return jnp.where(_lane_iota(x.shape) == 0, 0, rolled)


def normalize_lanes(cols: jnp.ndarray) -> jnp.ndarray:
    """Exact carry normalization of signed int32 lane-columns to base-256
    digits, mod 2^(8*LANES) (top carries drop off lane 127 — callers keep
    values narrower than the active width). while_loop to carry fixpoint."""

    def has_carry(c):
        return jnp.any(c >> 8 != 0)

    def pass_(c):
        return (c & MASK) + _shift_up_lanes(c >> 8)

    # a couple of unrolled passes first (always needed), then fixpoint
    cols = pass_(pass_(cols))
    return jax.lax.while_loop(has_carry, pass_, cols)


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
                      p_shifts: jnp.ndarray, csub: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of lane-columns (value < R*p, cols < 2^30) to a
    canonical 48-limb result in lanes 0..47.

    The two constant products (x p' mod R, x p) run as in-kernel f32 MXU dots
    against (128, 128) shifted-constant matrices — exact because canonical
    digits keep every dot partial sum below 49 * 255^2 < 2^24."""
    lane = _lane_iota(tcols.shape)
    t = normalize_lanes(tcols)
    t_low = jnp.where(lane < NRED, t, 0)
    m_cols = jnp.dot(t_low.astype(jnp.float32), pp_shifts,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    m = jnp.where(lane < NRED, normalize_lanes(m_cols), 0)
    u = jnp.dot(m.astype(jnp.float32), p_shifts,
                preferred_element_type=jnp.float32).astype(jnp.int32)
    s = normalize_lanes(t + u)
    # result = lanes [NRED, NRED+48) shifted down to lanes [0, 48)
    res = pltpu.roll(s, LANES - NRED, axis=1)
    res = jnp.where(lane < NLIMBS, res, 0)
    # conditional subtract p: d = res + (2^392 - p); lane 49 of d == 1 iff res >= p
    d = normalize_lanes(res + csub)
    ge = d[:, NRED][:, None]  # 0 or 1
    d_low = jnp.where(lane < NLIMBS, d, 0)
    return jnp.where(ge == 1, d_low, res)


def _mont_mul_kernel(pp_ref, p_ref, csub_ref, a_ref, b_ref, out_ref):
    lane = _lane_iota(a_ref.shape)
    a = jnp.where(lane < NLIMBS, a_ref[...], 0)
    b = jnp.where(lane < NLIMBS, b_ref[...], 0)
    cols = _conv48_unrolled(a, b)
    out_ref[...] = mont_reduce_lanes(cols, pp_ref[...], p_ref[...], csub_ref[...])


def _conv_kernel(a_ref, b_ref, out_ref):
    out_ref[...] = _conv48_unrolled(a_ref[...], b_ref[...])


def _mont_reduce_kernel(pp_ref, p_ref, csub_ref, cols_ref, out_ref):
    out_ref[...] = mont_reduce_lanes(
        cols_ref[...], pp_ref[...], p_ref[...], csub_ref[...]
    )


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
]


def _consts():
    return (jnp.asarray(_PPRIME_SHIFTS), jnp.asarray(_P_SHIFTS),
            jnp.asarray(_CSUB_PAD)[None, :])


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


def mont_reduce(cols: jnp.ndarray, block: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """Batched Montgomery reduction fully in VMEM: (..., K<=128) signed int32
    columns (value in [0, R*p), |col| < 2^30) -> canonical (..., 48)."""
    cf, batch_shape, n = _flatten_pad(cols, block)
    pp, pm, cs = _consts()
    out = pl.pallas_call(
        _mont_reduce_kernel,
        out_shape=jax.ShapeDtypeStruct(cf.shape, jnp.int32),
        grid=(cf.shape[0] // block,),
        in_specs=_CONST_SPECS + [
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pp, pm, cs, cf)
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
