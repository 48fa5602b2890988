"""Fully-fused Pallas kernels for Fq12 tower operations.

One kernel per hot tower op (mul, square, mul_by_014, cyclotomic_square): all
limb convolutions, wide combines, and the 12 Montgomery reductions of an Fq12
result run back-to-back in VMEM — HBM traffic collapses to the canonical
(12, 48)-limb operands and result. This is the layer the XLA composition path
cannot reach (its intermediates round-trip HBM).

Compile-time shape (the lesson of round 2): Mosaic compile cost is governed by
*statement count*, not data volume. A body with 54 separately-unrolled 48-step
convolutions takes >10 minutes to compile; the same math as ONE convolution
over a row-stacked operand block compiles in seconds. So every kernel body is
two-phase: phase 1 collects all conv operand pairs (every product in a tower
formula is a product of *input* linear combinations — no conv feeds another
conv), stacks them on the sublane axis, and runs a single 48-step
roll-accumulate; phase 2 combines the resulting wide columns (cheap VPU adds)
and reduces all 12 outputs in a single stacked scan-free Montgomery reduction.

In-kernel data model: an Fq12 element is a (TB, 12, LANES) int32 block (flat
tower order, limbs padded to 128 lanes); a "wide" is a (TB, LANES) signed int32
column vector per Fp component with static bounds (class W). Formulas mirror
ops/fq2.py / fq6.py / fq12.py exactly (same Montgomery domain) and the kernels
are tested bit-identical against them in tests/test_pallas_tower.py
(interpret-mode on CPU) plus the on-TPU bit-exactness gate in bench.py.

Value-level biasing: the scan-free reduction's constant bias row (K_BIAS * p)
clears the statically-tracked worst-case negativity of every wide
(asserted per output against C.BIAS_VALUE).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from . import mont

NLIMBS = C.NLIMBS
LANES = mont.LANES
_P = C.P
_P2 = _P * _P
_RP = (1 << C.R_BITS) * _P

#: NEGC (digits >= SEMI_DIG+1) as a row: relaxed negation constant.
_NEGC_ROW = np.zeros((1, LANES), dtype=np.int32)
_NEGC_ROW[0, :NLIMBS] = C.NEGC_LIMBS
_NEG_KP = C.NEG_K * _P
_SD = C.SEMI_DIG

#: (R mod p) shifted-row matrix: embeds stored limbs into the product domain
#: (fp.to_wide_mont) as an in-kernel f32 dot.
_ONEM_MAT = np.zeros((LANES, LANES), dtype=np.float32)
_ONEM_MAT[:NLIMBS] = mont._shifted_const_matrix(
    C.ONE_MONT, NLIMBS, 2 * NLIMBS - 1
).astype(np.float32)

_PMAX = C.SEMI_VAL


class W:
    """In-kernel wide with static bounds (mirrors fp.Wide)."""

    __slots__ = ("cols", "lo", "hi", "vlo", "vhi")

    def __init__(self, cols, lo, hi, vlo, vhi):
        self.cols, self.lo, self.hi, self.vlo, self.vhi = cols, lo, hi, vlo, vhi

    def __add__(self, o):
        return W(self.cols + o.cols, self.lo + o.lo, self.hi + o.hi,
                 self.vlo + o.vlo, self.vhi + o.vhi)

    def __sub__(self, o):
        return W(self.cols - o.cols, self.lo - o.hi, self.hi - o.lo,
                 self.vlo - o.vhi, self.vhi - o.vlo)

    def scale(self, k: int):
        return W(self.cols * k, min(self.lo * k, 0), self.hi * k,
                 min(self.vlo * k, 0), self.vhi * k)


class ConvBatch:
    """Phase-1 collector: operand pairs pushed during formula tracing, then ONE
    stacked 48-step convolution for the whole kernel body (run()), after which
    get(i) hands back each product as a wide with its own static bounds."""

    def __init__(self):
        self._a, self._b, self._meta = [], [], []
        self._results = None

    def push(self, a, b, am, bm, av, bv) -> int:
        assert NLIMBS * am * bm < (1 << 31), "int32 conv overflow"
        i = len(self._a)
        self._a.append(a)
        self._b.append(b)
        self._meta.append((am, bm, av, bv))
        return i

    def run(self) -> None:
        a = jnp.concatenate(self._a, axis=0)
        b = jnp.concatenate(self._b, axis=0)
        cols = mont._conv48_unrolled(a, b)
        tb = self._a[0].shape[0]
        self._results = [
            W(cols[i * tb : (i + 1) * tb], 0, NLIMBS * am * bm, 0, av * bv)
            for i, (am, bm, av, bv) in enumerate(self._meta)
        ]

    def get(self, i: int) -> W:
        return self._results[i]


class Consts:
    """The constant blocks every tower kernel receives."""

    def __init__(self, negc, onem, pp, pmat, bias, qw):
        self.negc, self.onem = negc, onem
        self.pp, self.pmat, self.bias, self.qw = pp, pmat, bias, qw

    @staticmethod
    def specs():
        row = lambda: pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
        mat = lambda: pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return [row(), mat(), mat(), mat(), row(), row()]

    @staticmethod
    def arrays():
        return (
            jnp.asarray(_NEGC_ROW),
            jnp.asarray(_ONEM_MAT),
            jnp.asarray(mont._PPRIME_SHIFTS),
            jnp.asarray(mont._P_SHIFTS),
            jnp.asarray(mont._BIAS_ROW),
            jnp.asarray(mont._QW_ROW),
        )

    @staticmethod
    def load(refs):
        return Consts(*[r[...] for r in refs])


def _reduce_stack(cst: Consts, wides: list) -> jnp.ndarray:
    """ONE stacked scan-free Montgomery reduction for all k outputs; returns
    (TB, k, LANES) weakly-reduced. Bounds merge to the stack's worst case."""
    for w in wides:
        assert w.vlo > -C.BIAS_VALUE and w.vhi + C.BIAS_VALUE < _RP, "R*p exceeded"
    lo = min(w.lo for w in wides)
    hi = max(w.hi for w in wides)
    cols = jnp.concatenate([w.cols for w in wides], axis=0)
    red = mont.mont_reduce_lanes(cols, cst.pp, cst.pmat, cst.bias, cst.qw, lo, hi)
    tb = wides[0].cols.shape[0]
    return jnp.stack(
        [red[i * tb : (i + 1) * tb] for i in range(len(wides))], axis=1
    )


def _to_wide_mont_many(cst: Consts, xs: list, x_max=_SD) -> list:
    """Embed k stored-limb components into the product domain with ONE stacked
    f32 dot against the (R mod p) shifted-row matrix (fp.to_wide_mont)."""
    tb = xs[0].shape[0]
    x = jnp.concatenate(xs, axis=0)
    cols = jnp.dot(x.astype(jnp.float32), cst.onem,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    x_val = x_max * (((1 << (8 * NLIMBS)) - 1) // 255)
    return [
        W(cols[i * tb : (i + 1) * tb], 0, NLIMBS * x_max * 255, 0,
          x_val * C.ONE_MONT_INT)
        for i in range(len(xs))
    ]


# ---------------------------------------------------------------------------
# In-kernel Fq2/Fq6 wide algebra, two-phase. Component convention: a 6-list of
# (TB, LANES) arrays in flat order [c0.c0, c0.c1, c1.c0, c1.c1, c2.c0, c2.c1];
# operand metadata rides separately as (limb_max, val_max). The *_emit
# functions push conv operands into a ConvBatch and return index structures;
# the *_fin functions consume the batched results.
# ---------------------------------------------------------------------------


def _fq2_mul_emit(cb, a0, a1, b0, b1, am=_SD, av=_PMAX, bm=_SD, bv=_PMAX):
    i0 = cb.push(a0, b0, am, bm, av, bv)
    i1 = cb.push(a1, b1, am, bm, av, bv)
    i2 = cb.push(a0 + a1, b0 + b1, 2 * am, 2 * bm, 2 * av, 2 * bv)
    return (i0, i1, i2)


def _fq2_mul_fin(cb, ids):
    t0, t1, tsum = cb.get(ids[0]), cb.get(ids[1]), cb.get(ids[2])
    return (t0 - t1, tsum - t0 - t1)


def _fq2_nonres_w(w):
    return (w[0] - w[1], w[0] + w[1])


def _fq2_add_w(x, y):
    return (x[0] + y[0], x[1] + y[1])


def _fq2_sub_w(x, y):
    return (x[0] - y[0], x[1] - y[1])


def _fq6_mul_emit(cb, a, b, am=_SD, av=_PMAX, bm=_SD, bv=_PMAX):
    """Interpolation product (ops/fq6.py mul_wide): 6 Fq2 products on input
    linear combinations."""
    return [
        _fq2_mul_emit(cb, a[0], a[1], b[0], b[1], am, av, bm, bv),
        _fq2_mul_emit(cb, a[2], a[3], b[2], b[3], am, av, bm, bv),
        _fq2_mul_emit(cb, a[4], a[5], b[4], b[5], am, av, bm, bv),
        _fq2_mul_emit(cb, a[2] + a[4], a[3] + a[5], b[2] + b[4], b[3] + b[5],
                      2 * am, 2 * av, 2 * bm, 2 * bv),
        _fq2_mul_emit(cb, a[0] + a[2], a[1] + a[3], b[0] + b[2], b[1] + b[3],
                      2 * am, 2 * av, 2 * bm, 2 * bv),
        _fq2_mul_emit(cb, a[0] + a[4], a[1] + a[5], b[0] + b[4], b[1] + b[5],
                      2 * am, 2 * av, 2 * bm, 2 * bv),
    ]


def _fq6_mul_fin(cb, ids):
    t0 = _fq2_mul_fin(cb, ids[0])
    t1 = _fq2_mul_fin(cb, ids[1])
    t2 = _fq2_mul_fin(cb, ids[2])
    m12 = _fq2_mul_fin(cb, ids[3])
    m01 = _fq2_mul_fin(cb, ids[4])
    m02 = _fq2_mul_fin(cb, ids[5])
    s0 = _fq2_add_w(t0, _fq2_nonres_w(_fq2_sub_w(_fq2_sub_w(m12, t1), t2)))
    s1 = _fq2_add_w(_fq2_sub_w(_fq2_sub_w(m01, t0), t1), _fq2_nonres_w(t2))
    s2 = _fq2_add_w(_fq2_sub_w(_fq2_sub_w(m02, t0), t2), t1)
    return [s0[0], s0[1], s1[0], s1[1], s2[0], s2[1]]


def _fq6_nonres_w(t):
    x = _fq2_nonres_w((t[4], t[5]))
    return [x[0], x[1], t[0], t[1], t[2], t[3]]


def _fq6_mul_by_01_emit(cb, a, b00, b01, b10, b11, am=_SD, av=_PMAX, bm=_SD, bv=_PMAX):
    return [
        _fq2_mul_emit(cb, a[0], a[1], b00, b01, am, av, bm, bv),
        _fq2_mul_emit(cb, a[2], a[3], b10, b11, am, av, bm, bv),
        _fq2_mul_emit(cb, a[2] + a[4], a[3] + a[5], b10, b11,
                      2 * am, 2 * av, bm, bv),
        _fq2_mul_emit(cb, a[0] + a[2], a[1] + a[3], b00 + b10, b01 + b11,
                      2 * am, 2 * av, 2 * bm, 2 * bv),
        _fq2_mul_emit(cb, a[4], a[5], b00, b01, am, av, bm, bv),
    ]


def _fq6_mul_by_01_fin(cb, ids):
    t0 = _fq2_mul_fin(cb, ids[0])
    t1 = _fq2_mul_fin(cb, ids[1])
    m12 = _fq2_mul_fin(cb, ids[2])
    m01 = _fq2_mul_fin(cb, ids[3])
    t2 = _fq2_mul_fin(cb, ids[4])
    s0 = _fq2_add_w(_fq2_nonres_w(_fq2_sub_w(m12, t1)), t0)
    s1 = _fq2_sub_w(_fq2_sub_w(m01, t0), t1)
    s2 = _fq2_add_w(t2, t1)
    return [s0[0], s0[1], s1[0], s1[1], s2[0], s2[1]]


def _fq6_mul_by_1_emit(cb, a, b10, b11, am=_SD, av=_PMAX, bm=_SD, bv=_PMAX):
    return [
        _fq2_mul_emit(cb, a[4], a[5], b10, b11, am, av, bm, bv),
        _fq2_mul_emit(cb, a[0], a[1], b10, b11, am, av, bm, bv),
        _fq2_mul_emit(cb, a[2], a[3], b10, b11, am, av, bm, bv),
    ]


def _fq6_mul_by_1_fin(cb, ids):
    x = _fq2_nonres_w(_fq2_mul_fin(cb, ids[0]))
    s1 = _fq2_mul_fin(cb, ids[1])
    s2 = _fq2_mul_fin(cb, ids[2])
    return [x[0], x[1], s1[0], s1[1], s2[0], s2[1]]


def _wlist_add(x, y):
    return [a + b for a, b in zip(x, y)]


def _wlist_sub(x, y):
    return [a - b for a, b in zip(x, y)]


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _comps(a_ref, lo, hi):
    return [a_ref[:, i, :] for i in range(lo, hi)]


def _fq12_mul_body(cst, a_ref, b_ref, out_ref):
    a0, a1 = _comps(a_ref, 0, 6), _comps(a_ref, 6, 12)
    b0, b1 = _comps(b_ref, 0, 6), _comps(b_ref, 6, 12)
    asum = [x + y for x, y in zip(a0, a1)]
    bsum = [x + y for x, y in zip(b0, b1)]
    cb = ConvBatch()
    i_t0 = _fq6_mul_emit(cb, a0, b0)
    i_t1 = _fq6_mul_emit(cb, a1, b1)
    i_t01 = _fq6_mul_emit(cb, asum, bsum, am=2 * _SD, av=2 * _PMAX,
                          bm=2 * _SD, bv=2 * _PMAX)
    cb.run()
    t0 = _fq6_mul_fin(cb, i_t0)
    t1 = _fq6_mul_fin(cb, i_t1)
    t01 = _fq6_mul_fin(cb, i_t01)
    out0 = _wlist_add(t0, _fq6_nonres_w(t1))
    out1 = _wlist_sub(_wlist_sub(t01, t0), t1)
    out_ref[...] = _reduce_stack(cst, out0 + out1)


def _fq12_square_body(cst, a_ref, out_ref):
    """Complex squaring (ops/fq12.py square): c0 = (a0+a1)(a0+v a1) - ab - v ab,
    c1 = 2ab; v*a1 realized with relaxed (NEGC-based) digits."""
    negc = cst.negc
    a0, a1 = _comps(a_ref, 0, 6), _comps(a_ref, 6, 12)
    s = [x + y for x, y in zip(a0, a1)]  # digits <= 510
    # t = a0 + v*a1, with v*a1 = (xi*(a1c2), a1c0, a1c1); xi*(x0,x1) relaxed:
    # (x0 + (NEGC - x1), x0 + x1) — digits <= 765 resp. 510.
    t = [
        a0[0] + (a1[4] + (negc - a1[5])),  # <= SD + SD + (SD+256)
        a0[1] + (a1[4] + a1[5]),  # <= 3*SD
        a0[2] + a1[0],
        a0[3] + a1[1],
        a0[4] + a1[2],
        a0[5] + a1[3],
    ]
    tv = (1 + C.NEG_K + 2) * _P  # value bound of worst t component
    cb = ConvBatch()
    i_ab = _fq6_mul_emit(cb, a0, a1)
    i_st = _fq6_mul_emit(cb, s, t, am=2 * _SD, av=2 * _PMAX,
                         bm=3 * _SD + 256, bv=tv)
    cb.run()
    ab = _fq6_mul_fin(cb, i_ab)
    st = _fq6_mul_fin(cb, i_st)
    out0 = _wlist_sub(_wlist_sub(st, ab), _fq6_nonres_w(ab))
    out1 = [x.scale(2) for x in ab]
    out_ref[...] = _reduce_stack(cst, out0 + out1)


def _fq12_mul014_body(cst, a_ref, d_ref, out_ref):
    """Sparse product with (d0 + d1 v) + (d4 v) w; d_ref: (TB, 6, LANES) with
    components [d0c0, d0c1, d1c0, d1c1, d4c0, d4c1] (ops/fq12.py mul_by_014)."""
    a0, a1 = _comps(a_ref, 0, 6), _comps(a_ref, 6, 12)
    d = _comps(d_ref, 0, 6)
    asum = [x + y for x, y in zip(a0, a1)]
    d14_0, d14_1 = d[2] + d[4], d[3] + d[5]  # digits <= 510
    cb = ConvBatch()
    i_aa = _fq6_mul_by_01_emit(cb, a0, d[0], d[1], d[2], d[3])
    i_bb = _fq6_mul_by_1_emit(cb, a1, d[4], d[5])
    i_t1 = _fq6_mul_by_01_emit(cb, asum, d[0], d[1], d14_0, d14_1,
                               am=2 * _SD, av=2 * _PMAX, bm=2 * _SD, bv=2 * _PMAX)
    cb.run()
    aa = _fq6_mul_by_01_fin(cb, i_aa)
    bb = _fq6_mul_by_1_fin(cb, i_bb)
    t1 = _fq6_mul_by_01_fin(cb, i_t1)
    out0 = _wlist_add(_fq6_nonres_w(bb), aa)
    out1 = _wlist_sub(_wlist_sub(t1, aa), bb)
    out_ref[...] = _reduce_stack(cst, out0 + out1)


def _fp4_square_emit(cb, a0, a1, b0, b1):
    """Fq4 square on component pairs a=(a0,a1), b=(b0,b1) (ops/fq12.py)."""
    return [
        _fq2_mul_emit(cb, a0, a1, a0, a1),
        _fq2_mul_emit(cb, b0, b1, b0, b1),
        _fq2_mul_emit(cb, a0 + b0, a1 + b1, a0 + b0, a1 + b1,
                      2 * _SD, 2 * _PMAX, 2 * _SD, 2 * _PMAX),
    ]


def _fp4_square_fin(cb, ids):
    t0 = _fq2_mul_fin(cb, ids[0])
    t1 = _fq2_mul_fin(cb, ids[1])
    t2 = _fq2_mul_fin(cb, ids[2])
    t2 = _fq2_sub_w(_fq2_sub_w(t2, t0), t1)
    return _fq2_add_w(_fq2_nonres_w(t1), t0), t2


def _fq12_cyc_square_body(cst, a_ref, out_ref):
    """Granger-Scott cyclotomic squaring (ops/fq12.py cyclotomic_square)."""
    z0 = (a_ref[:, 0, :], a_ref[:, 1, :])
    z4 = (a_ref[:, 2, :], a_ref[:, 3, :])
    z3 = (a_ref[:, 4, :], a_ref[:, 5, :])
    z2 = (a_ref[:, 6, :], a_ref[:, 7, :])
    z1 = (a_ref[:, 8, :], a_ref[:, 9, :])
    z5 = (a_ref[:, 10, :], a_ref[:, 11, :])

    cb = ConvBatch()
    i01 = _fp4_square_emit(cb, *z0, *z1)
    i23 = _fp4_square_emit(cb, *z2, *z3)
    i45 = _fp4_square_emit(cb, *z4, *z5)
    cb.run()
    t0_01, t1_01 = _fp4_square_fin(cb, i01)
    t0_23, t1_23 = _fp4_square_fin(cb, i23)
    t2_45, t3_45 = _fp4_square_fin(cb, i45)

    wm = _to_wide_mont_many(
        cst, [z0[0], z0[1], z1[0], z1[1], z4[0], z4[1],
              z5[0], z5[1], z2[0], z2[1], z3[0], z3[1]]
    )
    z0w, z1w = (wm[0], wm[1]), (wm[2], wm[3])
    z4w, z5w = (wm[4], wm[5]), (wm[6], wm[7])
    z2w, z3w = (wm[8], wm[9]), (wm[10], wm[11])

    nz0 = _fq2_sub_w((t0_01[0].scale(3), t0_01[1].scale(3)),
                     (z0w[0].scale(2), z0w[1].scale(2)))
    nz1 = _fq2_add_w((t1_01[0].scale(3), t1_01[1].scale(3)),
                     (z1w[0].scale(2), z1w[1].scale(2)))
    nz4 = _fq2_sub_w((t0_23[0].scale(3), t0_23[1].scale(3)),
                     (z4w[0].scale(2), z4w[1].scale(2)))
    nz5 = _fq2_add_w((t1_23[0].scale(3), t1_23[1].scale(3)),
                     (z5w[0].scale(2), z5w[1].scale(2)))
    t3xi = _fq2_nonres_w(t3_45)
    nz2 = _fq2_add_w((t3xi[0].scale(3), t3xi[1].scale(3)),
                     (z2w[0].scale(2), z2w[1].scale(2)))
    nz3 = _fq2_sub_w((t2_45[0].scale(3), t2_45[1].scale(3)),
                     (z3w[0].scale(2), z3w[1].scale(2)))

    out_ref[...] = _reduce_stack(
        cst,
        [nz0[0], nz0[1], nz4[0], nz4[1], nz3[0], nz3[1],
         nz2[0], nz2[1], nz1[0], nz1[1], nz5[0], nz5[1]],
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pad_comp(x: jnp.ndarray, ncomp: int, block: int):
    batch_shape = x.shape[:-2]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    npad = (-n) % block
    flat = x.reshape(n, ncomp, NLIMBS)
    flat = jnp.pad(flat, ((0, npad), (0, 0), (0, LANES - NLIMBS)))
    return flat, batch_shape, n


def _elem_spec(ncomp, block):
    return pl.BlockSpec((block, ncomp, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _run(kernel_body, inputs, ncomps, block, interpret):
    """inputs: list of (array, ncomp); all share the leading batch shape."""
    flats = []
    batch_shape = n = None
    for x, nc in inputs:
        f, batch_shape, n = _pad_comp(x, nc, block)
        flats.append(f)

    def kernel(*refs):
        cst = Consts.load(refs[:6])
        kernel_body(cst, *refs[6:])

    kwargs = {}
    if not interpret:
        # The kernels hold many live wide-column temporaries; the default 16MB
        # scoped-vmem stack limit rejects them (v5e VMEM is 128MB total).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((flats[0].shape[0], 12, LANES), jnp.int32),
        grid=(flats[0].shape[0] // block,),
        in_specs=Consts.specs() + [_elem_spec(nc, block) for _, nc in inputs],
        out_specs=_elem_spec(12, block),
        interpret=interpret,
        **kwargs,
    )(*Consts.arrays(), *flats)
    return out[:n, :, :NLIMBS].reshape(*batch_shape, 12, NLIMBS)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fq12_mul(a, b, block: int = 32, interpret: bool = False):
    return _run(_fq12_mul_body, [(a, 12), (b, 12)], 12, block, interpret)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fq12_square(a, block: int = 32, interpret: bool = False):
    return _run(_fq12_square_body, [(a, 12)], 12, block, interpret)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fq12_mul_by_014(a, d, block: int = 32, interpret: bool = False):
    """d: (..., 6, 48) packed [d0c0, d0c1, d1c0, d1c1, d4c0, d4c1]."""
    return _run(_fq12_mul014_body, [(a, 12), (d, 6)], 12, block, interpret)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fq12_cyclotomic_square(a, block: int = 32, interpret: bool = False):
    return _run(_fq12_cyc_square_body, [(a, 12)], 12, block, interpret)
