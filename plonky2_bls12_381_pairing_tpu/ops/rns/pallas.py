"""Fused Pallas TPU kernels for the RNS tier.

The XLA composition path materializes the ~10 fused-op groups of every tower
op through HBM; these kernels run a whole Fq12 op (or a whole Miller
ell+square step, or a whole fixed-exponent Fermat pow) back-to-back in VMEM.

Mechanism: the RNS formulas in ops/rns/{fp,tower}.py are plain jnp code whose
every constant tensor flows through fp.cst(tag). A kernel here is built by
(1) tracing the op once with a collector hook (jax.eval_shape) to discover
the exact constant set it needs, then (2) emitting ONE pallas_call whose
kernel body re-runs the same formula code with the hook bound to the kernel's
constant input refs. One source of truth for the math; the kernels are pure
execution strategy (bit-identical by construction, asserted by
tests/test_rns.py which compares both paths against the oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fp

LANES = fp.LANES
_VMEM_LIMIT = 100 * 1024 * 1024


def _collect_tags(fn, args) -> dict:
    """Trace fn abstractly, recording every fp.cst constant it requests."""
    tags: dict = {}

    def hook(tag, np_val):
        if tag not in tags:
            tags[tag] = np.asarray(np_val)
        return jnp.asarray(np_val)

    prev = fp.set_const_hook(hook)
    try:
        # a fresh lambda defeats eval_shape's jit trace cache — a cache hit
        # would skip tracing and silently collect NO tags
        out_shape = jax.eval_shape(lambda *a: fn(*a), *args)
    finally:
        fp.set_const_hook(prev)
    return tags, out_shape


def _as2d(arr: np.ndarray) -> np.ndarray:
    return arr.reshape(1, -1) if arr.ndim == 1 else arr


@functools.lru_cache(maxsize=64)
def _build(fn_key, fn, in_comps: tuple, out_comps: int, block: int,
           interpret: bool = False):
    """Compile-time construction of the fused kernel wrapper for `fn`.

    in_comps: per-argument component count k (arg shape (N, k, LANES)).
    """
    abstract = [jax.ShapeDtypeStruct((block, k, LANES), jnp.int32)
                for k in in_comps]
    tags, _ = _collect_tags(fn, abstract)
    tag_list = list(tags.items())
    # keep NUMPY values in this (cached) closure; jnp conversion happens per
    # call so no trace-scoped constant leaks into a later trace
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        const_refs = refs[: len(tag_list)]
        in_refs = refs[len(tag_list) : -1]
        out_ref = refs[-1]
        lookup = {tag: r[...] for (tag, _), r in zip(tag_list, const_refs)}

        def hook(tag, np_val):
            return lookup[tag]

        prev = fp.set_const_hook(hook)
        try:
            out = fn(*[r[...] for r in in_refs])
        finally:
            fp.set_const_hook(prev)
        out_ref[...] = out

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]

    def elem_spec(k):
        return pl.BlockSpec((block, k, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def run(*args):
        const_arrays = [jnp.asarray(v) for v in const_np]
        n = args[0].shape[0]
        npad = (-n) % block
        padded = [jnp.pad(a, ((0, npad), (0, 0), (0, 0))) for a in args]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n + npad, out_comps, LANES), jnp.int32),
            grid=((n + npad) // block,),
            in_specs=const_specs + [elem_spec(k) for k in in_comps],
            out_specs=elem_spec(out_comps),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*const_arrays, *padded)
        return out[:n]

    return run


def fused_op(fn, fn_key: str, in_comps: tuple, out_comps: int, block: int = 64,
             interpret: bool = False):
    """Run fn (args (..., k_i, LANES) sharing a batch shape) as one fused
    kernel blocked over the flattened batch."""
    runner = _build(fn_key, fn, tuple(in_comps), out_comps, block, interpret)

    def call(*args):
        batch_shape = args[0].shape[:-2]
        flat = [a.reshape(-1, a.shape[-2], a.shape[-1]) for a in args]
        out = runner(*flat)
        return out.reshape(*batch_shape, out_comps, LANES)

    return call


# ---------------------------------------------------------------------------
# Whole-exponent Fermat pow kernel: the full square-and-multiply scan runs
# inside ONE kernel (fori_loop over the static bit table held in VMEM),
# eliminating the per-step XLA while-loop overhead of ~570 tiny steps.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _build_pow(nbits: int, block: int, interpret: bool = False):
    def step(acc, base_bit):
        base, bit = base_bit
        sq = fp.redc(fp.mul_ss(acc, acc))
        return jax.lax.cond(
            bit != 0, lambda s: fp.redc(fp.mul_ss(s, base)), lambda s: s, sq)

    abstract = [jax.ShapeDtypeStruct((block, LANES), jnp.int32),
                (jax.ShapeDtypeStruct((block, LANES), jnp.int32),
                 jax.ShapeDtypeStruct((), jnp.int32))]
    tags, _ = _collect_tags(step, abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        const_refs = refs[: len(tag_list)]
        bits_ref, a_ref = refs[len(tag_list)], refs[len(tag_list) + 1]
        out_ref = refs[-1]
        lookup = {tag: r[...] for (tag, _), r in zip(tag_list, const_refs)}

        def hook(tag, np_val):
            return lookup[tag]

        prev = fp.set_const_hook(hook)
        try:
            a = a_ref[...]

            def body(i, acc):
                return step(acc, (a, bits_ref[0, i]))

            out_ref[...] = jax.lax.fori_loop(0, nbits, body, a)
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    bits_spec = pl.BlockSpec((1, nbits), lambda i: (0, 0), memory_space=pltpu.SMEM)
    elem_spec = pl.BlockSpec((block, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    def run(a, bits):
        const_arrays = [jnp.asarray(v) for v in const_np]
        n = a.shape[0]
        npad = (-n) % block
        ap = jnp.pad(a, ((0, npad), (0, 0)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n + npad, LANES), jnp.int32),
            grid=((n + npad) // block,),
            in_specs=const_specs + [bits_spec, elem_spec],
            out_specs=elem_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*const_arrays, bits, ap)
        return out[:n]

    return run


# ---------------------------------------------------------------------------
# Whole-run cyclotomic-square kernel: n Granger-Scott squarings back-to-back
# in VMEM on a component-major 2D block (the Fq12 state never touches HBM
# between squarings — on the XLA path each squaring round-trips ~80 MB of
# fusion-barrier intermediates at B=2048).
# ---------------------------------------------------------------------------


def _cyc_square_2d(a: jnp.ndarray) -> jnp.ndarray:
    """One cyclotomic squaring on component-major 2D data: a is
    (12*TB, LANES) with component i occupying rows [i*TB, (i+1)*TB)."""
    from . import tower as tw

    tb = a.shape[0] // 12
    c = lambda i: fp.wrap(a[i * tb : (i + 1) * tb])
    tp = lambda i: fp.to_prod(a[i * tb : (i + 1) * tb])
    z0, z4, z3 = (c(0), c(1)), (c(2), c(3)), (c(4), c(5))
    z2, z1, z5 = (c(6), c(7)), (c(8), c(9)), (c(10), c(11))
    t0_01, t1_01 = tw._fp4_square(*z0, *z1)
    t0_23, t1_23 = tw._fp4_square(*z2, *z3)
    t2_45, t3_45 = tw._fp4_square(*z4, *z5)
    z0w, z4w, z3w = (tp(0), tp(1)), (tp(2), tp(3)), (tp(4), tp(5))
    z2w, z1w, z5w = (tp(6), tp(7)), (tp(8), tp(9)), (tp(10), tp(11))
    ps, pa, pb = tw._pair_scale, tw._pair_add, tw._pair_sub
    nz0 = pb(ps(t0_01, 3), ps(z0w, 2))
    nz1 = pa(ps(t1_01, 3), ps(z1w, 2))
    nz4 = pb(ps(t0_23, 3), ps(z4w, 2))
    nz5 = pa(ps(t1_23, 3), ps(z5w, 2))
    t3xi = tw.fq2_nonres(t3_45)
    nz2 = pa(ps(t3xi, 3), ps(z2w, 2))
    nz3 = pb(ps(t2_45, 3), ps(z3w, 2))
    outs = [fp.nonneg(r) for r in
            [nz0[0], nz0[1], nz4[0], nz4[1], nz3[0], nz3[1],
             nz2[0], nz2[1], nz1[0], nz1[1], nz5[0], nz5[1]]]
    merged = fp.R(jnp.concatenate([r.ch for r in outs], axis=0),
                  min(r.lo for r in outs), max(r.hi for r in outs),
                  min(r.vlo for r in outs), max(r.vhi for r in outs))
    return fp.redc(merged)


def _kara_square_2d(a: jnp.ndarray) -> jnp.ndarray:
    """One Karabina compressed squaring on component-major 2D data: a is
    (8*TB, LANES) with compressed component i at rows [i*TB, (i+1)*TB)
    (tower.compressed_square formulas, validated vs refmodel)."""
    from . import tower as tw

    tb = a.shape[0] // 8
    sl = lambda i: a[i * tb : (i + 1) * tb]
    w = lambda i: fp.wrap(sl(i))
    tp = lambda i: fp.to_prod(sl(i))
    g2, g3 = (w(0), w(1)), (w(2), w(3))
    g4, g5 = (w(4), w(5)), (w(6), w(7))
    B45 = tw.fq2_mul_r(*g4, *g5)
    A45 = tw.fq2_mul_r(g4[0] + g5[0], g4[1] + g5[1],
                       g4[0] + g5[0] - g5[1], g4[1] + g5[0] + g5[1])
    B23 = tw.fq2_mul_r(*g2, *g3)
    A23 = tw.fq2_mul_r(g2[0] + g3[0], g2[1] + g3[1],
                       g2[0] + g3[0] - g3[1], g2[1] + g3[0] + g3[1])
    ps, pa, pb = tw._pair_scale, tw._pair_add, tw._pair_sub
    t45 = pb(pb(A45, B45), tw.fq2_nonres(B45))
    t23 = pb(pb(A23, B23), tw.fq2_nonres(B23))
    h2 = pa(ps((tp(0), tp(1)), 2), ps(tw.fq2_nonres(B45), 6))
    h3 = pb(ps(t45, 3), ps((tp(2), tp(3)), 2))
    h4 = pb(ps(t23, 3), ps((tp(4), tp(5)), 2))
    h5 = pa(ps((tp(6), tp(7)), 2), ps(B23, 6))
    outs = [fp.nonneg(r) for r in
            [h2[0], h2[1], h3[0], h3[1], h4[0], h4[1], h5[0], h5[1]]]
    merged = fp.R(jnp.concatenate([r.ch for r in outs], axis=0),
                  min(r.lo for r in outs), max(r.hi for r in outs),
                  min(r.vlo for r in outs), max(r.vhi for r in outs))
    return fp.redc(merged)


@functools.lru_cache(maxsize=16)
def _build_square_run(n: int, block: int, ncomp: int, interpret: bool = False):
    """Whole-run squaring kernel over component-major data: ncomp = 12 runs
    Granger-Scott (_cyc_square_2d), ncomp = 8 Karabina (_kara_square_2d)."""
    sq2d = _cyc_square_2d if ncomp == 12 else _kara_square_2d
    abstract = [jax.ShapeDtypeStruct((ncomp * block, LANES), jnp.int32)]
    tags, _ = _collect_tags(lambda a: sq2d(a), abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        lookup = {t: r[...] for (t, _), r in zip(tag_list, refs[: len(tag_list)])}
        prev = fp.set_const_hook(lambda t, v: lookup[t])
        try:
            a = refs[-2][...].reshape(ncomp * block, LANES)

            def body(_, acc):
                return sq2d(acc)

            out = jax.lax.fori_loop(0, n, body, a)
            refs[-1][...] = out.reshape(ncomp, block, LANES)
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    espec = pl.BlockSpec((ncomp, block, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)

    def run(acm: jnp.ndarray):  # (ncomp, rows, LANES) component-major
        const_arrays = [jnp.asarray(v) for v in const_np]
        rows = acm.shape[1]
        npad = (-rows) % block
        ap = jnp.pad(acm, ((0, 0), (0, npad), (0, 0)))
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(ap.shape, jnp.int32),
            grid=((rows + npad) // block,),
            in_specs=const_specs + [espec],
            out_specs=espec,
            interpret=interpret,
            **kwargs,
        )(*const_arrays, ap)
        return out[:, :rows]

    return run


def _square_run(a: jnp.ndarray, n: int, ncomp: int, block: int,
                interpret: bool) -> jnp.ndarray:
    batch_shape = a.shape[:-2]
    flat = a.reshape(-1, ncomp, LANES)
    acm = jnp.moveaxis(flat, 1, 0)
    out = _build_square_run(n, min(block, max(8, flat.shape[0])), ncomp,
                            interpret)(acm)
    return jnp.moveaxis(out, 0, 1).reshape(*batch_shape, ncomp, LANES)


def cyc_square_run(a: jnp.ndarray, n: int, block: int = 256,
                   interpret: bool = False) -> jnp.ndarray:
    """n cyclotomic squarings of a (..., 12, LANES) batch in ONE kernel.
    Transposes to component-major once per run (amortized over n steps)."""
    return _square_run(a, n, 12, block, interpret)


def kara_square_run(a: jnp.ndarray, n: int, block: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """n Karabina compressed squarings of a (..., 8, LANES) batch in ONE
    kernel (tower.compressed_square semantics)."""
    return _square_run(a, n, 8, block, interpret)


def _fq12_mul_2d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One full Fq12 product on component-major 2D data: a, b are
    (12*TB, LANES) with component i at rows [i*TB, (i+1)*TB)
    (tower._mul_impl formulas — Karatsuba over Fq6)."""
    from . import tower as tw

    tb = a.shape[0] // 12
    wa = lambda x, i: fp.wrap(x[i * tb : (i + 1) * tb])
    a0 = [wa(a, i) for i in range(6)]
    a1 = [wa(a, i) for i in range(6, 12)]
    b0 = [wa(b, i) for i in range(6)]
    b1 = [wa(b, i) for i in range(6, 12)]
    asum = tw._canon_list(tw._list_add(a0, a1))
    bsum = tw._canon_list(tw._list_add(b0, b1))
    t0 = tw._fq6_mul(a0, b0)
    t1 = tw._fq6_mul(a1, b1)
    t01 = tw._fq6_mul(asum, bsum)
    out0 = tw._list_add(t0, tw._fq6_nonres(t1))
    out1 = tw._list_sub(tw._list_sub(t01, t0), t1)
    outs = [fp.nonneg(r) for r in out0 + out1]
    merged = fp.R(jnp.concatenate([r.ch for r in outs], axis=0),
                  min(r.lo for r in outs), max(r.hi for r in outs),
                  min(r.vlo for r in outs), max(r.vhi for r in outs))
    return fp.redc(merged)


# ---------------------------------------------------------------------------
# Whole-cyclotomic-exponentiation kernel (Granger-Scott square-and-multiply):
# f^|x| computed MSB-first over BLS_X's bits as static segments of cyclotomic
# squarings separated by 5 full multiplies with the VMEM-resident base — the
# base, the accumulator and every intermediate stay in VMEM for the whole
# exponentiation. Replaces the fused path's Karabina chain + snapshot
# decompression + batched inversion + product tree: the measured r5 phase
# split showed the kernel chain at 1.1 ms but decompress/inv/stack/tree glue
# at ~2.3 ms per exponentiation; Granger-Scott costs ~45% more REDC rows
# (816 vs 564 per packed row) but eliminates ALL of that structure.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Fully-fused Karabina exponentiation: compressed-square chain + snapshot
# decompression + batched tree inversion + snapshot product, ALL inside one
# kernel. vs the Granger-Scott kernel (cyc_exp_run): ~25% fewer REDC rows
# (compressed squares are 8 rows, not 12) and the same zero-glue property;
# the Fq2 inversions of the 6 snapshot denominators run as an in-kernel
# Montgomery product tree with ONE Fermat pow at the tree floor.
# ---------------------------------------------------------------------------


def _is_zero_lane_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Kernel-safe fp.is_zero returning a LANE mask (rows, LANES): 1 on every
    lane of a packed slot whose stored element is 0 mod p. The per-slot
    all-lanes reduction rides a block-ones bf16 matmul (no lane-axis
    reshapes, which Mosaic cannot fuse)."""
    from ... import rns_constants as RC

    rows = fp.cst(("zero_rows",), RC.ZERO_TEST_ROWS)  # (5, LANES)
    is_ch = fp.cst(("is_ch_i32",), RC.IS_CH.astype(np.int32))
    e = jnp.zeros_like(x)
    for r in range(RC.ZERO_TEST_ROWS.shape[0]):
        e = jnp.maximum(e, (x == rows[r]).astype(jnp.int32))
    e = jnp.maximum(e, 1 - is_ch)  # non-channel lanes always pass
    ones_bd = np.zeros((LANES, LANES), dtype=np.float32)
    for k in range(RC.PACK):
        ones_bd[k * RC.SUB : (k + 1) * RC.SUB,
                k * RC.SUB : (k + 1) * RC.SUB] = 1.0
    import ml_dtypes

    ob = fp.cst(("ones_blockdiag",), ones_bd.astype(ml_dtypes.bfloat16))
    s = jnp.dot(e.astype(jnp.bfloat16), ob,
                preferred_element_type=jnp.float32).astype(jnp.int32)
    from ... import rns_constants as RC2

    return (s == RC2.SUB).astype(jnp.int32)


def _redc_rows(rs) -> jnp.ndarray:
    """Merged REDC over a list of equal-shape R values (row-stacked)."""
    rs = [fp.nonneg(r) for r in rs]
    merged = fp.R(jnp.concatenate([r.ch for r in rs], axis=0),
                  min(r.lo for r in rs), max(r.hi for r in rs),
                  min(r.vlo for r in rs), max(r.vhi for r in rs))
    return fp.redc(merged)


#: MSB-first bits of the Fermat exponent p-2 (after the leading 1), the
#: in-kernel pow schedule; lives in SMEM (dynamic per-step reads).
_FERMAT_BITS = np.asarray(
    [(fp.P - 2 >> i) & 1 for i in range((fp.P - 2).bit_length() - 2, -1, -1)],
    dtype=np.int32).reshape(1, -1)


def _tree_inv_2d(norm: jnp.ndarray, bit_read, floor: int = 128) -> jnp.ndarray:
    """In-kernel batched Fp inverse (0 -> 0) of (N, LANES) stored rows:
    Montgomery product tree to <= floor rows, one Fermat pow chain (bits read
    per step via bit_read(i), an SMEM ref access), log-depth down-sweep (the
    fp.inv recipe with static shapes)."""
    n = norm.shape[0]
    zl = _is_zero_lane_2d(norm)
    one_row = fp.cst(("one_row",), np.asarray(fp.RC.ONE))
    safe = jnp.where(zl != 0, one_row, norm)
    size = 1
    while size < n:
        size *= 2
    if size != n:
        safe = jnp.concatenate(
            [safe, jnp.broadcast_to(one_row, (size - n, LANES))], axis=0)
    stack = []
    cur = safe
    while cur.shape[0] > floor:
        stack.append(cur)
        h = cur.shape[0] // 2
        cur = fp.redc(fp.mul_ss(cur[:h], cur[h:]))

    def body(i, acc):
        sq = fp.redc(fp.mul_ss(acc, acc))
        return jax.lax.cond(
            bit_read(i) != 0,
            lambda s: fp.redc(fp.mul_ss(s, cur)), lambda s: s, sq)

    invc = jax.lax.fori_loop(0, _FERMAT_BITS.shape[1], body, cur)
    for level in reversed(stack):
        h = level.shape[0] // 2
        invc = jnp.concatenate(
            [fp.redc(fp.mul_ss(invc, level[h:])),
         fp.redc(fp.mul_ss(invc, level[:h]))], axis=0)
    return jnp.where(zl != 0, jnp.zeros_like(invc[:n]), invc[:n])


def _kara_decompress_2d(snaps: list, bit_read) -> list:
    """Decompress 6 compressed snapshots ((8*tb, LANES) each, component-major
    [g2, g3, g4, g5]) to full Fq12 2D blocks ((12*tb, LANES), flat tower
    order), sharing ONE in-kernel tree inversion across all denominators
    (tower.decompress_cyclotomic formulas)."""
    from ... import rns_constants as RC
    from . import tower as tw

    tb = snaps[0].shape[0] // 8
    sl = lambda a, i: a[i * tb : (i + 1) * tb]
    nums, dens, metas = [], [], []
    for c in snaps:
        g2 = (fp.wrap(sl(c, 0)), fp.wrap(sl(c, 1)))
        g3 = (fp.wrap(sl(c, 2)), fp.wrap(sl(c, 3)))
        g4 = (fp.wrap(sl(c, 4)), fp.wrap(sl(c, 5)))
        g5 = (fp.wrap(sl(c, 6)), fp.wrap(sl(c, 7)))
        g3p = (fp.to_prod(sl(c, 2)), fp.to_prod(sl(c, 3)))
        g5sq = tw.fq2_mul_r(*g5, *g5)
        g4sq = tw.fq2_mul_r(*g4, *g4)
        g4g5 = tw.fq2_mul_r(*g4, *g5)
        num1 = tw._pair_sub(
            tw._pair_add(tw.fq2_nonres(g5sq), tw._pair_scale(g4sq, 3)),
            tw._pair_scale(g3p, 2))
        num2 = tw._pair_scale(g4g5, 8)
        s1 = _redc_rows([num1[0], num1[1], num2[0], num2[1]])  # (4tb, L)
        z2 = jnp.minimum(_is_zero_lane_2d(sl(c, 0)),
                         _is_zero_lane_2d(sl(c, 1)))  # (tb, L) lane mask
        z2c = jnp.concatenate([z2, z2], axis=0)
        num = jnp.where(z2c != 0, s1[2 * tb :], s1[: 2 * tb])
        den = jnp.where(z2c != 0, c[2 * tb : 4 * tb], c[: 2 * tb])
        nums.append(num)
        dens.append(den)
        metas.append((g2, g3, g4, g5))
    # one shared inversion: norms of all 6 dens (6*tb rows)
    c0s = jnp.concatenate([d[:tb] for d in dens], axis=0)  # (6tb, L)
    c1s = jnp.concatenate([d[tb:] for d in dens], axis=0)
    norm = fp.redc(fp.mul_rr(fp.wrap(c0s), fp.wrap(c0s))
                   + fp.mul_rr(fp.wrap(c1s), fp.wrap(c1s)))
    ninv = _tree_inv_2d(norm, bit_read)
    # dinv = (c0 - c1 u) * ninv / 4  (fold the Karabina 1/4 into ninv)
    quarter = fp.wrap(fp.cst(("kara_quarter",),
                             fp.RC.encode_int(pow(4, -1, fp.P))))
    nq = fp.redc(fp.mul_rr(fp.wrap(ninv), quarter))
    w = fp.wrap(nq)
    dinv = _redc_rows([fp.mul_rr(fp.wrap(c0s), w),
                       fp.mul_rr(fp.neg_r(fp.wrap(c1s), 4), w)])  # (12tb, L)
    fulls = []
    for k in range(6):
        di = (fp.wrap(dinv[k * tb : (k + 1) * tb]),
              fp.wrap(dinv[6 * tb + k * tb : 6 * tb + (k + 1) * tb]))
        nu = (fp.wrap(nums[k][:tb]), fp.wrap(nums[k][tb:]))
        g1w = tw.fq2_mul_r(*nu, *di)
        g1s = _redc_rows([g1w[0], g1w[1]])  # (2tb, L)
        g1 = (fp.wrap(g1s[:tb]), fp.wrap(g1s[tb:]))
        g2, g3, g4, g5 = metas[k]
        g1sq = tw.fq2_mul_r(*g1, *g1)
        g2g5 = tw.fq2_mul_r(*g2, *g5)
        g3g4 = tw.fq2_mul_r(*g3, *g4)
        inner = tw._pair_sub(
            tw._pair_add(tw._pair_scale(g1sq, 2), g2g5),
            tw._pair_scale(g3g4, 3))
        one_p = fp.to_prod(
            jnp.broadcast_to(fp.cst(("one_row",), np.asarray(fp.RC.ONE)),
                             (tb, LANES)))
        g0w = tw._pair_add(tw.fq2_nonres(inner), (one_p, one_p.scale(0)))
        g0s = _redc_rows([g0w[0], g0w[1]])
        c = snaps[k]
        fulls.append(jnp.concatenate([
            g0s,                       # components 0,1
            c[4 * tb : 6 * tb],        # g4 -> 2,3
            c[2 * tb : 4 * tb],        # g3 -> 4,5
            c[0 * tb : 2 * tb],        # g2 -> 6,7
            g1s,                       # 8,9
            c[6 * tb : 8 * tb],        # g5 -> 10,11
        ], axis=0))
    return fulls


def _fq12_prod6_2d(fulls: list) -> jnp.ndarray:
    """Product of 6 component-major Fq12 blocks: one 3x-batched mul, one
    single mul, one final mul."""
    tb = fulls[0].shape[0] // 12
    catc = lambda fs: jnp.concatenate(
        [jnp.concatenate([f[i * tb : (i + 1) * tb] for f in fs], axis=0)
         for i in range(12)], axis=0)
    a3 = catc([fulls[0], fulls[2], fulls[4]])
    b3 = catc([fulls[1], fulls[3], fulls[5]])
    p3 = _fq12_mul_2d(a3, b3)  # (12*3tb, L) component-major over 3tb rows
    t3 = 3 * tb
    p = [jnp.concatenate([p3[i * t3 + k * tb : i * t3 + (k + 1) * tb]
                          for i in range(12)], axis=0) for k in range(3)]
    q0 = _fq12_mul_2d(p[0], p[1])
    return _fq12_mul_2d(q0, p[2])


@functools.lru_cache(maxsize=4)
def _build_kara_full(segments: tuple, block: int, interpret: bool = False):
    """Whole cyclotomic exponentiation f -> f^|x| in one kernel via Karabina:
    segments are the ascending-set-bit chain lengths (kara_exp_run's)."""

    def whole(a2d: jnp.ndarray, bit_read) -> jnp.ndarray:
        # a2d: (12*block, LANES) full cyclotomic element, component-major
        from . import tower as tw

        tb = a2d.shape[0] // 12
        idx = tw._KARA_IDX
        c = jnp.concatenate([a2d[i * tb : (i + 1) * tb] for i in idx], axis=0)
        snaps = []
        for seg in segments:
            if seg:
                c = jax.lax.fori_loop(
                    0, seg, lambda _, x: _kara_square_2d(x), c)
            snaps.append(c)
        fulls = _kara_decompress_2d(snaps, bit_read)
        return _fq12_prod6_2d(fulls)

    abstract = [jax.ShapeDtypeStruct((12 * block, LANES), jnp.int32),
                jax.ShapeDtypeStruct(_FERMAT_BITS.shape, jnp.int32)]
    tags, _ = _collect_tags(
        lambda a, bits: whole(a, lambda i: bits[0, i]), abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        lookup = {t: r[...] for (t, _), r in zip(tag_list, refs[: len(tag_list)])}
        bits_ref = refs[len(tag_list)]
        prev = fp.set_const_hook(lambda t, v: lookup[t])
        try:
            a = refs[-2][...].reshape(12 * block, LANES)
            refs[-1][...] = whole(
                a, lambda i: bits_ref[0, i]).reshape(12, block, LANES)
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    bits_spec = pl.BlockSpec(_FERMAT_BITS.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    espec = pl.BlockSpec((12, block, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)

    def run(acm: jnp.ndarray):  # (12, rows, LANES) component-major
        const_arrays = [jnp.asarray(v) for v in const_np]
        rows = acm.shape[1]
        npad = (-rows) % block
        ap = jnp.pad(acm, ((0, 0), (0, npad), (0, 0)))
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(ap.shape, jnp.int32),
            grid=((rows + npad) // block,),
            in_specs=const_specs + [bits_spec, espec],
            out_specs=espec,
            interpret=interpret,
            **kwargs,
        )(*const_arrays, jnp.asarray(_FERMAT_BITS), ap)
        return out[:, :rows]

    return run


def kara_full_run(a: jnp.ndarray, segments: tuple, block: int = 256,
                  interpret: bool = False) -> jnp.ndarray:
    """a^|x| for a (..., 12, LANES) cyclotomic element — Karabina chain,
    decompression, shared inversion and snapshot product all in ONE kernel."""
    batch_shape = a.shape[:-2]
    flat = a.reshape(-1, 12, LANES)
    acm = jnp.moveaxis(flat, 1, 0)
    out = _build_kara_full(tuple(segments),
                           min(block, max(8, flat.shape[0])), interpret)(acm)
    return jnp.moveaxis(out, 0, 1).reshape(*batch_shape, 12, LANES)


def _segments_to_flags(segments: tuple) -> np.ndarray:
    """(n_squares, multiply_after) segments -> per-level multiply flags
    ((1, n_levels) int32): level i = one squaring, then a multiply iff
    flag[i]."""
    flags = []
    for n_sq, mul_after in segments:
        flags.extend([0] * n_sq)
        if mul_after:
            flags[-1] = 1
    return np.asarray(flags, dtype=np.int32).reshape(1, -1)


@functools.lru_cache(maxsize=4)
def _build_cyc_exp_cond(segments: tuple, block: int, interpret: bool = False):
    """Compile-lean variant of _build_cyc_exp: ONE fori over levels with the
    multiply under lax.cond (flags in SMEM). Mosaic compiles the square and
    mul subgraphs once instead of per segment (~3x smaller kernel; the
    production default because the whole-kernel Mosaic compile is the
    dominant cold-compile cost), for a ~5% runtime hit vs the
    segment-unrolled form (cond overhead at every level)."""
    flags_np = _segments_to_flags(segments)
    n_levels = flags_np.shape[1]

    def whole(f, flag_read):
        def body(i, acc):
            acc = _cyc_square_2d(acc)
            return jax.lax.cond(flag_read(i) != 0,
                                lambda x: _fq12_mul_2d(x, f), lambda x: x,
                                acc)

        return jax.lax.fori_loop(0, n_levels, body, f)

    abstract = [jax.ShapeDtypeStruct((12 * block, LANES), jnp.int32),
                jax.ShapeDtypeStruct(flags_np.shape, jnp.int32)]
    tags, _ = _collect_tags(
        lambda a, fl: whole(a, lambda i: fl[0, i]), abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        lookup = {t: r[...] for (t, _), r in zip(tag_list, refs[: len(tag_list)])}
        flags_ref = refs[len(tag_list)]
        prev = fp.set_const_hook(lambda t, v: lookup[t])
        try:
            f = refs[-2][...].reshape(12 * block, LANES)
            out = whole(f, lambda i: flags_ref[0, i])
            refs[-1][...] = out.reshape(12, block, LANES)
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    flags_spec = pl.BlockSpec(flags_np.shape, lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    espec = pl.BlockSpec((12, block, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)

    def run(acm: jnp.ndarray):  # (12, rows, LANES) component-major
        const_arrays = [jnp.asarray(v) for v in const_np]
        rows = acm.shape[1]
        npad = (-rows) % block
        ap = jnp.pad(acm, ((0, 0), (0, npad), (0, 0)))
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(ap.shape, jnp.int32),
            grid=((rows + npad) // block,),
            in_specs=const_specs + [flags_spec, espec],
            out_specs=espec,
            interpret=interpret,
            **kwargs,
        )(*const_arrays, jnp.asarray(flags_np), ap)
        return out[:, :rows]

    return run


@functools.lru_cache(maxsize=4)
def _build_cyc_exp(segments: tuple, block: int, interpret: bool = False):
    """segments: (n_squares, multiply_after) pairs, MSB-first after the
    leading bit; acc starts at f."""
    abstract = [jax.ShapeDtypeStruct((12 * block, LANES), jnp.int32)]
    tags, _ = _collect_tags(lambda a: _fq12_mul_2d(_cyc_square_2d(a), a),
                            abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        lookup = {t: r[...] for (t, _), r in zip(tag_list, refs[: len(tag_list)])}
        prev = fp.set_const_hook(lambda t, v: lookup[t])
        try:
            f = refs[-2][...].reshape(12 * block, LANES)
            acc = f
            for n_sq, mul_after in segments:
                if n_sq:
                    acc = jax.lax.fori_loop(
                        0, n_sq, lambda _, x: _cyc_square_2d(x), acc)
                if mul_after:
                    acc = _fq12_mul_2d(acc, f)
            refs[-1][...] = acc.reshape(12, block, LANES)
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    espec = pl.BlockSpec((12, block, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)

    def run(acm: jnp.ndarray):  # (12, rows, LANES) component-major
        const_arrays = [jnp.asarray(v) for v in const_np]
        rows = acm.shape[1]
        npad = (-rows) % block
        ap = jnp.pad(acm, ((0, 0), (0, npad), (0, 0)))
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(ap.shape, jnp.int32),
            grid=((rows + npad) // block,),
            in_specs=const_specs + [espec],
            out_specs=espec,
            interpret=interpret,
            **kwargs,
        )(*const_arrays, ap)
        return out[:, :rows]

    return run


import os as _os

#: Kernel structure for cyc_exp_run: "segments" (default) unrolls the 6
#: square runs and 5 muls — fastest runtime (60.0k vs 55.0k pairings/s at
#: B=2048 on v5e) at ~150 s one-time Mosaic compile (persistent-cached, so
#: only a fresh environment pays it); "cond" runs one fori with the multiply
#: under lax.cond — ~3x faster cold compile, but the per-level cond costs
#: the whole kernel advantage back.
_CYC_EXP_IMPL = _os.environ.get("RNS_CYC_EXP_IMPL", "segments")


def cyc_exp_run(a: jnp.ndarray, segments: tuple, block: int = 512,
                interpret: bool = False) -> jnp.ndarray:
    """a^X for a (..., 12, LANES) cyclotomic element, X given as static
    MSB-first (n_squares, multiply_after) segments, in ONE kernel."""
    batch_shape = a.shape[:-2]
    flat = a.reshape(-1, 12, LANES)
    acm = jnp.moveaxis(flat, 1, 0)
    build = (_build_cyc_exp if _CYC_EXP_IMPL == "segments"
             else _build_cyc_exp_cond)
    out = build(tuple(segments),
                min(block, max(8, flat.shape[0])), interpret)(acm)
    return jnp.moveaxis(out, 0, 1).reshape(*batch_shape, 12, LANES)


@functools.lru_cache(maxsize=4)
def _build_kara_exp(segments: tuple, block: int, interpret: bool = False):
    """Whole-exponentiation Karabina kernel: runs the full compressed-square
    chain with segment lengths `segments` and emits the state after each
    segment (the f^(2^e_k) snapshots) — one kernel launch per cyclotomic
    exponentiation instead of one per segment."""
    nsnap = len(segments)
    abstract = [jax.ShapeDtypeStruct((8 * block, LANES), jnp.int32)]
    tags, _ = _collect_tags(lambda a: _kara_square_2d(a), abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        lookup = {t: r[...] for (t, _), r in zip(tag_list, refs[: len(tag_list)])}
        prev = fp.set_const_hook(lambda t, v: lookup[t])
        try:
            a = refs[-2][...].reshape(8 * block, LANES)
            for k, seg in enumerate(segments):
                if seg:
                    a = jax.lax.fori_loop(
                        0, seg, lambda _, acc: _kara_square_2d(acc), a)
                refs[-1][k] = a.reshape(8, block, LANES)
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    espec = pl.BlockSpec((8, block, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((nsnap, 8, block, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM)

    def run(acm: jnp.ndarray):  # (8, rows, LANES) component-major
        const_arrays = [jnp.asarray(v) for v in const_np]
        rows = acm.shape[1]
        npad = (-rows) % block
        ap = jnp.pad(acm, ((0, 0), (0, npad), (0, 0)))
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nsnap,) + ap.shape, jnp.int32),
            grid=((rows + npad) // block,),
            in_specs=const_specs + [espec],
            out_specs=ospec,
            interpret=interpret,
            **kwargs,
        )(*const_arrays, ap)
        return out[:, :, :rows]

    return run


def kara_exp_run(a: jnp.ndarray, segments: tuple, block: int = 256,
                 interpret: bool = False) -> jnp.ndarray:
    """Karabina chain with snapshots: a (..., 8, LANES) compressed element ->
    (nsnap, ..., 8, LANES) where snapshot k is a^(2^(sum segments[:k+1]))."""
    batch_shape = a.shape[:-2]
    flat = a.reshape(-1, 8, LANES)
    acm = jnp.moveaxis(flat, 1, 0)
    out = _build_kara_exp(tuple(segments),
                          min(block, max(8, flat.shape[0])), interpret)(acm)
    out = jnp.moveaxis(out, 1, 2)  # (nsnap, rows, 8, LANES)
    return out.reshape((len(segments),) + batch_shape + (8, LANES))


# ---------------------------------------------------------------------------
# Whole-Miller-loop kernel: all 68 ell(+square) steps back-to-back with the
# Fq12 accumulator resident in VMEM; the step-major coefficient tensor
# streams through double-buffered row blocks; the per-step square flags sit
# in SMEM. Same one-source-of-truth mechanism: the kernel body re-runs
# models/pairing_rns._ell_scaled and tower._square_impl under the cst hook.
# ---------------------------------------------------------------------------


def _miller_step_formula(f, triple, py, px, skip, do_square: bool):
    """One Miller step on jnp values (used for tag collection with both
    branches, and as the kernel body)."""
    from ...models import pairing_rns as mpr
    from . import tower as tw

    pyw = fp.wrap(py[..., None, :])
    pxw = fp.wrap(px[..., None, :])
    f = mpr._ell_scaled(f, triple, pyw, pxw, skip)
    return tw._square_impl(f) if do_square else f


@functools.lru_cache(maxsize=8)
def _build_miller(nsteps: int, block: int, rows_pad: int,
                  interpret: bool = False):
    from . import tower as tw

    abstract = [
        jax.ShapeDtypeStruct((block, 12, LANES), jnp.int32),   # f
        jax.ShapeDtypeStruct((block, 3, 2, LANES), jnp.int32),  # one triple
        jax.ShapeDtypeStruct((block, LANES), jnp.int32),        # py
        jax.ShapeDtypeStruct((block, LANES), jnp.int32),        # px
        jax.ShapeDtypeStruct((block, LANES), jnp.int32),        # skip
    ]
    tags, _ = _collect_tags(
        lambda f, tr, py, px, sk: _miller_step_formula(f, tr, py, px, sk, True),
        abstract)
    tag_list = list(tags.items())
    const_np = [_as2d(v) for _, v in tag_list]

    def kernel(*refs):
        const_refs = refs[: len(tag_list)]
        flags_ref, coeffs_ref, py_ref, px_ref, skip_ref, f0_ref = \
            refs[len(tag_list) : -2]
        out_ref, f_scratch = refs[-2], refs[-1]
        j = pl.program_id(0)  # schedule step (slow axis)
        i = pl.program_id(1)  # row block
        lookup = {t: r[...] for (t, _), r in zip(tag_list, const_refs)}
        prev = fp.set_const_hook(lambda t, v: lookup[t])
        try:
            rows = pl.ds(pl.multiple_of(i * block, block), block)

            @pl.when(j == 0)
            def _():
                f_scratch[rows] = f0_ref[...]

            f = _miller_step_formula(f_scratch[rows], coeffs_ref[0],
                                     py_ref[...], px_ref[...], skip_ref[...],
                                     False)
            # fresh lambdas: a module-level branch function would hit
            # lax.cond's cross-trace jaxpr cache and leak the previous kernel
            # trace's constant lookups into this one
            f = jax.lax.cond(flags_ref[0, j] != 0,
                             lambda x: tw._square_impl(x), lambda x: x, f)
            f_scratch[rows] = f
            out_ref[...] = f
        finally:
            fp.set_const_hook(prev)

    const_specs = [
        pl.BlockSpec(arr.shape, (lambda j, i, nd=arr.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for arr in const_np
    ]
    flags_spec = pl.BlockSpec((1, nsteps), lambda j, i: (0, 0),
                              memory_space=pltpu.SMEM)
    coeffs_spec = pl.BlockSpec((1, block, 3, 2, LANES),
                               lambda j, i: (j, i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((block, LANES), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((block, 12, LANES), lambda j, i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def run(f0, coeffs, py, px, skip, flags):
        const_arrays = [jnp.asarray(v) for v in const_np]
        n = f0.shape[0]
        npad = rows_pad - n
        pad_r = lambda a: jnp.pad(a, ((0, npad),) + ((0, 0),) * (a.ndim - 1))
        coeffs_p = jnp.pad(coeffs, ((0, 0), (0, npad)) + ((0, 0),) * 3)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows_pad, 12, LANES), jnp.int32),
            grid=(nsteps, rows_pad // block),
            in_specs=const_specs + [flags_spec, coeffs_spec, row_spec,
                                    row_spec, row_spec, f_spec],
            out_specs=f_spec,
            scratch_shapes=[pltpu.VMEM((rows_pad, 12, LANES), jnp.int32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*const_arrays, flags, coeffs_p, pad_r(py), pad_r(px),
          pad_r(skip), pad_r(f0))
        return out[:n]

    return run


#: f-scratch budget: the whole accumulator lives in VMEM for the kernel's
#: lifetime; beyond this the batch is chunked into separate kernel calls.
_MILLER_SCRATCH_ROWS = 4096


def miller_run(f0: jnp.ndarray, coeffs_stepmajor: jnp.ndarray,
               py: jnp.ndarray, px: jnp.ndarray, skip: jnp.ndarray,
               do_square_flags: np.ndarray, block: int = 256,
               interpret: bool = False) -> jnp.ndarray:
    """The full single-term Miller accumulation (68 ell steps, 62 squares) in
    ONE kernel: grid (step, row-block) with the whole Fq12 accumulator in a
    persistent VMEM scratch (it never touches HBM between steps) and the
    step's coefficient block double-buffered in. f0/py/px/skip: (rows, ...)
    row-major; coeffs_stepmajor: (68, rows, 3, 2, LANES)."""
    nsteps = coeffs_stepmajor.shape[0]
    assert len(do_square_flags) == nsteps
    rows = f0.shape[0]
    flags = jnp.asarray(np.asarray(do_square_flags, dtype=np.int32).reshape(1, -1))
    if rows > _MILLER_SCRATCH_ROWS:  # chunk: scratch must fit VMEM
        outs = []
        for lo in range(0, rows, _MILLER_SCRATCH_ROWS):
            hi = min(lo + _MILLER_SCRATCH_ROWS, rows)
            outs.append(miller_run(f0[lo:hi], coeffs_stepmajor[:, lo:hi],
                                   py[lo:hi], px[lo:hi], skip[lo:hi],
                                   do_square_flags, block, interpret))
        return jnp.concatenate(outs, axis=0)
    block = min(block, max(8, rows))
    rows_pad = -(-rows // block) * block
    runner = _build_miller(nsteps, block, rows_pad, interpret)
    return runner(f0, coeffs_stepmajor, py, px, skip, flags)


def pow_static_fused(a: jnp.ndarray, exponent: int, block: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """a^exponent with the whole MSB-first square-and-multiply loop in one
    kernel. a: (..., LANES) stored elements."""
    assert exponent >= 1
    bits = np.array(
        [(exponent >> i) & 1 for i in range(exponent.bit_length() - 2, -1, -1)],
        dtype=np.int32,
    )  # after the leading 1
    runner = _build_pow(len(bits), block, interpret)
    batch_shape = a.shape[:-1]
    flat = a.reshape(-1, LANES)
    out = runner(flat, jnp.asarray(bits.reshape(1, -1)))
    return out.reshape(*batch_shape, LANES)
