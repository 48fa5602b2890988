"""Batched BLS12-381 optimal-ate pairing on the RNS arithmetic tier.

Same pipeline as the flagship limb-tier model (models/pairing.py — the TPU
re-design of the reference's src/fields_as_trees/miller_loop.rs with defects
#1-#3 fixed), sharing its static schedule tables (_IS_ADD / _DO_SQUARE) and
hard-part instruction program (_HP_PROG), but running every field op on the
RNS core (ops/rns/): one int32 lane-multiply per Fp product, MXU base
extensions, no limb convolutions. Bit-compatible results: encode/decode round
through the same exact-integer refmodel, so e(P, Q) values are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import rns_constants as RC
from ..ops.rns import fp, tower
from ..ops.rns.lines import G1Affine, G2Affine, G2Projective, addition_step, doubling_step
from . import pairing as base

NUM_COEFFS = base.NUM_COEFFS


# ---------------------------------------------------------------------------
# G2 preparation (reference G2PreparedTarget, miller_loop.rs:182-235)
# ---------------------------------------------------------------------------


def _schedule_runs():
    """Static run-length structure of the 68-triple schedule: maximal runs of
    doubling steps separated by the 5 addition steps (no lax.cond anywhere —
    a cond inside a scan costs ~0.13 ms/step at B=2048 on v5e, comparable to
    the step's whole arithmetic)."""
    runs = []  # (n_doubling_steps, has_addition_after)
    n = 0
    for is_add in base._IS_ADD:
        if is_add:
            runs.append((n, True))
            n = 0
        else:
            n += 1
    if n:
        runs.append((n, False))
    assert sum(r[0] for r in runs) + sum(r[1] for r in runs) == NUM_COEFFS
    return runs


_RUNS = _schedule_runs()


def prepare_g2_stepmajor(q: G2Affine) -> jnp.ndarray:
    """Line-coefficient tensor in scan-native step-major layout
    (68, ..., 3, 2, LANES); infinity inputs are substituted with the
    generator (miller_loop.rs:218-219) and masked out inside the Miller
    scan. Step-major avoids two full-tensor transposition copies (the
    coefficient tensor is the pipeline's largest: ~430 MB at B=2048).
    Doubling runs are plain scans; the 5 additions are unrolled."""
    q = G2Affine.generator_like(q).conditional_select(q.infinity, q)
    r = G2Projective.from_affine(q)

    def dbl_body(r, _):
        r2, (c0, c1, c2) = doubling_step(r)
        return r2, jnp.stack([c0, c1, c2], axis=-3)

    chunks = []
    for n_dbl, has_add in _RUNS:
        if n_dbl:
            r, coeffs = jax.lax.scan(dbl_body, r, None, length=n_dbl)
            chunks.append(coeffs)
        if has_add:
            r, (c0, c1, c2) = addition_step(r, q)
            chunks.append(jnp.stack([c0, c1, c2], axis=-3)[None])
    coeffs = jnp.concatenate(chunks, axis=0)
    assert coeffs.shape[0] == NUM_COEFFS
    return coeffs


def prepare_g2(q: G2Affine) -> jnp.ndarray:
    """Batch-major line-coefficient tensor (..., 68, 3, 2, LANES) — the
    reference G2PreparedTarget layout (miller_loop.rs:182-235)."""
    return jnp.moveaxis(prepare_g2_stepmajor(q), 0, -4)


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------


def _ell_scaled(f: jnp.ndarray, triple: jnp.ndarray, py: fp.R, px: fp.R,
                skip) -> jnp.ndarray:
    """One term's ell with in-scan coefficient scaling (ell's c0*P.y, c1*P.x,
    reference miller_loop.rs:450-456 — defect #1 fixed) and the reference's
    identity-select for infinity terms (:265-268): f is left unchanged.
    triple: (..., 3, 2, LANES) raw line triple; skip: packed lane mask."""
    c0 = fp.wrap(triple[..., 0, :, :])
    c1 = fp.wrap(triple[..., 1, :, :])
    c2 = triple[..., 2, :, :]
    r0 = fp.mul_rr(c0, py)  # (..., 2, LANES)
    r1 = fp.mul_rr(c1, px)
    merged = fp.R(jnp.concatenate([r0.ch, r1.ch], axis=-2),
                  min(r0.lo, r1.lo), max(r0.hi, r1.hi),
                  min(r0.vlo, r1.vlo), max(r0.vhi, r1.vhi))
    sc = fp.redc(merged)  # rows 0:2 = c0*P.y, rows 2:4 = c1*P.x
    new_f = tower.mul_by_014(f, c2, sc[..., 2:4, :], sc[..., 0:2, :])
    return jnp.where(skip[..., None, :] != 0, f, new_f)


def _miller_runs():
    """Runs of uniform ell+square steps, broken at the 6 squareless triples
    (the 5 pre-addition doubling triples and the final doubling;
    base._DO_SQUARE)."""
    runs = []  # (n_uniform_steps, has_squareless_step_after)
    n = 0
    for sq in base._DO_SQUARE:
        if sq:
            n += 1
        else:
            runs.append((n, True))
            n = 0
    if n:
        runs.append((n, False))
    assert sum(r[0] for r in runs) + sum(r[1] for r in runs) == NUM_COEFFS
    return runs


_MILLER_RUNS = _miller_runs()


def miller_steps_raw(f: jnp.ndarray, raw_list: list, pys: list, pxs: list,
                     skips: list) -> jnp.ndarray:
    """The Miller accumulation over step-major RAW triples, scaling each
    step's coefficients inside the body (4 extra REDC rows per term — far
    cheaper than materializing a scaled copy of the 68-step tensor). Uniform
    ell+square runs are plain scans; the 6 squareless ells are unrolled — no
    lax.cond in any scan body."""

    def ells(f, triples):
        for t in range(len(raw_list)):
            f = _ell_scaled(f, triples[t], pys[t], pxs[t], skips[t])
        return f

    def body(f, triples):
        return tower.square(ells(f, triples)), None

    j = 0
    for n_uniform, has_break in _MILLER_RUNS:
        if n_uniform:
            xs = tuple(r[j : j + n_uniform] for r in raw_list)
            f, _ = jax.lax.scan(body, f, xs)
            j += n_uniform
        if has_break:
            f = ells(f, tuple(r[j] for r in raw_list))
            j += 1
    return f


def miller_steps_range(f: jnp.ndarray, raw_list: list, pys: list, pxs: list,
                       skips: list, start: int, stop: int) -> jnp.ndarray:
    """Schedule steps [start, stop) of the Miller accumulation, unrolled —
    the chunked-execution entry for checkpoint/resume
    (utils/checkpoint.py run_pairing_checkpointed_rns). Bit-identical to the
    corresponding slice of miller_steps_raw's run structure."""
    for j in range(start, stop):
        for t in range(len(raw_list)):
            f = _ell_scaled(f, raw_list[t][j], pys[t], pxs[t], skips[t])
        if base._DO_SQUARE[j]:
            f = tower.square(f)
    return f


def miller_loop(ps, prepared_stepmajor, q_infinities=None) -> jnp.ndarray:
    """Fused product of Miller loops over T terms.

    ps: G1Affine or list; prepared_stepmajor: matching (68, ..., 3, 2, L)
    tensors from prepare_g2_stepmajor. Returns f: (..., 12, LANES)
    (reference multi_miller_loop, miller_loop.rs:247-344)."""
    if not isinstance(ps, (list, tuple)):
        ps = [ps]
        prepared_stepmajor = [prepared_stepmajor]
        q_infinities = [q_infinities]
    if q_infinities is None:
        q_infinities = [None] * len(ps)
    pys, pxs, skips = [], [], []
    for p, qinf in zip(ps, q_infinities):
        if qinf is None:
            qinf = jnp.zeros(p.infinity.shape, dtype=jnp.int32)
        pys.append(fp.wrap(p.y[..., None, :]))
        pxs.append(fp.wrap(p.x[..., None, :]))
        skips.append(((p.infinity != 0) | (qinf != 0)).astype(jnp.int32))
    rows = ps[0].infinity.shape[:-1]  # infinity is a packed lane mask
    f = jnp.broadcast_to(tower.one(), (*rows, 12, fp.LANES))
    import os as _os

    # Opt-in (measured SLOWER than XLA on v5e: 24.0k vs 34.1k pairings/s at
    # B=2048 — unlike the whole-run cyclotomic kernel, the Miller step body
    # loses more to Mosaic codegen than it gains from keeping f in VMEM;
    # same verdict as the per-op fused tower kernels, ops/rns/fp.py)
    use_miller_kernel = _os.environ.get("RNS_MILLER_KERNEL", "0") == "1"
    if fp.use_fused() and use_miller_kernel and len(ps) == 1 and len(rows) == 1:
        # whole Miller loop in ONE Pallas kernel: the Fq12 accumulator stays
        # in VMEM across all 68 steps; coefficients stream through
        # double-buffered per-step row blocks
        from ..ops.rns import pallas as rpk

        qinf = q_infinities[0]
        if qinf is None:
            qinf = jnp.zeros_like(ps[0].infinity)
        skip = ((ps[0].infinity != 0) | (qinf != 0)).astype(jnp.int32)
        f = rpk.miller_run(f, prepared_stepmajor[0], ps[0].y, ps[0].x, skip,
                           base._DO_SQUARE)
    else:
        f = miller_steps_raw(f, prepared_stepmajor, pys, pxs, skips)
    if RC.rm.BLS_X_IS_NEGATIVE:
        f = tower.conjugate(f)
    return f


# ---------------------------------------------------------------------------
# Final exponentiation (reference miller_loop.rs:29-178)
# ---------------------------------------------------------------------------


def _exp_runs():
    """BLS_X square-and-multiply schedule as runs of squarings separated by
    the 5 multiplies (bits of BLS_X after the leading 1)."""
    runs = []
    n = 0
    for b in base.C.BLS_X_BITS[1:]:
        n += 1
        if b:
            runs.append((n, True))
            n = 0
    if n:
        runs.append((n, False))
    return runs


_EXP_RUNS = _exp_runs()


#: Set-bit positions of |BLS_X|, ascending (6 bits incl. the leading one).
_X_SET_BITS = [i for i in range(base.C.BLS_X.bit_length())
               if (base.C.BLS_X >> i) & 1]


def cyclotomic_exp(f: jnp.ndarray) -> jnp.ndarray:
    """conj(f^BLS_X) = f^(-|x|) for cyclotomic f (reference "cycolotomic_exp"
    miller_loop.rs:106-126 with defect #2 fixed).

    Karabina compressed squaring (tower.compressed_square, eprint 2010/542):
    f^|x| = prod_k f^(2^(e_k)) over |x|'s set bits, so the whole chain runs
    on 8-component compressed state (8 REDC rows + 4 Fq2 products per square
    vs Granger-Scott's 12 + 9); the 6 snapshots f^(2^(e_k)) are decompressed
    TOGETHER — their Fq2 inversions all ride one batched Montgomery-tree
    fp.inv — then multiplied. Economical exactly because inversion stopped
    being a 570-step Fermat pow. Unlike the limb tier (models/pairing.py),
    no instruction-table VM and no lax.cond anywhere: runs are plain scans
    (fused: whole-run Pallas kernels keeping the state in VMEM)."""

    def sq_body(acc, _):
        return tower.compressed_square(acc), None

    c = tower.compress_cyclotomic(f)
    segs = tuple(e - l for e, l in zip(_X_SET_BITS, [0] + _X_SET_BITS[:-1]))
    if fp.use_fused():
        # the whole chain + all 6 snapshots in ONE kernel launch
        from ..ops.rns import pallas as rpk

        stacked = rpk.kara_exp_run(c, segs)
    else:
        snaps = []
        for seg in segs:
            if seg:
                c, _ = jax.lax.scan(sq_body, c, None, length=seg)
            snaps.append(c)
        stacked = jnp.stack(snaps, axis=0)
    fulls = tower.decompress_cyclotomic(stacked)
    acc = fulls[0]
    for i in range(1, len(segs)):
        acc = tower.mul(acc, fulls[i])
    return tower.conjugate(acc)


def final_exponentiation(f: jnp.ndarray) -> jnp.ndarray:
    """Easy part + the zkcrypto hard-part chain (f^(3*(p^12-1)/r); reference
    miller_loop.rs:128-178 with defect #2 fixed), unrolled over the RNS tower
    (same op sequence as models/pairing.py _hard_part_program)."""
    t0 = tower.conjugate(f)
    t1 = tower.inv(f)
    t2 = tower.mul(t0, t1)
    t1 = t2
    t2 = tower.frobenius_pow(t2, 2)
    t2 = tower.mul(t2, t1)  # easy part done; t2 is cyclotomic

    t1 = tower.conjugate(tower.cyclotomic_square(t2))
    t3 = cyclotomic_exp(t2)
    t4 = tower.cyclotomic_square(t3)
    t5 = tower.mul(t1, t3)
    t1 = cyclotomic_exp(t5)
    t0 = cyclotomic_exp(t1)
    t6 = cyclotomic_exp(t0)
    t6 = tower.mul(t6, t4)
    t4 = cyclotomic_exp(t6)
    t5 = tower.conjugate(t5)
    t4 = tower.mul(t4, tower.mul(t5, t2))
    t5 = tower.conjugate(t2)
    t1 = tower.mul(t1, t2)
    t1 = tower.frobenius_pow(t1, 3)
    t6 = tower.mul(t6, t5)
    t6 = tower.frobenius_map(t6)
    t3 = tower.mul(t3, t0)
    t3 = tower.frobenius_pow(t3, 2)
    t3 = tower.mul(t3, t1)
    t3 = tower.mul(t3, t6)
    return tower.mul(t3, t4)


# ---------------------------------------------------------------------------
# Top-level API
# ---------------------------------------------------------------------------


def _fused_schedule():
    """Merged prepare+miller schedule: maximal runs of uniform
    (doubling, ell, square) steps, broken at the 5 pre-addition doublings
    (squareless), the 5 additions (with square) and the final doubling."""
    items = []
    n = 0
    for j in range(NUM_COEFFS):
        if not base._IS_ADD[j] and base._DO_SQUARE[j]:
            n += 1
            continue
        if n:
            items.append(("scan", n))
            n = 0
        items.append(("add" if base._IS_ADD[j] else "dbl_nosq", None))
    if n:
        items.append(("scan", n))
    return items


_FUSED_SCHEDULE = _fused_schedule()


def miller_loop_fused(p: G1Affine, q: G2Affine) -> jnp.ndarray:
    """Single-term Miller loop with G2 preparation FUSED into the
    accumulation: one scan carries (R, f) through the shared 68-step
    schedule, so the line coefficients are consumed the step they are
    produced — the (68, rows, 3, 2, LANES) coefficient tensor (~214 MB at
    B=2048) never exists, and the prepare and miller loops' per-iteration
    fixed costs (the dominant per-step expense on this chip) are paid once
    instead of twice. Bit-identical to prepare_g2_stepmajor + miller_loop."""
    qs = G2Affine.generator_like(q).conditional_select(q.infinity, q)
    r = G2Projective.from_affine(qs)
    py = fp.wrap(p.y[..., None, :])
    px = fp.wrap(p.x[..., None, :])
    skip = ((p.infinity != 0) | (q.infinity != 0)).astype(jnp.int32)
    rows = p.infinity.shape[:-1]
    f = jnp.broadcast_to(tower.one(), (*rows, 12, fp.LANES))

    def ell_of(f, triple):
        return _ell_scaled(f, jnp.stack(triple, axis=-3), py, px, skip)

    def body(carry, _):
        r, f = carry
        r2, triple = doubling_step(r)
        return (r2, tower.square(ell_of(f, triple))), None

    for kind, n in _FUSED_SCHEDULE:
        if kind == "scan":
            (r, f), _ = jax.lax.scan(body, (r, f), None, length=n)
        elif kind == "dbl_nosq":
            r, triple = doubling_step(r)
            f = ell_of(f, triple)
        else:  # addition step, squared
            r, triple = addition_step(r, qs)
            f = tower.square(ell_of(f, triple))
    if RC.rm.BLS_X_IS_NEGATIVE:
        f = tower.conjugate(f)
    return f


def pairing(p: G1Affine, q: G2Affine) -> jnp.ndarray:
    """Batched full pairing e(P, Q) -> (..., 12, LANES) Gt elements."""
    return final_exponentiation(miller_loop_fused(p, q))


def op_counts(batch: int = 2048) -> dict:
    """EXACT per-pairing RNS Fp-op counts (fp_mul / redc), composed from
    component traces x the static schedule. A whole-pipeline trace would
    undercount: lax.scan bodies trace once; here each component count is
    multiplied by its schedule repetition (the RNS "circuit size" —
    SURVEY.md §5's constraint-count analogue, reference dbg!(degree_bits)).
    `batch` amortizes the batched-inverse root Fermat pow (fp.inv docstring)
    over the production batch size."""
    B = 2  # one packed row
    p = G1Affine.generator((B,))
    q = G2Affine.generator((B,))
    r = G2Projective.from_affine(q)
    f = tower.one((1,))
    triple = jnp.zeros((1, 3, 2, fp.LANES), dtype=jnp.int32)
    py, px = fp.wrap(p.y[..., None, :]), fp.wrap(p.x[..., None, :])
    skip = jnp.zeros((1, fp.LANES), dtype=jnp.int32)

    def per(fn, *args):
        return {k: v / B for k, v in fp.count_fp_ops(fn, *args).items()}

    def add_to(total, part, k=1):
        for key, v in part.items():
            total[key] = total.get(key, 0) + k * v

    dbl = per(doubling_step, r)
    addc = per(lambda rr: addition_step(rr, q), r)
    ell = per(lambda ff, tr: _ell_scaled(ff, tr, py, px, skip), f, triple)
    sq = per(tower.square, f)
    cycsq = per(tower.cyclotomic_square, f)
    c8 = tower.compress_cyclotomic(f)
    ksq = per(tower.compressed_square, c8)
    mul = per(tower.mul, f, f)
    frob = per(tower.frobenius_map, f)
    # tower.inv's one fp.inv is the Montgomery product tree whose root Fermat
    # scan traces once and amortizes over the batch: count the tower part
    # with fp.inv stubbed, then add the tree analytically — up-sweep ~1 +
    # down-sweep ~2 mul/REDC per element, root pow_steps per PACKED ROW of
    # the whole batch (`batch` elements).
    orig_inv = fp.inv
    try:
        fp.inv = lambda a: a
        inv12 = per(tower.inv, f)
        # decompression of the 6 stacked exp snapshots (per exp), inv stubbed
        dec6 = per(tower.decompress_cyclotomic,
                   jnp.stack([c8] * len(_X_SET_BITS), axis=0))
    finally:
        fp.inv = orig_inv
    e = fp.P - 2
    pow_steps = (e.bit_length() - 1) + bin(e).count("1") - 1
    n_inv_calls = 1 + 5  # easy-part fq12 inv + one per cyclotomic exp
    # batched-inverse tree: ~3 mul/REDC per inverted element (easy part: 1
    # per pairing; each exp decompression: 6 Fq2 norms) + the tree-floor
    # Fermat block (fp._TREE_FLOOR rows = 128 elements) amortized per call
    tree_elems = 1 + 5 * len(_X_SET_BITS)
    root_elems = min(2 * fp._TREE_FLOOR, batch)
    tree_cost = (3 * tree_elems
                 + n_inv_calls * pow_steps * root_elems / batch)
    pow_counts = {"fp_mul": tree_cost, "redc": tree_cost}

    total: dict = {}
    add_to(total, dbl, 63)          # prepare_g2 doubling steps
    add_to(total, addc, 5)          # prepare_g2 addition steps
    add_to(total, ell, 68)          # miller ells (incl. in-scan scaling)
    add_to(total, sq, 62)           # miller squares
    add_to(total, inv12)            # easy part: fq12 closed-form inverse...
    add_to(total, pow_counts)       # ...ending in one Fermat Fp pow
    add_to(total, mul, 2)           # easy part muls
    add_to(total, frob, 2)          # easy part frobenius^2
    n_exp_sq = max(_X_SET_BITS)               # 63 compressed squares per exp
    add_to(total, cycsq, 2)                   # t1/t4 full squares
    add_to(total, ksq, 5 * n_exp_sq)          # 5 Karabina square chains
    add_to(total, dec6, 5)                    # snapshot decompressions
    add_to(total, mul, 5 * (len(_X_SET_BITS) - 1))  # snapshot products
    add_to(total, mul, 10)          # hard-part interstitial muls
    add_to(total, frob, 6)          # hard-part frobenius powers
    return total


def multi_pairing(ps: list, qs: list) -> jnp.ndarray:
    prepared = [prepare_g2_stepmajor(q) for q in qs]
    f = miller_loop(ps, prepared, [q.infinity for q in qs])
    return final_exponentiation(f)


def pairing_check(ps: list, qs: list) -> jnp.ndarray:
    return tower.is_one(multi_pairing(ps, qs))
