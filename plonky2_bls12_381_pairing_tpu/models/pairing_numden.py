"""Inversion-free numerator/denominator Miller loop (alternate model).

TPU re-design of the reference's experimental native path
(src/miller_loop_native_optimized.rs:8-127): accumulate the Miller value as a
fraction f_num / f_den — the denominator collecting the vertical-line factors
that the flagship path (models/pairing.py) elides by denominator elimination —
with exactly ONE field inversion at the very end of the loop. The reference's
defects are not replicated (SURVEY.md §2.9 #7): its final exponentiation stub
(`break` after one squaring, :116-121) is replaced by the real final
exponentiation, and its broken line embedding (all coefficients forced into the
c0.c0 slot of Fq12, :17-36) by the correct twist embedding.

Structure (per classic Miller, eprint 2010/354 without denominator elimination):
  per doubling:  f_num <- f_num^2 * l_{R,R}(P),   f_den <- f_den^2 * v_{2R}(P)
  per addition:  f_num <- f_num   * l_{R,Q}(P),   f_den <- f_den   * v_{R+Q}(P)
  f = f_num * f_den^{-1}
The reference's three line cases (chord / tangent / vertical, :14-78) appear
here as the addition-step chord, doubling-step tangent, and the vertical
factors — all batched and branch-free.

TPU detail: with the zkcrypto basis (Fq12 = Fq6[w]/(w^2 - v), untwist
x~ = x * v), a vertical evaluated at P is x_P - x_R~ = x_P * Z_R^2 - X_R * v
(Jacobian, cleared denominators) — an element of Fq6 ⊂ Fq12. The denominator
accumulator therefore stays a (..., 6, 2, L) Fq6 tensor (Fq6 is closed under
multiplication), halving its cost; that it lies in a proper subfield is also
exactly *why* final_exponentiation(f_num / f_den) == final_exponentiation(f_num)
(the easy part p^6-1 kills Fq6*), which the tests assert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops import fp, fq2, fq6, fq12, lines
from ..ops.curve import G1Affine, G2Affine, G2Projective
from . import pairing as mp

NUM_COEFFS = C.NUM_LINE_COEFFS  # 68


def prepare_g2_with_verticals(q: G2Affine):
    """Like pairing.prepare_g2, additionally emitting per-step vertical-line
    data: for each of the 68 steps, (Z'^2, X') of the point *after* the step,
    stacked as (..., 68, 2, 2, L)."""
    batch = q.infinity.shape
    q = G2Affine.generator(batch).conditional_select(q.infinity, q)
    r = G2Projective.from_affine(q)

    def step_out(r2, c0, c1, c2):
        coeff = jnp.stack([c0, c1, c2], axis=-3)
        vert = jnp.stack([fq2.square(r2.z), r2.x], axis=-3)
        return coeff, vert

    def dbl_scan(r, _):
        r2, (c0, c1, c2) = lines.doubling_step(r)
        return r2, step_out(r2, c0, c1, c2)

    coeff_chunks, vert_chunks = [], []

    def push(co, ve, stacked=False):
        if stacked:  # scan output: leading step axis -> move behind batch
            coeff_chunks.append(jnp.moveaxis(co, 0, -4))
            vert_chunks.append(jnp.moveaxis(ve, 0, -4))
        else:
            coeff_chunks.append(co[..., None, :, :, :])
            vert_chunks.append(ve[..., None, :, :, :])

    for n_dbl, has_add in mp._SEGMENTS:
        if n_dbl > 1:
            r, (cs, vs) = jax.lax.scan(dbl_scan, r, None, length=n_dbl - 1)
            push(cs, vs, stacked=True)
        r, (c0, c1, c2) = lines.doubling_step(r)
        push(*step_out(r, c0, c1, c2))
        if has_add:
            r, (a0, a1, a2) = lines.addition_step(r, q)
            push(*step_out(r, a0, a1, a2))
    r, (c0, c1, c2) = lines.doubling_step(r)
    push(*step_out(r, c0, c1, c2))

    coeffs = jnp.concatenate(coeff_chunks, axis=-4)
    verts = jnp.concatenate(vert_chunks, axis=-4)
    assert coeffs.shape[-4] == NUM_COEFFS and verts.shape[-4] == NUM_COEFFS
    return coeffs, verts


def _scale_verticals(p: G1Affine, q_infinity: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """Vertical factors as Fq6 elements (..., 68, 6, L): x_P*Z^2 - X*v, with
    multiply-by-one substituted for infinity terms (branch-free skip)."""
    zsq = verts[..., 0, :, :]  # (..., 68, 2, L)
    xr = verts[..., 1, :, :]
    px = jnp.broadcast_to(p.x[..., None, :], zsq.shape[:-2] + (fp.NLIMBS,))
    c0 = fq2.scale_fp(zsq, px)
    c1 = fq2.neg(xr)
    v = jnp.concatenate([c0, c1, fq2.zero(c0.shape[:-2])], axis=-2)  # (...,68,6,L)
    one = jnp.broadcast_to(fq6.one(), v.shape[-3:])
    skip = ((p.infinity != 0) | (q_infinity != 0))[..., None, None, None]
    return jnp.where(skip, one, v)


def _step_tables():
    """Static per-iteration coefficient indices for a *uniform* 62-step scan:
    (dbl_idx, add_idx, has_add) per Miller iteration. Iterations without an
    addition re-point add_idx at the doubling triple and mask the update out —
    uniform control flow (one compiled scan body) instead of unrolled segments,
    which keeps the compile O(1) in the schedule length."""
    dbl, add, has = [], [], []
    idx = 0
    for b in C.MILLER_BITS:
        dbl.append(idx)
        idx += 1
        if b:
            add.append(idx)
            has.append(1)
            idx += 1
        else:
            add.append(dbl[-1])
            has.append(0)
    assert idx == NUM_COEFFS - 1 and sum(has) == 5
    import numpy as np

    return (np.array(dbl), np.array(add), np.array(has, dtype=np.int32))


_DBL_IDX, _ADD_IDX, _HAS_ADD = _step_tables()


def miller_loop_numden(ps, prepared, verticals, q_infinities=None):
    """Fused num/den Miller loop over T terms. Returns f = f_num / f_den as a
    (..., 12, NLIMBS) Fq12 tensor (one inversion total, of an Fq6 element)."""
    ps, scaled = mp.scale_all_coeffs(ps, prepared, q_infinities)
    if not isinstance(verticals, (list, tuple)):
        verticals = [verticals]
    if q_infinities is None or not isinstance(q_infinities, (list, tuple)):
        q_infinities = [q_infinities] * len(ps)
    verts = []
    for p, v, qinf in zip(ps, verticals, q_infinities):
        if qinf is None:
            qinf = jnp.zeros(p.infinity.shape, dtype=jnp.int32)
        verts.append(_scale_verticals(p, qinf, v))

    batch = ps[0].infinity.shape
    f_num = jnp.broadcast_to(fq12.one(), (*batch, 12, fp.NLIMBS))
    f_den = jnp.broadcast_to(fq6.one(), (*batch, 6, fp.NLIMBS))

    # per-iteration xs: (62, T, ..., 3, 2, L) dbl/add triples + (62,) mask
    def gather(arrs, idx_tab, step_axis):
        g = jnp.stack([a.take(idx_tab, axis=step_axis) for a in arrs], axis=0)
        return jnp.moveaxis(g, step_axis, 0)  # (62, T, ...)

    xs = (
        gather(scaled, _DBL_IDX, -4),
        gather(scaled, _ADD_IDX, -4),
        gather(verts, _DBL_IDX, -3),
        gather(verts, _ADD_IDX, -3),
        jnp.asarray(_HAS_ADD),
    )

    nterms = len(scaled)

    def body(carry, x):
        fn, fd = carry
        dbl_c, add_c, dbl_v, add_v, has_add = x
        for t in range(nterms):
            fn = mp._ell(fn, dbl_c[t])
            fd = fq6.mul(fd, dbl_v[t])
        fn2, fd2 = fn, fd
        for t in range(nterms):
            fn2 = mp._ell(fn2, add_c[t])
            fd2 = fq6.mul(fd2, add_v[t])
        fn = fq12.select(has_add, fn2, fn)
        fd = fq6.select(has_add, fd2, fd)
        return (fq12.square(fn), fq6.square(fd)), None

    (f_num, f_den), _ = jax.lax.scan(body, (f_num, f_den), xs)

    # final doubling step, no square (mirrors pairing.miller_finalize)
    for t in range(nterms):
        f_num = mp._ell(f_num, scaled[t][..., NUM_COEFFS - 1, :, :, :])
        f_den = fq6.mul(f_den, verts[t][..., NUM_COEFFS - 1, :, :])

    den_inv = fq6.inv(f_den)  # the single inversion of the whole loop
    zero6 = fq6.zero(batch)
    f = fq12.mul(f_num, fq12.pack(den_inv, zero6))
    if C.BLS_X_IS_NEGATIVE:
        f = fq12.conjugate(f)
    return f


def optimized_pairing(p: G1Affine, q: G2Affine) -> jnp.ndarray:
    """e(P, Q) via the num/den Miller loop + the real final exponentiation
    (the reference's optimized_miller_loop intent, done correctly)."""
    coeffs, verts = prepare_g2_with_verticals(q)
    f = miller_loop_numden(p, coeffs, verts, q.infinity)
    return mp.final_exponentiation(f)
