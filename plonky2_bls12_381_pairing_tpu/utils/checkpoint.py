"""Checkpoint/resume for long batched pairing jobs (SURVEY.md §5).

The reference has no runtime checkpointing (only unimplemented serde stubs,
src/fields/fq_target.rs:349-354). Here all job state is a few dense tensors —
the (B, 12, L) Miller accumulator, the pre-scaled coefficient tensors, and a
schedule-step index — so checkpointing is a trivial atomic np.savez every K
Miller steps, and recovery is idempotent re-launch from the last checkpoint
(fail-fast multi-host practice). Kill-and-resume is exercised by
tests/test_witness_aux.py::test_checkpoint_kill_and_resume.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..models import pairing as mp
from ..ops import fp, fq12


def save_state(path: str, f: np.ndarray, next_step: int) -> None:
    """Atomic write: savez to a tmp file, then rename over the target."""
    tmp = path + ".tmp"
    np.savez(tmp, f=np.asarray(f), next_step=next_step)
    tmp_written = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(tmp_written, path)


def load_state(path: str):
    with np.load(path) as z:
        return z["f"], int(z["next_step"])


def run_pairing_checkpointed(ps, prepared, q_infinities=None, *,
                             ckpt_path: str, every: int = 17,
                             fail_after_steps: int | None = None):
    """Full pairing with step-granular checkpointing over the 68-step schedule.

    Executes the Miller scan in compiled chunks of `every` steps, saving the
    accumulator + next step index after each chunk; if ckpt_path exists,
    resumes from the recorded step. `fail_after_steps` aborts (raises
    RuntimeError) once at least that many steps have run and been
    checkpointed — the fault-injection hook for the kill-and-resume test.
    Returns the Gt tensor.
    """
    ps, scaled = mp.scale_all_coeffs(ps, prepared, q_infinities)
    xs = mp.stack_steps(scaled)  # (68, T, ..., 3, 2, L)
    batch = ps[0].infinity.shape
    n_steps = mp.NUM_COEFFS

    if os.path.exists(ckpt_path):
        f_np, start = load_state(ckpt_path)
        f = jax.numpy.asarray(f_np)
    else:
        f = jax.numpy.broadcast_to(fq12.one(), (*batch, 12, fp.NLIMBS))
        start = 0

    chunk_fn = jax.jit(mp.miller_steps)  # re-used per distinct chunk length
    step = start
    while step < n_steps:
        stop = min(step + every, n_steps)
        flags = jax.numpy.asarray(mp._DO_SQUARE[step:stop])
        f = chunk_fn(f, xs[step:stop], flags)
        f.block_until_ready()
        save_state(ckpt_path, np.asarray(f), stop)
        step = stop
        if fail_after_steps is not None and step >= start + fail_after_steps \
                and step < n_steps:
            raise RuntimeError(f"injected failure after step {step}")

    if mp.C.BLS_X_IS_NEGATIVE:
        f = fq12.conjugate(f)
    return jax.jit(mp.final_exponentiation)(f)


def run_pairing_checkpointed_rns(p, prepared_stepmajor, q_infinity=None, *,
                                 ckpt_path: str, every: int = 17,
                                 fail_after_steps: int | None = None):
    """RNS-tier (production pipeline) checkpointed pairing: the Miller
    schedule runs in compiled chunks of `every` steps over the step-major
    coefficient tensor from models/pairing_rns.prepare_g2_stepmajor, saving
    the (rows, 12, LANES) accumulator + next step index after each chunk;
    resumes from ckpt_path if it exists. Same fault-injection hook as the
    limb tier. Returns the Gt tensor."""
    import jax.numpy as jnp

    from ..models import pairing_rns as mpr
    from ..ops.rns import fp as rfp
    from ..ops.rns import tower as rtw

    qinf = q_infinity if q_infinity is not None else jnp.zeros_like(p.infinity)
    py = rfp.wrap(p.y[..., None, :])
    px = rfp.wrap(p.x[..., None, :])
    skip = ((p.infinity != 0) | (qinf != 0)).astype(jnp.int32)
    rows = p.infinity.shape[:-1]
    n_steps = mpr.NUM_COEFFS

    if os.path.exists(ckpt_path):
        f_np, start = load_state(ckpt_path)
        f = jnp.asarray(f_np)
    else:
        f = jnp.broadcast_to(rtw.one(), (*rows, 12, rfp.LANES))
        start = 0

    # ONE uniform masked-scan body compiled once and reused for EVERY chunk
    # and every resume point (VERDICT r4 #7: the unrolled miller_steps_range
    # paid O(chunks) compiles of unrolled bodies). Each scan step applies the
    # ell (masked by `active` for tail padding) and a flag-selected square —
    # bit-identical values to the unrolled path, since inactive/unsquared
    # steps pass f through unchanged.
    @jax.jit
    def chunk_fn(f, triples, flags, actives):
        def body(f, x):
            triple, flag, active = x
            f2 = mpr._ell_scaled(f, triple, py, px, skip)
            f2 = jnp.where(active != 0, f2, f)
            fsq = rtw.square(f2)
            return jnp.where(flag != 0, fsq, f2), None

        f, _ = jax.lax.scan(body, f, (triples, flags, actives))
        return f

    step = start
    while step < n_steps:
        stop = min(step + every, n_steps)
        n = stop - step
        triples = prepared_stepmajor[step:stop]
        if n < every:  # pad the tail chunk to the uniform shape
            pad = jnp.zeros((every - n,) + triples.shape[1:], triples.dtype)
            triples = jnp.concatenate([triples, pad], axis=0)
        flags = jnp.asarray(
            list(mpr.base._DO_SQUARE[step:stop]) + [0] * (every - n),
            dtype=jnp.int32)
        actives = jnp.asarray([1] * n + [0] * (every - n), dtype=jnp.int32)
        f = chunk_fn(f, triples, flags, actives)
        f.block_until_ready()
        save_state(ckpt_path, np.asarray(f), stop)
        step = stop
        if fail_after_steps is not None and step >= start + fail_after_steps \
                and step < n_steps:
            raise RuntimeError(f"injected failure after step {step}")

    if mpr.RC.rm.BLS_X_IS_NEGATIVE:
        f = rtw.conjugate(f)
    return jax.jit(mpr.final_exponentiation)(f)
