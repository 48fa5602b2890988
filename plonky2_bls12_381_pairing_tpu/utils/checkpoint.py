"""Checkpoint/resume for long batched pairing jobs (SURVEY.md §5).

The reference has no runtime checkpointing (only unimplemented serde stubs,
src/fields/fq_target.rs:349-354). Here all job state is a few dense tensors —
the (B, 12, L) Miller accumulator, the pre-scaled coefficient tensors, and a
segment index — so checkpointing is a trivial np.savez every K schedule
segments, and recovery is idempotent re-launch from the last checkpoint
(fail-fast multi-host practice; see tests/test_witness_aux.py for the
kill-and-resume test)."""

from __future__ import annotations

import os

import jax
import numpy as np

from ..models import pairing as mp
from ..ops import fp, fq12


def save_state(path: str, f: np.ndarray, next_segment: int) -> None:
    tmp = path + ".tmp"
    np.savez(tmp, f=np.asarray(f), next_segment=next_segment)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(path: str):
    with np.load(path) as z:
        return z["f"], int(z["next_segment"])


def run_pairing_checkpointed(ps, prepared, q_infinities=None, *,
                             ckpt_path: str, every: int = 2):
    """Full pairing with segment-granular checkpointing.

    Executes the Miller schedule one compiled segment at a time, saving the
    accumulator after every `every` segments; if ckpt_path exists, resumes
    from the recorded segment. Returns the Gt tensor.
    """
    ps, scaled = mp.scale_all_coeffs(ps, prepared, q_infinities)
    batch = ps[0].infinity.shape
    n_segs = len(mp._SEGMENTS)

    if os.path.exists(ckpt_path):
        f_np, start = load_state(ckpt_path)
        f = jax.numpy.asarray(f_np)
    else:
        f = jax.numpy.broadcast_to(fq12.one(), (*batch, 12, fp.NLIMBS))
        start = 0

    seg_fn = jax.jit(mp.miller_segment, static_argnums=(2,))
    for seg in range(start, n_segs):
        f = seg_fn(f, scaled, seg)
        if (seg + 1) % every == 0 or seg == n_segs - 1:
            f.block_until_ready()
            save_state(ckpt_path, np.asarray(f), seg + 1)
    f = jax.jit(mp.miller_finalize)(f, scaled)
    out = jax.jit(mp.final_exponentiation)(f)
    return out
