"""Multi-chip distribution of the batched pairing (SURVEY.md §2.2 design).

The reference is single-threaded, single-process (no parallelism of any kind);
the TPU build's distribution model is:
  * **DP over pairing instances** — the batch axis is sharded over a 1-D
    `jax.sharding.Mesh` axis ("dp"); every chip runs the identical static
    Miller schedule on its shard (SPMD). Limb and tower axes stay chip-local
    (carries are cheap locally, catastrophic across ICI).
  * **Multi-pairing product reduction** — prod_i e(P_i, Q_i) runs as per-shard
    Miller products plus a log-depth Fq12 product tree whose final folds XLA
    lowers to ICI collectives (the generalization of the reference's fused
    multi_miller_loop, miller_loop.rs:264-272).
  * PP/SP/EP/CP and ring-attention/Ulysses are N/A for this workload (no layer
    pipeline, sequence, or expert dimension); the Miller loop's 64-step
    schedule is the one inherently serial axis and is never split.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fp, fq12
from ..ops.curve import G1Affine, G2Affine
from ..models import pairing as mp

DP_AXIS = "dp"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DP_AXIS,))


def shard_points(p: G1Affine, q: G2Affine, mesh: Mesh):
    """Place batched points with the batch axis sharded over the dp mesh axis."""
    limb2 = NamedSharding(mesh, P(DP_AXIS, None, None))
    limb1 = NamedSharding(mesh, P(DP_AXIS, None))
    mask = NamedSharding(mesh, P(DP_AXIS))
    ps = G1Affine(
        jax.device_put(p.x, limb1),
        jax.device_put(p.y, limb1),
        jax.device_put(p.infinity, mask),
    )
    qs = G2Affine(
        jax.device_put(q.x, limb2),
        jax.device_put(q.y, limb2),
        jax.device_put(q.infinity, mask),
    )
    return ps, qs


def pairing_sharded(mesh: Mesh):
    """jit-compiled batched pairing with batch-sharded inputs/outputs."""
    out_sharding = NamedSharding(mesh, P(DP_AXIS, None, None))
    return jax.jit(mp.pairing, out_shardings=out_sharding)


def product_tree(e: jnp.ndarray) -> jnp.ndarray:
    """Fq12 product over the leading (batch) axis as a log-depth fold.

    Under a dp-sharded batch axis the early folds are chip-local and the last
    log2(n_devices) folds ride ICI collectives. Non-power-of-two batches are
    padded with ones.
    """
    b = e.shape[0]
    size = 1
    while size < b:
        size *= 2
    if size != b:
        pad = jnp.broadcast_to(fq12.one(), (size - b, *e.shape[1:]))
        e = jnp.concatenate([e, pad], axis=0)
    while size > 1:
        half = size // 2
        e = fq12.mul(e[:half], e[half:size])
        size = half
    return e[0]


def multi_pairing_product(p: G1Affine, q: G2Affine) -> jnp.ndarray:
    """prod_i e(P_i, Q_i) over the whole (possibly sharded) batch: one shared
    Miller schedule per shard, per-instance Miller values, a log-depth Fq12
    product tree (collectives on the final folds), one final exponentiation."""
    coeffs = mp.prepare_g2(q)
    f = mp.miller_loop(p, coeffs, q.infinity)
    fprod = product_tree(f)
    return mp.final_exponentiation(fprod)


def multi_pairing_product_sharded(mesh: Mesh):
    out_sharding = NamedSharding(mesh, P(None, None))
    return jax.jit(multi_pairing_product, out_shardings=out_sharding)


def pairing_and_product(p: G1Affine, q: G2Affine):
    """Per-instance pairings AND the fused multi-pairing product from ONE
    shared G2 preparation + Miller loop + ONE final exponentiation:
    final_exp is the fixed power f -> f^d, hence multiplicative, so
    gt = final_exp(prod_i f_i) = prod_i e_i — the product tree runs on the
    finished pairings and its final log2(n_devices) folds ride ICI
    collectives under a dp-sharded batch."""
    coeffs = mp.prepare_g2(q)
    f = mp.miller_loop(p, coeffs, q.infinity)
    e = mp.final_exponentiation(f)
    gt = product_tree(e)
    return e, gt


def pairing_and_product_sharded(mesh: Mesh):
    """One compiled sharded graph for both distribution paths (the driver's
    multi-chip dry-run target): batch-sharded per-instance results plus the
    replicated cross-device product."""
    out_shardings = (
        NamedSharding(mesh, P(DP_AXIS, None, None)),
        NamedSharding(mesh, P(None, None)),
    )
    return jax.jit(pairing_and_product, out_shardings=out_shardings)


# ---------------------------------------------------------------------------
# RNS-tier distribution (the production fast path): identical dp plan with
# the packed ROW axis sharded — each row holds PACK=2 instances, so a dp
# shard of R rows carries 2R pairings.
# ---------------------------------------------------------------------------


def shard_points_rns(p, q, mesh: Mesh):
    """Place packed RNS points with the row axis sharded over dp."""
    from ..ops.rns.lines import G1Affine as RG1, G2Affine as RG2

    s2 = NamedSharding(mesh, P(DP_AXIS, None, None))
    s1 = NamedSharding(mesh, P(DP_AXIS, None))
    ps = RG1(jax.device_put(p.x, s1), jax.device_put(p.y, s1),
             jax.device_put(p.infinity, s1))
    qs = RG2(jax.device_put(q.x, s2), jax.device_put(q.y, s2),
             jax.device_put(q.infinity, s1))
    return ps, qs


def rns_product_tree(e: jnp.ndarray) -> jnp.ndarray:
    """Fq12 product over all packed instances: log-depth row folds (the last
    log2(n_devices) folds ride ICI under a dp-sharded row axis), then one
    cross-slot fold (a 64-lane roll swaps the two packed slots).

    Static ICI cost: folds are chip-local until the tree width drops to one
    row per device; the remaining log2(D) folds move size/2 rows of
    12*128*4 B = 6 KiB each, totalling (D-1)*6 KiB over the mesh per product
    — negligible against the per-shard Miller compute (~100 ms/shard), so
    the distribution plan is compute-bound by construction."""
    from ..ops.rns import tower
    from .. import rns_constants as RC

    b = e.shape[0]
    size = 1
    while size < b:
        size *= 2
    if size != b:
        pad = jnp.broadcast_to(tower.one(), (size - b, *e.shape[1:]))
        e = jnp.concatenate([e, pad], axis=0)
    while size > 1:
        half = size // 2
        e = tower.mul(e[:half], e[half:size])
        size = half
    row = e[0:1]
    swapped = jnp.roll(row, RC.SUB, axis=-1)
    return tower.mul(row, swapped)[0]  # product replicated in both slots


def rns_pairing_and_product(p, q):
    """RNS-tier analogue of pairing_and_product: per-instance pairings plus
    the full multi-pairing product from one shared pipeline."""
    from ..models import pairing_rns as mpr

    coeffs = mpr.prepare_g2_stepmajor(q)
    f = mpr.miller_loop(p, coeffs, q.infinity)
    e = mpr.final_exponentiation(f)
    gt = rns_product_tree(e)
    return e, gt


def rns_pairing_and_product_sharded(mesh: Mesh):
    out_shardings = (
        NamedSharding(mesh, P(DP_AXIS, None, None)),
        NamedSharding(mesh, P(None, None)),
    )
    return jax.jit(rns_pairing_and_product, out_shardings=out_shardings)
