"""Multi-chip distribution tests on the conftest 8-virtual-device CPU mesh.

Verifies the SURVEY.md §2.2 distribution plan end-to-end without TPU hardware
(mirroring the driver's dryrun_multichip environment): the batch axis is
sharded over an 8-device dp mesh, every device runs the identical static
Miller schedule on its shard, and the fused multi-pairing product's final
log2(8) Fq12 folds ride cross-device collectives. Results are checked
limb-for-limb against the exact-int oracle — the distributed generalization
of the reference's fused multi_miller_loop
(src/fields_as_trees/miller_loop.rs:247-314).
"""

import random

import jax
import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu.models import pairing as mp
from plonky2_bls12_381_pairing_tpu.ops import fq12
from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.parallel import mesh as pm
from plonky2_bls12_381_pairing_tpu.utils import refmodel as rm

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    if len(devices) < N_DEV:
        pytest.skip(f"need {N_DEV} devices (conftest sets "
                    f"xla_force_host_platform_device_count=8), have {len(devices)}")
    return pm.make_mesh(devices[:N_DEV])


@pytest.fixture(scope="module")
def points():
    # one instance per device; distinct small multiples of the generators
    g1, g2 = rm.G1Affine.generator(), rm.G2Affine.generator()
    g1s = [g1.mul(k) for k in range(1, N_DEV + 1)]
    g2s = [g2.mul(k) for k in range(N_DEV, 0, -1)]
    return g1s, g2s


@pytest.fixture(scope="module")
def sharded_run(mesh, points):
    g1s, g2s = points
    p = G1Affine.encode(g1s)
    q = G2Affine.encode(g2s)
    ps, qs = pm.shard_points(p, q, mesh)
    # ONE compiled graph covering both paths — identical to the driver's
    # dryrun_multichip target, so the persistent cache is shared with it.
    e, gt = pm.pairing_and_product_sharded(mesh)(ps, qs)
    e.block_until_ready()
    return ps, qs, e, gt


def test_input_batch_axis_is_dp_sharded(mesh, sharded_run):
    ps, qs, _, _ = sharded_run
    for arr in (ps.x, ps.y, qs.x, qs.y):
        spec = arr.sharding.spec
        assert spec[0] == pm.DP_AXIS, spec
        # each device holds exactly its 1-instance shard
        assert len(arr.addressable_shards) >= 1
        assert arr.addressable_shards[0].data.shape[0] == 1


def test_sharded_pairing_bit_exact(points, sharded_run):
    g1s, g2s = points
    _, _, e, _ = sharded_run
    assert e.sharding.spec[0] == pm.DP_AXIS
    got = list(fq12.decode(np.array(e)))
    want = [rm.pairing(p, q) for p, q in zip(g1s, g2s)]
    assert got == want


def test_sharded_product_tree_bit_exact(points, sharded_run):
    g1s, g2s = points
    _, _, _, gt = sharded_run
    # product output is replicated (collectives already folded the shards)
    assert all(s is None for s in gt.sharding.spec)
    got = fq12.decode(np.array(gt))
    want = rm.multi_pairing(list(zip(g1s, g2s)))
    assert got == want


def test_product_tree_matches_single_device(mesh, points):
    """The log-depth fold is value-identical whether the batch axis is sharded
    over 8 devices or lives on one device (padding with ones included: B=3)."""
    g1s, g2s = points
    r = random.Random(0xD15C0)
    fs = [rm.rand_fq12(r) for _ in range(3)]
    e = fq12.encode(fs)
    folded = jax.jit(pm.product_tree)(e)
    want = fs[0] * fs[1] * fs[2]
    assert fq12.decode(np.array(folded)) == want


# ---------------------------------------------------------------------------
# RNS tier (production fast path): same dp plan over packed rows
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rns_sharded_run(mesh, points):
    from plonky2_bls12_381_pairing_tpu.ops.rns.lines import (
        G1Affine as RG1, G2Affine as RG2)

    g1s, g2s = points
    # 16 elements = 8 packed rows = one row per device
    g1x = g1s + [p for p in g1s]
    g2x = g2s + [q for q in g2s]
    p = RG1.encode(g1x)
    q = RG2.encode(g2x)
    ps, qs = pm.shard_points_rns(p, q, mesh)
    e, gt = pm.rns_pairing_and_product_sharded(mesh)(ps, qs)
    e.block_until_ready()
    return g1x, g2x, ps, e, gt


def test_rns_sharded_pairing_bit_exact(rns_sharded_run):
    from plonky2_bls12_381_pairing_tpu.ops.rns import tower as rtw

    g1x, g2x, ps, e, _ = rns_sharded_run
    assert ps.x.sharding.spec[0] == pm.DP_AXIS
    assert e.sharding.spec[0] == pm.DP_AXIS
    got = list(rtw.decode(np.array(e)))[: len(g1x)]
    want = [rm.pairing(p, q) for p, q in zip(g1x, g2x)]
    assert got == want


def test_rns_sharded_product_bit_exact(rns_sharded_run):
    from plonky2_bls12_381_pairing_tpu import rns_constants as RC

    g1x, g2x, _, _, gt = rns_sharded_run
    assert all(s is None for s in gt.sharding.spec)
    want = rm.multi_pairing(list(zip(g1x, g2x)))
    # the product is replicated in both packed slots
    for slot in range(RC.PACK):
        got = rm.Fq12.from_coeffs([
            RC.decode_int_slot(
                np.array(gt)[j, slot * RC.SUB : (slot + 1) * RC.SUB])
            for j in range(12)])
        assert got == want


# ---------------------------------------------------------------------------
# HLO collective-placement assertions (VERDICT r4 #6): the one distribution
# property checkable without hardware — the per-instance pairing graph must
# contain NO cross-device collectives (field arithmetic stays chip-local by
# design), and the combined pairing+product graph exactly the product-tree /
# output-replication collectives, not one per schedule step.
# ---------------------------------------------------------------------------

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "all-to-all", "reduce-scatter")


def _collective_count(hlo_text: str) -> int:
    return sum(hlo_text.count(c + "(") + hlo_text.count(c + "-start(")
               for c in _COLLECTIVES)


def test_rns_sharded_hlo_collective_placement(mesh, points):
    """Compiled-HLO text assertions at the dryrun topology (8 rows over 8
    devices). Note: at production shapes the final-exp easy part's batched
    inverse adds log2(D) small tree-fold collectives (rows > fp._TREE_FLOOR);
    at this test's 8 rows the tree is skipped, so the per-instance graph has
    no data-proportional collectives at all (only the two constant-size
    carry gathers asserted below)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
    from plonky2_bls12_381_pairing_tpu.ops.rns.lines import (
        G1Affine as RG1, G2Affine as RG2)

    g1s, g2s = points
    g1x = g1s + [p for p in g1s]
    g2x = g2s + [q for q in g2s]
    ps, qs = pm.shard_points_rns(RG1.encode(g1x), RG2.encode(g2x), mesh)

    # combined per-instance + product graph: collectives present but bounded
    # (the log-depth product-tree folds + the replicated-output gather; a
    # regression that shards per-step field arithmetic would add dozens)
    full = pm.rns_pairing_and_product_sharded(mesh)
    n_full = _collective_count(full.lower(ps, qs).compile().as_text())
    assert 1 <= n_full <= 24, n_full

    # per-instance pairing only: no collectives beyond XLA SPMD's two
    # constant-size (6, rows, LANES) all-gathers of the Miller scan's initial
    # G2Projective carry / in-body chord operand (a replication choice the
    # propagation makes for the generator-select; 24 KiB each at this shape,
    # count independent of the 68-step schedule). The assertion pins that
    # count: a regression that shards per-step field arithmetic would add
    # dozens of per-step collectives.
    per_instance = jax.jit(
        mpr.pairing,
        out_shardings=NamedSharding(mesh, P(pm.DP_AXIS, None, None)))
    txt_e = per_instance.lower(ps, qs).compile().as_text()
    n_e = _collective_count(txt_e)
    assert n_e <= 2, n_e
    for c in ("all-reduce", "all-to-all", "reduce-scatter",
              "collective-permute"):
        assert c + "(" not in txt_e  # only the two small gathers


def test_multihost_single_process_path(mesh):
    """Multi-host entry points degrade to the single-process dp path here
    (one host): the launcher's full encode -> sharded pairing -> product
    pipeline runs on the 8-virtual-device mesh and the product is replicated.
    The initialize()/process-local branches follow the documented JAX API
    (jax.distributed.initialize / make_array_from_process_local_data) and
    are exercised on a real pod."""
    from plonky2_bls12_381_pairing_tpu.parallel import multihost as mh
    from plonky2_bls12_381_pairing_tpu.ops.rns import tower as rtw

    g1s = [rm.G1Affine.generator().mul(k) for k in range(1, 17)]
    g2s = [rm.G2Affine.generator().mul(k) for k in range(1, 17)]
    m = mh.global_mesh()
    ps, qs = mh.encode_local_batch(g1s, g2s, m)
    assert ps.x.sharding.spec[0] == pm.DP_AXIS
    e, gt = pm.rns_pairing_and_product_sharded(m)(ps, qs)
    got = list(rtw.decode(np.array(e)))[:2]
    assert got == [rm.pairing(g1s[0], g2s[0]), rm.pairing(g1s[1], g2s[1])]
    assert all(s is None for s in gt.sharding.spec)
