"""Observability-layer tests: op-count reports, rooflines, StepTimer —
the SURVEY.md §5 "constraint count" analogues must be live and exact."""

import random
import time

import numpy as np
import pytest

from plonky2_bls12_381_pairing_tpu import rns_constants as RC
from plonky2_bls12_381_pairing_tpu.ops import fp as limb_fp
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp
from plonky2_bls12_381_pairing_tpu.ops.rns import tower as tw
from plonky2_bls12_381_pairing_tpu.utils import profiling


def test_rns_op_report_counts_fq12_mul():
    """An Fq12 mul is 18 Fq2 Karatsuba products (54 Fp muls) plus one stacked
    12-component REDC, per element."""
    a = np.zeros((2, 12, RC.LANES), dtype=np.int32)  # 2 rows = 4 elements
    counts = profiling.rns_op_report(tw.mul, a, a)
    n_elem = 2 * RC.PACK
    assert counts["fp_mul"] == 54 * n_elem
    assert counts["redc"] == 12 * n_elem


def test_rns_pairing_op_counts():
    """Per-pairing op counts are exact, static, and at the O(10^4) Fp-mul
    scale SURVEY.md §6 derives for the optimal-ate pairing."""
    from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr

    c = mpr.op_counts()
    assert 10_000 < c["fp_mul"] < 60_000
    assert 1_000 < c["redc"] < 30_000
    assert c == mpr.op_counts()  # deterministic


def test_rns_roofline_model():
    out = profiling.rns_roofline(1000.0, {"fp_mul": 10_000, "redc": 3_000},
                                 chip="v5e")
    lane_ops = (10_000 + 3_000 * profiling.LANE_OPS_PER_REDC) * RC.SUB
    assert out["lane_ops_per_pairing"] == lane_ops
    assert out["vpu_lane_ops_per_s"] == pytest.approx(1000.0 * lane_ops)
    assert 0 < out["vpu_fraction"] < 1


def test_static_op_report_limb_tier():
    """The limb tier's witness-trace op counter reports exact mul rows."""
    rng = random.Random(5)
    a = limb_fp.encode([rng.randrange(RC.P) for _ in range(4)])
    b = limb_fp.encode([rng.randrange(RC.P) for _ in range(4)])
    counts = profiling.static_op_report(limb_fp.mont_mul, a, b)
    assert counts.get("mul") == 4


def test_step_timer():
    t = profiling.StepTimer("unit")
    for _ in range(3):
        with t.step():
            time.sleep(0.001)
    s = t.summary(items_per_step=10)
    assert s["steps"] == 3 and s["best_s"] > 0
    assert s["items_per_s"] == pytest.approx(10 / s["best_s"])
