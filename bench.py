"""Benchmark: batched full BLS12-381 pairings per second on one chip.

Prints ONE JSON line:
  {"metric": "pairings/s/chip", "value": N, "unit": "pairings/s",
   "vs_baseline": N / 25000, ...}

vs_baseline is the fraction of the per-chip north-star target: BASELINE.md sets
>= 1e5 full pairings/s on a v5p-8 (4 chips) => 2.5e4 pairings/s/chip. The Rust
reference publishes no numbers (BASELINE.md), so the north star is the bar.

Config comes from plonky2_bls12_381_pairing_tpu.config.PairingConfig.from_env()
(BENCH_BATCH / BENCH_REPS / PAIRING_STRATEGY). Default strategy on TPU is the
fully-fused Pallas tower path ("fused"); set PAIRING_STRATEGY=auto/pallas/xla
to compare tiers.

Before timing, EVERY instance in the batch is checked bit-exactly against the
oracle (threaded C++ native tier when available, exact-int Python otherwise).
Also reports the BASELINE.md roofline diagnostic: achieved FLOP/s (XLA cost
model) as a fraction of the chip's dense-matmul peak.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.config import PairingConfig
from plonky2_bls12_381_pairing_tpu.models import pairing as mp
from plonky2_bls12_381_pairing_tpu.ops import fq12
from plonky2_bls12_381_pairing_tpu.ops.curve import G1Affine, G2Affine
from plonky2_bls12_381_pairing_tpu.utils import profiling, refmodel as rm


def make_inputs(b: int):
    """b distinct points; C++ native tier when available (batched scalar
    muls across threads), else incremental Python additions."""
    try:
        from plonky2_bls12_381_pairing_tpu import native

        if native.available():
            ks = list(range(1, b + 1))
            return native.g1_mul_batch(ks), native.g2_mul_batch(ks)
    except Exception:
        pass
    g1, g2 = rm.G1Affine.generator(), rm.G2Affine.generator()
    p, q = g1, g2
    ps, qs = [], []
    for _ in range(b):
        ps.append(p)
        qs.append(q)
        p = p.add(g1)
        q = q.add(g2)
    return ps, qs


def oracle_pairings(ps, qs):
    """Expected e(P,Q) values: native tier if available, else exact-int."""
    try:
        from plonky2_bls12_381_pairing_tpu import native

        if native.available():
            return native.pairing_batch(ps, qs)
    except Exception:
        pass
    return [rm.pairing(p, q) for p, q in zip(ps, qs)]


def _chip_kind(dev) -> str:
    kind = getattr(dev, "device_kind", "").lower()
    if "v5p" in kind or "v5 p" in kind:
        return "v5p"
    if "v5" in kind:  # v5e / v5 lite
        return "v5e"
    return "cpu" if dev.platform == "cpu" else "v5e"


def main():
    import dataclasses

    cfg = PairingConfig.from_env()
    if cfg.strategy == "auto" and jax.default_backend() == "tpu":
        # the designed-for-speed tier is the default on real hardware
        cfg = dataclasses.replace(cfg, strategy="rns")
    cfg.apply()
    B = cfg.batch_per_chip

    dev = jax.devices()[0]
    ps, qs = make_inputs(B)
    if cfg.strategy == "rns":
        from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
        from plonky2_bls12_381_pairing_tpu.ops.rns import tower as rns_tower
        from plonky2_bls12_381_pairing_tpu.ops.rns.lines import (
            G1Affine as RG1, G2Affine as RG2)

        pair_fn, decode_fn = mpr.pairing, rns_tower.decode
        P = jax.device_put(RG1.encode(ps), dev)
        Q = jax.device_put(RG2.encode(qs), dev)
    else:
        pair_fn, decode_fn = mp.pairing, fq12.decode
        P = jax.device_put(G1Affine.encode(ps), dev)
        Q = jax.device_put(G2Affine.encode(qs), dev)

    fn = jax.jit(pair_fn)
    t0 = time.time()
    out = fn(P, Q)
    out.block_until_ready()
    compile_time = time.time() - t0

    # correctness gate: the FULL batch bit-exact vs the oracle (threaded C++
    # oracle makes the full batch cheap; a Python-oracle fallback checks 8 —
    # LOUDLY, since this is the only on-TPU correctness gate)
    try:
        from plonky2_bls12_381_pairing_tpu import native
        n_gate = B if native.available() else min(8, B)
    except Exception:
        n_gate = min(8, B)
    gate_degraded = n_gate < B
    if gate_degraded:
        print(f"WARNING: C++ oracle unavailable — bit-exactness gate degraded "
              f"to {n_gate}/{B} instances", file=sys.stderr)
    if cfg.strategy == "rns":
        # RNS rows pack 2 elements each; decode unpacks along axis 0
        rows_needed = -(-n_gate // 2)
        got = decode_fn(np.array(out[:rows_needed]))[:n_gate]
    else:
        got = decode_fn(np.array(out[:n_gate]))
    want = oracle_pairings(ps[:n_gate], qs[:n_gate])
    if list(got) != want:
        bad = sum(1 for g, w in zip(got, want) if g != w)
        print(json.dumps({"metric": "pairings/s/chip", "value": 0,
                          "unit": "pairings/s", "vs_baseline": 0.0,
                          "error": f"bit-exactness gate FAILED ({bad}/{n_gate})"}))
        sys.exit(1)

    # timed region: back-to-back async dispatches with ONE final sync, at
    # THREE rep counts — a least-squares slope over (reps, time) removes the
    # fixed per-sync cost (~24 ms over the axon tunnel, measured with a
    # no-op jit) and is robust to one noisy dispatch (VERDICT r4 #9).
    # In-order device execution makes the last output's readiness imply all
    # reps completed.
    def timed(reps):
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn(P, Q)
        jax.block_until_ready(out)
        return time.time() - t0

    rs = [cfg.bench_reps, 3 * cfg.bench_reps, 5 * cfg.bench_reps]
    ts = [min(timed(r) for _ in range(3)) for r in rs]
    n = len(rs)
    mr, mt = sum(rs) / n, sum(ts) / n
    best = (sum((r - mr) * (t - mt) for r, t in zip(rs, ts))
            / sum((r - mr) ** 2 for r in rs))
    if best <= 0:  # noise guard
        best = ts[-1] / rs[-1]
    # residual spread of the fit, as a fraction of the slope signal
    resid = [t - (mt + best * (r - mr)) for r, t in zip(rs, ts)]
    fit_rel_resid = (max(abs(x) for x in resid)
                     / max(best * (rs[-1] - rs[0]), 1e-9))
    sync_overhead = max(0.0, mt - best * mr)
    pps = B / best

    # roofline diagnostics (BASELINE.md gate). Two honest numbers:
    #   roofline_mxu — XLA-counted matmul FLOP/s over the MXU peak (the RNS
    #     tier's matmuls — REDC base extensions — are all visible to XLA; the
    #     workload is deliberately NOT matmul-bound, so this is small);
    #   roofline_vpu + fp_muls_per_s — exact traced Fp-op counts x a
    #     documented lane-op model over the measured VPU int32 ceiling
    #     (tools/vpu_peak.py) — the binding resource for this design.
    chip = _chip_kind(dev)
    roofline = None
    xla_flops = None
    try:
        cost = profiling.compiled_cost(pair_fn, P, Q)
        if "flops" in cost:
            xla_flops = float(cost["flops"])
            roofline = (xla_flops / best) / profiling.PEAK_MATMUL_FLOPS[chip]
    except Exception:
        pass
    fp_muls_per_pairing = None
    fp_muls_per_s = None
    vpu = {}
    tmodel = {}
    if cfg.strategy == "rns":
        try:
            from plonky2_bls12_381_pairing_tpu.models import pairing_rns as _mpr
            per_pair = _mpr.op_counts(batch=B)  # exact static per-pairing counts
            fp_muls_per_pairing = round(per_pair.get("fp_mul", 0), 1)
            fp_muls_per_s = round(pps * per_pair.get("fp_mul", 0))
            vpu = profiling.rns_roofline(pps, per_pair, chip)
            # measured unit-cost attribution (VERDICT r3 #8): time REDC at
            # production shapes and check counts x unit costs vs wall time
            unit = profiling.measure_redc_unit_cost()
            tmodel = profiling.rns_time_model(pps, per_pair, unit)
        except Exception:
            pass

    # measured hardware attribution (tools/xprof_attrib.py artifact): the
    # perfetto-trace class shares replace the analytic lane-op model as the
    # utilization evidence when the artifact is present and current
    xprof = None
    try:
        xp_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "XPROF_r05.json")
        with open(xp_path) as fjson:
            xp = json.load(fjson)
        xprof = {
            "busy_per_dispatch_ms": xp.get("busy_per_dispatch_ms"),
            "class_shares_of_busy": xp.get("class_shares_of_busy"),
            "source": "XPROF_r05.json (tools/xprof_attrib.py perfetto "
                      "self-time attribution on this chip)",
        }
    except Exception:
        pass

    print(json.dumps({
        "metric": "pairings/s/chip",
        "value": round(pps, 2),
        "unit": "pairings/s",
        "vs_baseline": round(pps / 25000.0, 4),
        "batch": B,
        "best_s": round(best, 4),
        "sync_overhead_s": round(sync_overhead, 4),
        "timing_note": ("best_s is the least-squares slope over back-to-back "
                        "async dispatches at reps x1/x3/x5 (one final sync "
                        "each, best of 3 per point), removing the fixed "
                        "host-sync cost reported as sync_overhead_s — ~24 ms "
                        "over the tunneled link, which a per-rep "
                        "block_until_ready loop would wrongly charge to "
                        "every batch; fit_rel_resid is the fit's max "
                        "residual over the slope signal"),
        "fit_rel_resid": round(fit_rel_resid, 4),
        "compile_s": round(compile_time, 1),
        "device": str(dev),
        "strategy": cfg.strategy,
        "gate": f"bit-exact {n_gate}/{B}",
        "gate_degraded": gate_degraded,
        "roofline_mxu": round(roofline, 6) if roofline is not None else None,
        "xla_flops_per_batch": xla_flops,
        "fp_muls_per_pairing": fp_muls_per_pairing,
        "fp_muls_per_s": fp_muls_per_s,
        "roofline_vpu": round(vpu["vpu_fraction"], 4) if vpu else None,
        "roofline_note": ("vpu: analytic lane-op model over the measured "
                          "int32 mul+add ceiling (tools/vpu_peak.py); the "
                          "probe lower-bounds mixed int/f32 issue, so >1 "
                          "means the elementwise pipeline is saturated"),
        **tmodel,
        "xprof_measured": xprof,
        "time_model_note": ("redc_time_share: exact per-pairing REDC count "
                            "x the MEASURED per-row REDC cost "
                            "(profiling.measure_redc_unit_cost, two-point "
                            "unrolled chains at production shapes) over "
                            "actual wall time — the measured anchor for the "
                            "analytic vpu model; the remainder is channel "
                            "products, data movement and the non-REDC tower "
                            "glue") if tmodel else None,
    }))


if __name__ == "__main__":
    main()
