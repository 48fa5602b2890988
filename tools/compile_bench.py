"""Cold-compile attribution for the RNS pairing pipeline (VERDICT r3 #5).

Measures, per phase, (a) trace+lower time (Python/jaxpr/StableHLO — host CPU
bound) and (b) backend compile time (XLA optimization + codegen), with the
persistent compilation cache DISABLED so the numbers are true cold costs.

Run on the bench device (TPU) — compile cost is backend-specific. Set
COMPILE_JSON=<path> to record the artifact.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# NO persistent cache: cold numbers. Explicitly disabled (not just unset) so
# a JAX_COMPILATION_CACHE_DIR env default on the bench host cannot silently
# turn these into warm-cache numbers (ADVICE r4).
jax.config.update("jax_enable_compilation_cache", False)

from plonky2_bls12_381_pairing_tpu.models import pairing_rns as mpr
from plonky2_bls12_381_pairing_tpu.ops.rns import fp as rfp, tower
from plonky2_bls12_381_pairing_tpu.ops.rns.lines import G1Affine, G2Affine

if jax.default_backend() == "tpu" or os.environ.get("RNS_FUSED"):
    rfp.set_fused(True)

B = int(os.environ.get("MB_B", "2048"))
p = G1Affine.generator((B,))
q = G2Affine.generator((B,))

results = {}


def measure(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    results[name] = {"lower_s": round(t1 - t0, 1), "compile_s": round(t2 - t1, 1)}
    print(f"{name:16s} lower={t1-t0:7.1f}s  xla={t2-t1:7.1f}s", flush=True)


f12 = tower.one((B // 2,))
measure("miller_fused", mpr.miller_loop_fused, p, q)
measure("final_exp", mpr.final_exponentiation, f12)
measure("full_pairing", mpr.pairing, p, q)

if os.environ.get("COMPILE_JSON"):
    payload = {
        "batch_elements": B,
        "device": str(jax.devices()[0]),
        "fused_kernels": rfp._FUSED,
        "phases": results,
        "note": ("cold trace+lower vs XLA-compile seconds per separately "
                 "jitted phase, persistent cache disabled; full_pairing is "
                 "the bench graph (phases recompile inside it, so phase "
                 "costs need not sum to it)"),
    }
    with open(os.environ["COMPILE_JSON"], "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", os.environ["COMPILE_JSON"])
