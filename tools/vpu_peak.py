"""Measure the chip's sustained VPU int32 lane-op ceiling (dev diagnostic).

Runs a long unrolled chain of dependent-free int32 multiply-adds over large
arrays inside ONE jit (an in-jit scan amortizes dispatch), and reports
achieved lane-ops/s. The best number feeds
utils/profiling.PEAK_VPU_INT32_OPS — the speed-of-light denominator for the
RNS tier's roofline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# the loop-carried array must be small enough to live on-chip across scan
# steps, and the multipliers are scalar constants — otherwise the chain
# measures HBM bandwidth, not the VPU
N = 1 << 16  # 64K int32 lanes (256 KB)
UNROLL = 64  # mul+add pairs per scan step
STEPS = 2048

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(1, 1 << 12, (N,), dtype=np.int32))
cs = [int(c) for c in rng.integers(3, 1 << 10, (UNROLL,))]


@jax.jit
def chain(x):
    def body(acc, _):
        for c in cs:
            acc = acc * c + c  # 2 lane-ops per element per unrolled pair
        return acc, None

    return jax.lax.scan(body, x, None, length=STEPS)[0]


out = chain(x)
np.asarray(jnp.sum(out))
best = None
for _ in range(5):
    t0 = time.perf_counter()
    out = chain(x)
    np.asarray(jnp.sum(out))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)

ops = 2 * N * UNROLL * STEPS
print(f"int32 mul+add: {ops / best / 1e12:.3f} T lane-ops/s "
      f"(best {best*1e3:.2f} ms for {ops/1e9:.1f} G ops)")
