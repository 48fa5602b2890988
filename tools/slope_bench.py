"""Slope test: cost of N sequential fused fq12 ops inside ONE executable.

Times scan-of-N for several N; the slope is the true per-op in-graph cost,
the intercept the per-executable overhead. Also sweeps batch size.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.ops import fp, fq12

fp.set_strategy("fused")
rng = np.random.default_rng(0)

def chain(op, n):
    @jax.jit
    def fn(a):
        def body(x, _):
            return op(x), None
        out, _ = jax.lax.scan(body, a, None, length=n)
        return out
    return fn

def timeit(fn, a, reps=3):
    out = fn(a); np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(a)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)

for B in (512, 2048):
    a = jnp.asarray(rng.integers(0, 255, (B, 12, 48), dtype=np.int64), dtype=jnp.int32)
    for name, op in (("square", fq12.square), ("cyc_sq", fq12.cyclotomic_square)):
        t8 = timeit(chain(op, 8), a)
        t40 = timeit(chain(op, 40), a)
        per = (t40 - t8) / 32
        print(f"B={B:5d} {name:8s} t8={t8*1e3:8.2f}ms t40={t40*1e3:8.2f}ms "
              f"per-op={per*1e3:7.3f}ms  per-elem={per/B*1e9:7.0f}ns")
