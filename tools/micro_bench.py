"""Microbenchmark of the fused tower kernels on TPU (dev diagnostic)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_bls12_381_pairing_tpu.ops import fp, fq12
from plonky2_bls12_381_pairing_tpu.ops.pallas import tower, mont

fp.set_strategy("fused")

B = int(os.environ.get("MB_B", "512"))
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 255, (B, 12, 48), dtype=np.int64), dtype=jnp.int32)
b = jnp.asarray(rng.integers(0, 255, (B, 12, 48), dtype=np.int64), dtype=jnp.int32)
d = jnp.asarray(rng.integers(0, 255, (B, 6, 48), dtype=np.int64), dtype=jnp.int32)
x48 = jnp.asarray(rng.integers(0, 255, (B, 48), dtype=np.int64), dtype=jnp.int32)

def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:28s} B={B}  best={best*1e3:8.3f} ms  {B/best:12.0f} elem/s")
    return best

timeit("fq12_mul", tower.fq12_mul, a, b)
timeit("fq12_square", tower.fq12_square, a)
timeit("fq12_mul_by_014", tower.fq12_mul_by_014, a, d)
timeit("fq12_cyc_square", tower.fq12_cyclotomic_square, a)
timeit("mont_mul(48)", mont.mont_mul, x48, x48)

# block-size sweep for mul
for blk in (16, 32, 64):
    try:
        timeit(f"fq12_mul blk={blk}", lambda x, y: tower.fq12_mul(x, y, block=blk), a, b)
    except Exception as e:
        print(f"fq12_mul blk={blk} FAILED: {type(e).__name__}")
for blk in (16, 32):
    try:
        timeit(f"fq12_sq blk={blk}", lambda x: tower.fq12_square(x, block=blk), a)
    except Exception as e:
        print(f"fq12_sq blk={blk} FAILED: {type(e).__name__}")

# XLA path comparison
fp.set_strategy("xla")
mulx = jax.jit(fq12.mul)
sqx = jax.jit(fq12.square)
timeit("fq12_mul (xla)", mulx, a % 250, b % 250)
timeit("fq12_square (xla)", sqx, a % 250)
