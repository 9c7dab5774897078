"""Is the emit_block gather size-bound or locality-bound, and how big is
the hot/cold-split prize?  (round-5 VERDICT #7 groundwork)

Measures the decoder-shaped [B=16, K=2048] row gather against the REAL
emit_block geometry ([S, 18] i32) at table sizes 44 MB (618k states,
the 50k-word trie), 8 MB and 2 MB, with uniform vs Zipf-concentrated
(hot-90%-in-first-8MB) index distributions, plus the compact_mask
bookkeeping cost at beam width — everything a hot/cold split would pay
or save.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/catears_jax_cache")

B, K, W = 16, 2048, 18
REPS = 100
rng = np.random.RandomState(0)


def timeit(name, fn):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    us = min(ts) / REPS * 1e6
    print(f"{name:58s} {us:9.1f} us/iter "
          f"({us * 1e3 / (B * K):6.2f} ns/row)")


def gather_bench(s_rows, idx):
    table = jnp.asarray(rng.randint(0, 100, (s_rows, W), dtype=np.int32))
    idx_d = jnp.asarray(idx)

    @jax.jit
    def run(table, idx):
        def step(c, i):
            return c + table[i].astype(jnp.float32).sum(), 0
        c, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return c

    return lambda: run(table, idx_d)


def main():
    S_BIG = 618_000   # 44 MB at [S, 18] i32
    S_8MB = 116_000
    S_2MB = 29_000
    uni_big = rng.randint(0, S_BIG, (REPS, B, K), dtype=np.int32)
    # Zipf-ish: 90% of rows in the first 8 MB, rest anywhere.
    hot = rng.randint(0, S_8MB, (REPS, B, K), dtype=np.int32)
    cold = rng.randint(0, S_BIG, (REPS, B, K), dtype=np.int32)
    mask = rng.rand(REPS, B, K) < 0.9
    zipf_big = np.where(mask, hot, cold).astype(np.int32)
    uni_8 = rng.randint(0, S_8MB, (REPS, B, K), dtype=np.int32)
    uni_2 = rng.randint(0, S_2MB, (REPS, B, K), dtype=np.int32)

    timeit("emit gather 44MB table, uniform idx", gather_bench(S_BIG, uni_big))
    timeit("emit gather 44MB table, 90%-hot-8MB idx", gather_bench(S_BIG, zipf_big))
    timeit("emit gather 8MB table, uniform idx", gather_bench(S_8MB, uni_8))
    timeit("emit gather 2MB table, uniform idx", gather_bench(S_2MB, uni_2))

    # compact_mask bookkeeping at beam width (what a cold-lane
    # compaction pass would add per frame), 10% survivors -> 512 slots.
    from catears_tpu.graph.device import compact_mask
    keep = jnp.asarray(rng.rand(REPS, B, K) < 0.1)
    vals = jnp.asarray(rng.randint(0, S_BIG, (REPS, B, K), dtype=np.int32))

    @jax.jit
    def run_cm(keep, vals):
        def step(c, kv):
            k, v = kv
            def one(k1, v1):
                (out,), valid, total, src = compact_mask(k1, [v1], 512)
                return out.sum() + total
            return c + jax.vmap(one)(k, v).sum(), 0
        c, _ = jax.lax.scan(step, jnp.int32(0), (keep, vals))
        return c

    timeit("compact_mask K=2048 -> 512 (vmapped B=16)",
           lambda: run_cm(keep, vals))
    return 0


if __name__ == "__main__":
    sys.exit(main())
