"""Raw gather cost measurements on the chip, for decoder design decisions.

Measures row gathers of various (rows, width) against the tables the
decoder actually uses, scanned 100x so dispatch amortizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/catears_jax_cache")

B = 16
E = 8192
K = 2048
A = 40000
P = 4096
REPS = 100
rng = np.random.RandomState(0)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)/REPS*1e6:9.1f} us/iter")
    return out


def scan_gather(table, idx_shape, max_idx):
    idx = jnp.asarray(rng.randint(0, max_idx, size=(REPS,) + idx_shape,
                                  dtype=np.int32))

    @jax.jit
    def run(table, idx):
        def step(c, i):
            g = table[i]
            return c + g.astype(jnp.float32).sum(), 0
        c, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return c
    return lambda: run(table, idx)


# per-utterance vmapped row gathers (the current decoder shape)
tok_table = jnp.asarray(rng.randint(0, 100, (B, K, 8), dtype=np.int32))
arc_table = jnp.asarray(rng.randint(0, 100, (A, 4), dtype=np.int32))
arc_table_w32 = jnp.asarray(rng.randint(0, 100, (A, 32), dtype=np.int32))
arc_table_w16 = jnp.asarray(rng.randint(0, 100, (A, 16), dtype=np.int32))
logp_flat = jnp.asarray(rng.randn(B * P).astype(np.float32))

idxBE = jnp.asarray(rng.randint(0, A, (REPS, B, E), dtype=np.int32))
idxBK = jnp.asarray(rng.randint(0, K, (REPS, B, E), dtype=np.int32))
idxBE4 = jnp.asarray(rng.randint(0, A, (REPS, B, E // 4), dtype=np.int32))
idxBE8 = jnp.asarray(rng.randint(0, A, (REPS, B, E // 8), dtype=np.int32))
idx_logp = jnp.asarray(rng.randint(0, B * P, (REPS, B, E), dtype=np.int32))
idx_logp4 = jnp.asarray(rng.randint(0, B * P, (REPS, B, E // 4),
                                    dtype=np.int32))


@jax.jit
def g_token(idx):
    def step(c, i):
        # vmapped per-utterance gather from each utt's own [K, 8] table
        g = jax.vmap(lambda t, ii: t[ii])(tok_table, i)
        return c + g.astype(jnp.float32).sum(), 0
    return jax.lax.scan(step, jnp.float32(0), idx)[0]


def make_shared(table):
    @jax.jit
    def g(idx):
        def step(c, i):
            return c + table[i].astype(jnp.float32).sum(), 0
        return jax.lax.scan(step, jnp.float32(0), idx)[0]
    return g


@jax.jit
def g_logp(idx):
    def step(c, i):
        return c + logp_flat[i].sum(), 0
    return jax.lax.scan(step, jnp.float32(0), idx)[0]


timeit(f"token row gather  [B,{E}] from [B,{K},8]", g_token, idxBK)
timeit(f"arc row gather    [B,{E}] from [{A},4]", make_shared(arc_table),
       idxBE)
timeit(f"arc grouped G=4   [B,{E//4}] from [{A},16]",
       make_shared(arc_table_w16), idxBE4)
timeit(f"arc grouped G=8   [B,{E//8}] from [{A},32]",
       make_shared(arc_table_w32), idxBE8)
timeit(f"logp elem gather  [B,{E}] from [{B*P}]", g_logp, idx_logp)
timeit(f"logp elem gather  [B,{E//4}] from [{B*P}]", g_logp, idx_logp4)
