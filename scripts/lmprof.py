"""On-chip cost breakdown of the delta-LM walk at bench shapes.

Measures lm_propagate (uncapped) vs lm_propagate_capped at several caps,
plus the compaction pieces in isolation (cumsum+searchsorted, back-map
gather), over a real ARPA-shaped DeviceLm and synthetic candidate lanes
with a realistic active fraction.

Run: python scripts/lmprof.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/catears_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from catears_tpu.graph.device import (  # noqa: E402
    DeviceLm,
    lm_propagate,
    lm_propagate_capped,
)
from catears_tpu.tools.biggraph import make_big_lm  # noqa: E402

BATCH = int(os.environ.get("PROF_BATCH", 16))
E = int(os.environ.get("PROF_E", 49152))
ACTIVE = int(os.environ.get("PROF_ACTIVE", 400))
WORDS = int(os.environ.get("BENCH_WORDS", 50000))
REPS = int(os.environ.get("PROF_REPS", 20))

rng = np.random.RandomState(0)
print(f"# building {WORDS}-word G'...", file=sys.stderr)
big = make_big_lm(rng, num_words=WORDS)
dlm = DeviceLm.build(big.delta_lm())
print(f"# G': hash buckets={dlm.hash_mask + 1} states={big.num_states}",
      file=sys.stderr)

labels = np.zeros((BATCH, E), np.int32)
states = np.zeros((BATCH, E), np.int32)
for b in range(BATCH):
    idx = rng.choice(E, size=ACTIVE, replace=False)
    labels[b, idx] = rng.randint(1, WORDS + 1, size=ACTIVE)
    states[b, idx] = rng.randint(0, big.num_states, size=ACTIVE)
labels0, states0 = jnp.asarray(labels), jnp.asarray(states)


def timeit(name, fn):
    @jax.jit
    def run(states, labels):
        def step(carry, _):
            s, acc = carry
            ns, w = jax.vmap(fn)(s, labels)
            acc = acc + jnp.sum(jnp.where(jnp.isfinite(w), w, 0.0))
            return (jnp.where(labels > 0, ns, s), acc), 0

        (s, acc), _ = jax.lax.scan(step, (states, 0.0), None, length=REPS)
        return acc + s.sum()

    run(states0, labels0).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(states0, labels0).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name:16s} {min(ts) / REPS * 1e3:8.3f} ms/call (batch {BATCH})")


def f_uncapped(s, l):
    return lm_propagate(dlm, s, l)


def make_capped(cap):
    def f(s, l):
        ns, w, _ = lm_propagate_capped(dlm, s, l, cap)
        return ns, w
    return f


def f_compact_only(s, l):
    """cumsum + searchsorted + gathers, walk replaced by identity."""
    cap = 4096
    active = l > 0
    rank = jnp.cumsum(active.astype(jnp.int32))
    tgt = jnp.arange(1, cap + 1, dtype=jnp.int32)
    lane = jnp.searchsorted(rank, tgt, side="left").astype(jnp.int32)
    lane_c = jnp.minimum(lane, l.shape[0] - 1)
    sub_s = s[lane_c]
    sub_l = l[lane_c]
    packed = jnp.stack([sub_s + sub_l, sub_s], axis=1)
    row = packed[jnp.clip(rank - 1, 0, cap - 1)]
    return jnp.where(active, row[:, 0], s), row[:, 1].astype(jnp.float32)


def f_walk_only(s, l):
    """The bounded backoff walk at cap width, no compaction."""
    cap = 4096
    ns, w = lm_propagate(dlm, s[:cap], l[:cap])
    return (jnp.concatenate([ns, s[cap:]]),
            jnp.concatenate([w, jnp.zeros(s.shape[0] - cap, jnp.float32)]))


if __name__ == "__main__":
    timeit("walk_cap4096", f_walk_only)
    timeit("compact_only", f_compact_only)
    timeit("capped_512", make_capped(512))
    timeit("capped_4096", make_capped(4096))
    timeit("uncapped", f_uncapped)
