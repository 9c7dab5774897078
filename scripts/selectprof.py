"""Compare exact dedup+prune strategies for _select_best on the real chip.

Candidates (all must be EXACT Viterbi semantics: keep min-cost per
(state), then the K best by cost with ties broken by input order):

  sort_topk    current: lax.sort (state, cost, iota) + lax.top_k
  sort_sort    lax.sort dedup pass + second lax.sort by eff_cost
  topk_only    skip dedup entirely (WRONG, lower bound on prune cost)
  sort_only    dedup sort alone (lower bound on dedup cost)
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

BATCH = int(os.environ.get("BENCH_BATCH", 16))
N = int(os.environ.get("PROF_N", 6144))
K = int(os.environ.get("PROF_K", 2048))
STATES = int(os.environ.get("PROF_STATES", 50021))
REPS = int(os.environ.get("PROF_REPS", 100))

INF = jnp.float32(jnp.inf)
SENTINEL = jnp.int32(2**30)

rng = np.random.RandomState(0)
states0 = jnp.asarray(
    rng.randint(0, STATES, size=(BATCH, N)).astype(np.int32))
costs0 = jnp.asarray(rng.rand(BATCH, N).astype(np.float32) * 30)


def v_sort_topk(states, costs):
    n = states.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    s_states, s_costs, s_iota = jax.lax.sort((states, costs, iota),
                                             num_keys=2)
    first = jnp.ones_like(s_states, jnp.bool_)
    first = first.at[1:].set(s_states[1:] != s_states[:-1])
    eff = jnp.where(first & (s_states < SENTINEL), s_costs, INF)
    neg_top, idx = jax.lax.top_k(-eff, K)
    return s_states[idx], -neg_top, s_iota[idx]


def v_sort_sort(states, costs):
    n = states.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    s_states, s_costs, s_iota = jax.lax.sort((states, costs, iota),
                                             num_keys=2)
    first = jnp.ones_like(s_states, jnp.bool_)
    first = first.at[1:].set(s_states[1:] != s_states[:-1])
    eff = jnp.where(first & (s_states < SENTINEL), s_costs, INF)
    # second sort: ascending eff cost; stable so earlier (state-sorted)
    # entries win ties
    o_cost, o_states, o_iota = jax.lax.sort((eff, s_states, s_iota),
                                            num_keys=1)
    return o_states[:K], o_cost[:K], o_iota[:K]


def v_topk_only(states, costs):
    neg_top, idx = jax.lax.top_k(-costs, K)
    return states[idx], -neg_top, idx


def v_sort_only(states, costs):
    n = states.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    s_states, s_costs, s_iota = jax.lax.sort((states, costs, iota),
                                             num_keys=2)
    return s_states[:K], s_costs[:K], s_iota[:K]


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def timeit(name, variant):
    @jax.jit
    def run(states, costs):
        def step(carry, _):
            s, c = carry
            os_, oc, oi = jax.vmap(variant)(s, c)
            # feed outputs back so reps serialize and nothing is DCE'd
            s = s.at[:, :K].set(os_ + 0 * oi)
            c = c.at[:, :K].set(oc + 1e-7)
            return (s, c), 0
        (s, c), _ = jax.lax.scan(step, (states, costs), None, length=REPS)
        return c.sum()

    fetch(run(states0, costs0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run(states0, costs0))
        times.append(time.perf_counter() - t0)
    per = min(times) / REPS * 1e6
    print(f"{name:14s} {per:9.1f} us/rep")


print(f"batch={BATCH} n={N} K={K}")
timeit("sort_topk", v_sort_topk)
timeit("sort_sort", v_sort_sort)
timeit("topk_only", v_topk_only)
timeit("sort_only", v_sort_only)
