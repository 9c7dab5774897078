"""On-chip comparison of exact dedup+top-K strategies at bench shapes.

The decoder's per-frame floor is _select_best: dedup candidates by state
keeping the min cost, then keep the K best by cost (exact Viterbi
semantics, ties by input position).  At the 50k-trie bench shapes that is
two 3-operand lax.sorts over N ~= 53k candidates per frame per utterance.

Measured on TPU v5e at bench shapes (batch 16, N=53248, K=4096):
  sort2x3 3.41 ms   sort2x2 3.32 ms   scatter 52.1 ms   sort_u64 3.87 ms
Conclusions: scatter-based dedup is 15x worse (TPU scatters serialize);
u64 packed keys LOSE ~16% (64-bit lanes are emulated as u32 pairs, so the
packing saves no sort bandwidth and adds pack/unpack work).  sort2x2 — the
production _select_best — is the winner; improvements must come from
shrinking N or from a fused Pallas selection, not from key packing.

Variants (all EXACT):
  sort2x3   current: sort (state, cost, iota) 2-key + sort (eff, state, iota)
  sort2x2   trimmed: same but the 2nd sort carries only (eff, iota); the
            states/payloads are recovered by ONE packed row gather at the
            kept K slots.
  scatter   dedup via scatter-min into a [S]-sized cost table (perfect
            hash = state id) + tie-break scatter + restore, then a single
            2-operand sort for the top-K.  O(N) scatters replace the
            O(N log^2 N) dedup sort.
  scatter_seg  same dedup, then segmented top-K: per-128-lane-block
            min-reduce prune... (placeholder, only if scatter wins)

Run on the real chip: JAX_PLATFORMS= python scripts/dedupprof.py
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
# u64 packed-key variant needs 64-bit lanes (profiler-only; all dtypes in
# this script are explicit, so nothing else changes).
jax.config.update("jax_enable_x64", True)

BATCH = int(os.environ.get("PROF_BATCH", 16))
N = int(os.environ.get("PROF_N", 53248))
K = int(os.environ.get("PROF_K", 4096))
S = int(os.environ.get("PROF_STATES", 618000))
REPS = int(os.environ.get("PROF_REPS", 30))

INF = jnp.float32(jnp.inf)
SENTINEL = jnp.int32(2**30)
INF_KEY = jnp.uint32(0xFF800000)  # sortable key of +inf (bits | sign)

rng = np.random.RandomState(0)
# Realistic duplicate structure: ~40% of candidates collide on a state
st = rng.randint(0, S, size=(BATCH, N)).astype(np.int32)
dup = rng.rand(BATCH, N) < 0.4
st[dup] = rng.randint(0, S // 50, size=int(dup.sum()))
# ~15% invalid (sentinel)
st[rng.rand(BATCH, N) < 0.15] = int(SENTINEL)
states0 = jnp.asarray(st)
costs0 = jnp.asarray(rng.rand(BATCH, N).astype(np.float32) * 30)
pa0 = jnp.asarray(rng.randint(0, K, size=(BATCH, N)).astype(np.int32))
pb0 = jnp.asarray(rng.randint(0, 100, size=(BATCH, N)).astype(np.int32))


def sortable(c):
    b = jax.lax.bitcast_convert_type(c, jnp.uint32)
    return jnp.where(b >> 31 == 0, b | jnp.uint32(0x80000000), ~b)


def v_sort2x3(states, costs, pa, pb, tables):
    iota = jnp.arange(N, dtype=jnp.int32)
    s_states, s_costs, s_iota = jax.lax.sort((states, costs, iota),
                                             num_keys=2)
    first = jnp.ones_like(s_states, jnp.bool_)
    first = first.at[1:].set(s_states[1:] != s_states[:-1])
    eff = jnp.where(first & (s_states < SENTINEL), s_costs, INF)
    o_cost, o_states, o_iota = jax.lax.sort((eff, s_states, s_iota),
                                            num_keys=1)
    payload = jnp.stack([pa, pb], 1)[o_iota[:K]]
    return (o_states[:K], o_cost[:K], payload[:, 0], payload[:, 1]), tables


def v_sort2x2(states, costs, pa, pb, tables):
    iota = jnp.arange(N, dtype=jnp.int32)
    s_states, s_costs, s_iota = jax.lax.sort((states, costs, iota),
                                             num_keys=2)
    first = jnp.ones_like(s_states, jnp.bool_)
    first = first.at[1:].set(s_states[1:] != s_states[:-1])
    eff = jnp.where(first & (s_states < SENTINEL), s_costs, INF)
    o_cost, o_iota = jax.lax.sort((eff, s_iota), num_keys=1)
    keep = o_iota[:K]
    payload = jnp.stack([states, pa, pb], 1)[keep]
    return (payload[:, 0], o_cost[:K], payload[:, 1], payload[:, 2]), tables


def v_scatter(states, costs, pa, pb, tables):
    ctab, itab = tables
    iota = jnp.arange(N, dtype=jnp.int32)
    idx = jnp.where(states < SENTINEL, states, S)
    key = jnp.where(states < SENTINEL, sortable(costs), INF_KEY)
    ctab = ctab.at[idx].min(key)
    win_c = ctab[idx] == key
    itab = itab.at[idx].min(jnp.where(win_c, iota, N))
    winner = win_c & (itab[idx] == iota) & (states < SENTINEL)
    # restore tables for the next frame (touch only written slots)
    ctab = ctab.at[idx].set(INF_KEY)
    itab = itab.at[idx].set(N)
    eff = jnp.where(winner, costs, INF)
    o_cost, o_iota = jax.lax.sort((eff, iota), num_keys=1)
    keep = o_iota[:K]
    payload = jnp.stack([states, pa, pb], 1)[keep]
    return ((payload[:, 0], o_cost[:K], payload[:, 1], payload[:, 2]),
            (ctab, itab))


def v_sort_u64(states, costs, pa, pb, tables):
    """Packed-key variant: (state<<32 | cost_bits) u64 + iota -> 2-operand
    dedup sort; (eff<<32 | iota) -> SINGLE-operand prune sort.

    Exactness: state < 2^31 and sortable-f32 cost bits preserve order, so
    the packed u64 orders identically to the 2-key sort; iota in the prune
    key's low bits reproduces stable tie-breaking by position."""
    iota = jnp.arange(N, dtype=jnp.int32)
    key = (states.astype(jnp.uint64) << 32) | sortable(costs)
    s_key, s_iota = jax.lax.sort((key, iota), num_keys=1)
    s_states = (s_key >> 32).astype(jnp.int32)
    first = jnp.ones_like(s_states, jnp.bool_)
    first = first.at[1:].set(s_states[1:] != s_states[:-1])
    eff_bits = jnp.where(first & (s_states < SENTINEL), s_key & 0xFFFFFFFF,
                         jnp.uint64(INF_KEY))
    # Tie-break by POSITION in the dedup-sorted array (== what the stable
    # 2-operand sort does), not by original iota: bit-identical selection.
    key2 = (eff_bits << 32) | jnp.arange(N, dtype=jnp.uint32)
    o_key = jax.lax.sort((key2,), num_keys=1)[0]
    keep = s_iota[(o_key & 0xFFFFFFFF).astype(jnp.int32)[:K]]
    eff32 = (o_key[:K] >> 32).astype(jnp.uint32)
    back = jnp.where(eff32 >> 31 != 0, eff32 & 0x7FFFFFFF, ~eff32)
    o_cost = jax.lax.bitcast_convert_type(back, jnp.float32)
    payload = jnp.stack([states, pa, pb], 1)[keep]
    return (payload[:, 0], o_cost, payload[:, 1], payload[:, 2]), tables


def timeit(name, variant, with_tables):
    if with_tables:
        tables0 = (jnp.full((BATCH, S + 1), INF_KEY, jnp.uint32),
                   jnp.full((BATCH, S + 1), N, jnp.int32))
    else:
        tables0 = (jnp.zeros((BATCH, 1), jnp.uint32),
                   jnp.zeros((BATCH, 1), jnp.int32))

    @jax.jit
    def run(states, costs, pa, pb, tables):
        def step(carry, _):
            s, c, tables = carry
            (os_, oc, opa, opb), tables = jax.vmap(variant)(
                s, c, pa, pb, tables)
            # feed outputs back so reps serialize and nothing is DCE'd
            s = s.at[:, :K].set(jnp.where(os_ < SENTINEL, os_, 0) + 0 * opa)
            c = c.at[:, :K].set(jnp.where(jnp.isfinite(oc), oc, 0.0) + 1e-7
                                + 0.0 * opb)
            return (s, c, tables), 0

        (s, c, _), _ = jax.lax.scan(step, (states, costs, tables), None,
                                    length=REPS)
        return c.sum()

    out = run(states0, costs0, pa0, pb0, tables0)
    out.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(states0, costs0, pa0, pb0, tables0).block_until_ready()
        times.append(time.perf_counter() - t0)
    per = min(times) / REPS * 1e6
    print(f"{name:12s} {per:9.1f} us/frame-step (batch {BATCH})")


def check_equiv():
    """All variants must produce the same (state -> cost) selection."""
    tabs = (jnp.full((BATCH, S + 1), INF_KEY, jnp.uint32),
            jnp.full((BATCH, S + 1), N, jnp.int32))
    small = (jnp.zeros((BATCH, 1), jnp.uint32),
             jnp.zeros((BATCH, 1), jnp.int32))
    r1, _ = jax.vmap(v_sort2x3)(states0, costs0, pa0, pb0, small)
    r2, _ = jax.vmap(v_sort2x2)(states0, costs0, pa0, pb0, small)
    do_scatter = os.environ.get("PROF_SCATTER") == "1"
    if do_scatter:
        r3, tabs_after = jax.vmap(v_scatter)(states0, costs0, pa0, pb0, tabs)
    r4, _ = jax.vmap(v_sort_u64)(states0, costs0, pa0, pb0, small)
    for b in range(BATCH):
        def norm(r):
            s, c, a, pb_ = (np.asarray(x[b]) for x in r)
            m = np.isfinite(c)
            return sorted(zip(s[m].tolist(), c[m].tolist(), a[m].tolist(),
                              pb_[m].tolist()))
        n1, n2, n4 = norm(r1), norm(r2), norm(r4)
        assert n1 == n2, f"sort2x2 mismatch batch {b}"
        assert n1 == n4, f"sort_u64 mismatch batch {b}"
        if do_scatter:
            assert n1 == norm(r3), f"scatter mismatch batch {b}"
    # tables must be fully restored
    if do_scatter:
        assert bool(
            (np.asarray(tabs_after[0]) == np.uint32(0xFF800000)).all())
        assert bool((np.asarray(tabs_after[1]) == N).all())
    print("equivalence ok (all variants identical, tables restored)")


if __name__ == "__main__":
    print(f"batch={BATCH} n={N} K={K} S={S}")
    check_equiv()
    timeit("sort2x3", v_sort2x3, False)
    timeit("sort2x2", v_sort2x2, False)
    if os.environ.get("PROF_SCATTER") == "1":
        timeit("scatter", v_scatter, True)  # measured 15x worse; opt-in
    timeit("sort_u64", v_sort_u64, False)
