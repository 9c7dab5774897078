"""Marginal-cost ablation of the decoder frame step on the real chip.

Times progressively larger prefixes of _frame_step at the 50k-trie bench
shapes (real DeviceFst, synthetic beam/logp — all shapes static, so timing
is data-independent).  The deltas between stages give the marginal cost of
each phase; use this to decide where the next decoder optimization goes.

Run: python scripts/frameprof.py            (defaults = bench shapes)
     BENCH_WORDS=5000 python scripts/frameprof.py   (smaller graph)
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

from catears_tpu.decode import beam as B
from catears_tpu.decode.beam import BeamConfig, BeamState
from catears_tpu.graph.device import DeviceFst
from catears_tpu.graph.transform import prepare_decode_graph
from catears_tpu.tools.biggraph import make_trie_graph

BATCH = int(os.environ.get("PROF_BATCH", 16))
REPS = int(os.environ.get("PROF_REPS", 30))
WORDS = int(os.environ.get("BENCH_WORDS", 50000))

rng = np.random.RandomState(0)
_cache = f"/tmp/trieprof2_{WORDS}.npz"
if os.path.exists(_cache):
    from catears_tpu.graph.fst import FlatFst
    z = np.load(_cache)
    fst = FlatFst(start=int(z["start"]), final=z["final"],
                  offsets=z["offsets"], arc_ilabel=z["arc_ilabel"],
                  arc_next=z["arc_next"], arc_olabel=z["arc_olabel"],
                  arc_weight=z["arc_weight"])
    mode = str(z["mode"])
    olab2 = z["olab2"] if mode == "eps_free" else None
    tid2pdf, num_pdfs = z["tid2pdf"], int(z["num_pdfs"])
else:
    tg = make_trie_graph(rng, num_words=WORDS)
    fst, olab2, mode = prepare_decode_graph(tg.fst)
    tid2pdf, num_pdfs = tg.tid2pdf, tg.num_pdfs
    np.savez(_cache, start=fst.start, final=fst.final, offsets=fst.offsets,
             arc_ilabel=fst.arc_ilabel, arc_next=fst.arc_next,
             arc_olabel=fst.arc_olabel, arc_weight=fst.arc_weight,
             mode=mode, tid2pdf=tid2pdf, num_pdfs=num_pdfs,
             olab2=olab2 if olab2 is not None else np.zeros(1, np.int32))
dfst = DeviceFst.build(fst, tid2pdf,
                       group=int(os.environ.get("PROF_GROUP", 2)),
                       csr_group=int(os.environ.get("PROF_CSR_GROUP", 8))
                       or None,
                       eps_depth_cap=1 if mode != "raw" else None,
                       olabel2=olab2)
cfg = BeamConfig(beam_size=int(os.environ.get("PROF_K", 4096)),
                 expand_size=int(os.environ.get("PROF_EXPAND", 32768)),
                 eps_expand_size=int(os.environ.get("PROF_EPS", 1024)),
                 max_eps_iters=3)
K = cfg.beam_size
P = num_pdfs
print(f"graph: {fst.num_states} states {fst.num_arcs} arcs, "
      f"P={P} K={K} expand={cfg.expand_size} batch={BATCH}")

states = rng.randint(0, fst.num_states, size=(BATCH, K)).astype(np.int32)
beam0 = BeamState(
    states=jnp.asarray(states),
    lm=jnp.zeros((BATCH, K), jnp.int32),
    costs=jnp.asarray(np.sort(rng.rand(BATCH, K).astype(np.float32) * 8, 1)),
    bp=jnp.tile(jnp.arange(K, dtype=jnp.int32), (BATCH, 1)),
    overflow=jnp.zeros((BATCH,), bool),
    hiwater=jnp.zeros((BATCH, 5), jnp.int32),
)
logp0 = jnp.asarray(rng.randn(BATCH, P).astype(np.float32) - 5.0)


def collapse(*arrays):
    """Reduce arrays to a tiny carry delta so nothing is DCE'd.

    Sums WHOLE arrays: a narrow slice here lets XLA narrow the upstream
    gathers and drop most of the work being measured."""
    tot = jnp.zeros((), jnp.float32)
    for a in arrays:
        x = a.astype(jnp.float32) if a.dtype != jnp.float32 else a
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        tot = tot + jnp.sum(x) * 1e-6
    return tot


def stage_expand(beam, logp):
    out = B._expand(cfg, dfst, beam, cfg.expand_size, True, False, False)
    return collapse(out.cost, out.next_state.astype(jnp.float32))


def stage_expand_ac(beam, logp):
    out = B._expand(cfg, dfst, beam, cfg.expand_size, True, False, False)
    ac = B._acoustic_lookup(logp, out.pdf)
    return collapse(out.cost, ac)


def stage_emitting(beam, logp):
    nb, parent, olab0, cutoff, eps_info = B._emitting_step(
        cfg, dfst, None, beam, logp)
    return collapse(nb.costs, cutoff[None])


def stage_emit_eps(beam, logp):
    nb, parent, olab0, cutoff, eps_info = B._emitting_step(
        cfg, dfst, None, beam, logp)
    nb, prev, words = B._eps_closure_fused(cfg, dfst, None, nb, parent,
                                           olab0, eps_info, cutoff)
    return collapse(nb.costs, prev.astype(jnp.float32),
                    words.astype(jnp.float32))


def stage_full(beam, logp):
    nb, trace = B._frame_step(cfg, dfst, None, beam, logp, jnp.bool_(True))
    return collapse(nb.costs, trace.prev_slot.astype(jnp.float32))


def stage_eps_only(beam, logp):
    """Closure in isolation: synthetic emitting output (beam as-is)."""
    k = cfg.beam_size
    slots = jnp.arange(k, dtype=jnp.int32)
    sp = dfst.state_packed[jnp.clip(beam.states, 0, dfst.num_states - 1)]
    eps_info = ((sp[:, 0] << 9)
                | jnp.where(beam.states >= 0, sp[:, 1], 0),)
    nb, prev, words = B._eps_closure_fused(
        cfg, dfst, None, beam._replace(bp=slots), slots,
        jnp.zeros((k,), jnp.int32), eps_info, jnp.float32(1e9))
    return collapse(nb.costs, prev.astype(jnp.float32),
                    words.astype(jnp.float32))


def stage_epsfree(beam, logp):
    """The eps-removed production frame (expand + acoustic + one select)."""
    nb, prev, words = B._eps_free_step(cfg, dfst, None, beam, logp)
    return collapse(nb.costs, prev.astype(jnp.float32),
                    words.astype(jnp.float32))


def stage_select_only(beam, logp):
    """_select_best at emitting-expansion width with synthetic candidates."""
    e = cfg.expand_size + cfg.beam_size * (dfst.group + 1)
    iota = jnp.arange(e, dtype=jnp.int32)
    states = (beam.states[iota % cfg.beam_size] * 7 + iota // 13) % \
        dfst.num_states
    costs = beam.costs[iota % cfg.beam_size] + (iota % 97) * 0.01
    (out, _over, needed) = B._select_best(cfg, states, None, costs,
                                          [iota % cfg.beam_size, iota % 31],
                                          compact=True)
    return collapse(needed[None].astype(jnp.float32),
                    *[o.astype(jnp.float32) for o in out])


def timeit(name, fn):
    @jax.jit
    def run(beam, logp):
        def step(carry, _):
            b, acc = carry
            d = jax.vmap(lambda bb, lp: fn(bb, lp))(b, logp)
            b = b._replace(costs=b.costs + acc[:, None] * 0 + d[:, None] * 0
                           + 1e-7)
            return (b, acc + d), 0

        (b, acc), _ = jax.lax.scan(step, (beam, jnp.zeros((BATCH,))), None,
                                   length=REPS)
        return acc.sum() + b.costs.sum()

    run(beam0, logp0).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(beam0, logp0).block_until_ready()
        times.append(time.perf_counter() - t0)
    per = min(times) / REPS * 1e3
    print(f"{name:14s} {per:8.3f} ms/frame (batch {BATCH})")
    return per


if __name__ == "__main__":
    stages = os.environ.get("PROF_STAGES", "all")
    if stages == "full":
        timeit("full", stage_full)
    elif stages == "parts":
        timeit("eps_only", stage_eps_only)
        timeit("select_only", stage_select_only)
        timeit("expand", stage_expand)
    elif stages == "epsfree":
        timeit("expand", stage_expand)
        timeit("select_only", stage_select_only)
        timeit("epsfree_full", stage_epsfree)
        timeit("old_full", stage_emit_eps)  # two-select path, same graph
    else:
        t1 = timeit("expand", stage_expand)
        t2 = timeit("expand+ac", stage_expand_ac)
        t3 = timeit("emitting", stage_emitting)
        t4 = timeit("emit+eps", stage_emit_eps)
        t5 = timeit("full", stage_full)
        print(f"marginals: acoustic={t2 - t1:.3f} select={t3 - t2:.3f} "
              f"eps+trace={t4 - t3:.3f} freeze={t5 - t4:.3f}")
