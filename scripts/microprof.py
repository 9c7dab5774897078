"""Micro-profile the decoder frame step's components on the real chip.

Times each stage in isolation (jitted separately, scanned over frames so
dispatch overhead amortizes) to attribute the per-frame budget.
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

from bench import build_bench_setup  # noqa: E402
from catears_tpu.decode import beam as B  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", 16))
FRAMES = int(os.environ.get("PROF_FRAMES", 100))

am, fst, dfst, _dlm, cfg, wave, planted, _tw = build_bench_setup(BATCH, 10.0)
if os.environ.get("PROF_GROUP"):
    from catears_tpu.graph.device import DeviceFst
    dfst = DeviceFst.build(fst, am.tid2pdf,
                           group=int(os.environ["PROF_GROUP"]),
                           eps_depth_cap=dfst.eps_depth)
rng = np.random.RandomState(0)
if planted is not None:  # trie workload: realistic planted-path frames
    logp = jnp.asarray(np.transpose(planted, (1, 0, 2))[:FRAMES])
else:
    logp = jnp.asarray(
        rng.randn(FRAMES, BATCH, am.num_pdfs).astype(np.float32))
beam0, _ = B.init_beam_batch(cfg, False, BATCH, dfst, None)


def fetch(out):
    """Force real completion: on the axon tunnel block_until_ready returns
    before execution finishes, so timing must round-trip a value to host."""
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def timeit(name, fn, *args):
    out = fn(*args)
    fetch(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        times.append(time.perf_counter() - t0)
    per_frame = min(times) / FRAMES * 1e6
    print(f"{name:28s} {per_frame:9.1f} us/frame  (total {min(times)*1e3:.1f} ms)")
    return out


def scan_stage(stage_fn):
    """Scan a per-frame stage over all FRAMES frames, carrying the beam."""

    @jax.jit
    def run(beam, logp):
        def step(b, lp):
            return stage_fn(b, lp), 0
        b, _ = jax.lax.scan(step, beam, logp)
        return b
    return run


def full_step(b, lp):
    fv = jnp.ones((BATCH,), bool)
    step = jax.vmap(lambda bb, l, fvv: B._frame_step(
        cfg, dfst, None, bb, l, fvv), in_axes=(0, 0, 0))
    nb, _tr = step(b, lp, fv)
    return nb


def emit_only(b, lp):
    step = jax.vmap(lambda bb, l: B._emitting_step(
        cfg, dfst, None, bb, l)[0], in_axes=(0, 0))
    return step(b, lp)


def expand_only(b, lp):
    def one(bb, l):
        c = B._expand(cfg, dfst, bb, cfg.expand_size, True, False, False)
        ac = -cfg.am_scale * B._acoustic_lookup(l, c.pdf)
        cost = c.cost + ac
        s = cost.sum() + c.next_state.sum().astype(jnp.float32)
        return B.BeamState(bb.states, bb.lm, bb.costs + 0.0 * s, bb.bp,
                           bb.overflow, bb.hiwater)
    return jax.vmap(one, in_axes=(0, 0))(b, lp)


def emit_close(b, lp):
    def one(bb, l):
        nb, parent, olab0, cutoff, eps_info = B._emitting_step(
            cfg, dfst, None, bb, l)
        nb, prev, words = B._eps_closure_fused(cfg, dfst, None, nb, parent,
                                               olab0, eps_info, cutoff)
        s = prev.sum() + words.sum()
        return B.BeamState(nb.states, nb.lm,
                           nb.costs + 0.0 * s.astype(jnp.float32), nb.bp,
                           nb.overflow, nb.hiwater)
    return jax.vmap(one, in_axes=(0, 0))(b, lp)


def acoustic_only(b, lp):
    def one(bb, l):
        e = cfg.beam_size * dfst.group + cfg.expand_size
        idx = jnp.arange(e, dtype=jnp.int32) % am.num_pdfs
        v = B._acoustic_lookup(l, idx)
        return B.BeamState(bb.states, bb.lm, bb.costs + 0.0 * v.sum(),
                           bb.bp, bb.overflow, bb.hiwater)
    return jax.vmap(one, in_axes=(0, 0))(b, lp)


def select_only(b, lp):
    def one(bb, l):
        e = cfg.beam_size * dfst.group + cfg.expand_size
        idx = jnp.arange(e, dtype=jnp.int32)
        states = idx % jnp.int32(50021)
        costs = l[idx % am.num_pdfs]
        (s, lm, c, pa, pb), _over, _need = B._select_best(
            cfg, states, None, costs, [idx, idx])
        return B.BeamState(s, lm, c + 0.0 * (pa.sum() + pb.sum()),
                           bb.bp, bb.overflow, bb.hiwater)
    return jax.vmap(one, in_axes=(0, 0))(b, lp)


print(f"batch={BATCH} frames={FRAMES} beam={cfg.beam_size} "
      f"expand={cfg.expand_size} eps_expand={cfg.eps_expand_size} "
      f"group={dfst.group} eps_depth={dfst.eps_depth}")
timeit("full _frame_step", scan_stage(full_step), beam0, logp)
timeit("emitting step only", scan_stage(emit_only), beam0, logp)
timeit("emitting + eps closure", scan_stage(emit_close), beam0, logp)
timeit("expand+cost only", scan_stage(expand_only), beam0, logp)
timeit("acoustic lookup only", scan_stage(acoustic_only), beam0, logp)
timeit("select_best only", scan_stage(select_only), beam0, logp)
