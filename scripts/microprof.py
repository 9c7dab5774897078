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

am, fst, dfst, cfg, wave = build_bench_setup(BATCH, 10.0)
if os.environ.get("PROF_GROUP"):
    from catears_tpu.graph.device import DeviceFst
    dfst = DeviceFst.build(fst, am.tid2pdf,
                           group=int(os.environ["PROF_GROUP"]))
rng = np.random.RandomState(0)
logp = jnp.asarray(rng.randn(FRAMES, BATCH, am.num_pdfs).astype(np.float32))
beam0, _ = B.init_beam_batch(cfg, False, BATCH, dfst, None)
lane_offsets = jnp.arange(BATCH, dtype=jnp.int32) * am.num_pdfs


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    per_frame = min(times) / FRAMES * 1e6
    print(f"{name:28s} {per_frame:9.1f} us/frame  (total {min(times)*1e3:.1f} ms)")
    return out


def scan_stage(stage_fn):
    """Scan a per-frame stage over all FRAMES frames, carrying the beam."""

    @jax.jit
    def run(beam, logp):
        def step(b, lp):
            return stage_fn(b, lp.reshape(-1)), 0
        b, _ = jax.lax.scan(step, beam, logp)
        return b
    return run


# --- full frame step ---
def full_step(b, lp_flat):
    fv = jnp.ones((BATCH,), bool)
    step = jax.vmap(lambda bb, lo, fvv: B._frame_step(
        cfg, dfst, None, bb, lp_flat, lo, fvv),
        in_axes=(0, 0, 0))
    nb, _tr = step(b, lane_offsets, fv)
    return nb


# --- emitting only (expand + cost + select_best + threshold) ---
def emit_only(b, lp_flat):
    step = jax.vmap(lambda bb, lo: B._emitting_step(
        cfg, dfst, None, bb, lp_flat, lo)[0], in_axes=(0, 0))
    return step(b, lane_offsets)


# --- expand only ---
def expand_only(b, lp_flat):
    def one(bb, lo):
        out = B._expand(cfg, dfst, bb, cfg.expand_size, True)
        ac = -cfg.am_scale * lp_flat[lo + out[8]]
        cost = out[2] + out[7] + ac
        # keep beam unchanged; reduce outputs so XLA can't DCE the gathers
        s = cost.sum() + out[5].sum()
        return B.BeamState(bb.states, bb.lm,
                           bb.costs + 0.0 * s, bb.bp)
    return jax.vmap(one, in_axes=(0, 0))(b, lane_offsets)


# --- select_best only (on synthetic candidates derived from logp) ---
def select_only(b, lp_flat):
    def one(bb, lo):
        e = cfg.expand_size
        idx = jnp.arange(e, dtype=jnp.int32)
        states = idx % jnp.int32(50021)
        costs = lp_flat[lo + (idx % am.num_pdfs)]
        s, l, c, pa, pb = B._select_best(cfg, states, None, costs, idx, idx)
        return B.BeamState(s, l, c + 0.0 * (pa.sum() + pb.sum()), bb.bp)
    return jax.vmap(one, in_axes=(0, 0))(b, lane_offsets)


print(f"batch={BATCH} frames={FRAMES} beam={cfg.beam_size} "
      f"expand={cfg.expand_size} eps_expand={cfg.eps_expand_size} "
      f"eps_depth={dfst.eps_depth}")
timeit("full _frame_step", scan_stage(full_step), beam0, logp)
timeit("emitting step only", scan_stage(emit_only), beam0, logp)
timeit("expand+cost only", scan_stage(expand_only), beam0, logp)
timeit("select_best only", scan_stage(select_only), beam0, logp)
