"""Stage timing of the exact bench.py decode loop on the real chip.

Splits run_once into AM forward / decode chunks / trace concat+backtrace /
host transfer and times each with block_until_ready, to locate overhead
that frameprof's isolated frame-step timing cannot see (dispatch gaps,
trace materialization, backtrace).

Run: python scripts/benchprof.py
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

import bench
from catears_tpu.decode.beam import (
    FrameTrace,
    backtrace_device,
    decode_chunk,
    init_beam_batch,
)
from catears_tpu.frontend.fbank import fbank_from_wave, num_frames

batch = int(os.environ.get("BENCH_BATCH", 16))
seconds = float(os.environ.get("BENCH_SECONDS", 10.0))
chunk = int(os.environ.get("BENCH_CHUNK", 100))
am, fst, dfst, dlm, cfg, wave, planted, true_words = bench.build_bench_setup(
    batch, seconds)
has_lm = dlm is not None
t_frames = num_frames(wave.shape[1])
planted_dev = (None if planted is None
               else jnp.asarray(np.transpose(planted, (1, 0, 2))))


@jax.jit
def am_forward(wave):
    def one(w):
        feats = fbank_from_wave(w, t_frames)
        padded = jnp.concatenate([
            jnp.repeat(feats[:1], am.left_context, axis=0),
            feats,
            jnp.repeat(feats[-1:], am.right_context, axis=0),
        ])
        return am.forward_padded(padded)

    return jax.vmap(one)(wave)


def timed(label, fn, *a, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{label:28s} {dt * 1e3:8.1f} ms")
    return out


def stage_am():
    logp = am_forward(wave)
    logp_t = jnp.transpose(logp, (1, 0, 2))
    if planted_dev is not None:
        logp_t = planted_dev + 1e-3 * logp_t
    return logp_t


def stage_decode(logp_t):
    beam, init_trace = init_beam_batch(cfg, has_lm, batch, dfst, dlm)
    chunks = []
    for off in range(0, t_frames, chunk):
        n = min(chunk, t_frames - off)
        if n == chunk:
            lp = jax.lax.dynamic_slice_in_dim(logp_t, off, n, axis=0)
        else:
            lp = jnp.concatenate(
                [logp_t[off:off + n],
                 jnp.zeros((chunk - n, batch, logp_t.shape[2]),
                           jnp.float32)])
        valid = jnp.zeros((chunk, batch), bool).at[:n].set(True)
        beam, trace = decode_chunk(cfg, has_lm, dfst, dlm, beam, lp, valid)
        chunks.append(jax.tree.map(lambda x: x[:n], trace))
    return beam, init_trace, chunks


def stage_finish(beam, init_trace, chunks):
    traces = FrameTrace(
        jnp.concatenate([init_trace.prev_slot[None]]
                        + [c.prev_slot for c in chunks]),
        jnp.concatenate([init_trace.words[None]]
                        + [c.words for c in chunks]))
    total = beam.costs + jnp.where(
        beam.states >= 0, dfst.final[jnp.maximum(beam.states, 0)],
        jnp.inf)
    has_final = jnp.isfinite(total).any(axis=1)
    best_slots = jnp.where(has_final, jnp.argmin(total, axis=1),
                           jnp.argmin(beam.costs, axis=1)).astype(jnp.int32)
    return backtrace_device(traces, best_slots)


def stage_host(words, beam):
    return (np.asarray(words), np.asarray(beam.costs),
            np.asarray(beam.overflow), np.asarray(beam.hiwater))


# compile everything once
logp_t = stage_am()
beam, init_trace, chunks = stage_decode(logp_t)
words = stage_finish(beam, init_trace, chunks)
_ = stage_host(words, beam)

print(f"# batch={batch} x {seconds}s frames={t_frames} beam={cfg.beam_size} "
      f"expand={cfg.expand_size}")
logp_t = timed("am_forward+plant", stage_am)
beam, init_trace, chunks = timed("decode chunks (scan)", stage_decode, logp_t)
words = timed("trace concat+backtrace", stage_finish, beam, init_trace,
              chunks)
_ = timed("host transfer", stage_host, words, beam)

t0 = time.perf_counter()
logp_t = stage_am()
beam, init_trace, chunks = stage_decode(logp_t)
words = stage_finish(beam, init_trace, chunks)
out = stage_host(words, beam)
total = time.perf_counter() - t0
print(f"{'end-to-end':28s} {total * 1e3:8.1f} ms   "
      f"({batch * seconds / total:.1f} xRT)")
