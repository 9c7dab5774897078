"""TRUE marginal costs inside the production decode_chunk scan.

frameprof.py times a scan whose carry does not feed the frame output back
into the next frame's beam, so XLA hoists the loop-invariant big gathers
and UNDERSTATES expansion cost (~5.9 vs the real 7.4 ms/frame).  This
profiler instead times the real decode_chunk (100-frame scan, evolving
carry) under monkeypatched ablations; static shapes make the timing
data-independent, so semantically-wrong ablations still time correctly.

Run: python scripts/chunkprof.py
"""

import dataclasses
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
from catears_tpu.decode import beam as B

batch = int(os.environ.get("BENCH_BATCH", 16))
chunk = 100
am, fst, dfst, dlm, cfg, wave, planted, true_words = bench.build_bench_setup(
    batch, 10.0)
logp_t = jnp.asarray(np.transpose(planted, (1, 0, 2)))[:chunk]
valid = jnp.ones((chunk, batch), bool)
beam0, _ = B.init_beam_batch(cfg, False, batch, dfst, dlm)

orig_select = B._select_best
orig_ac = B._acoustic_lookup


def timed(label, dfst_v=dfst):
    fn = B.decode_chunk.__wrapped__  # un-jitted; re-jit per ablation
    run = jax.jit(lambda b, lp, fv: fn(cfg, False, dfst_v, None, b, lp, fv))
    out = run(beam0, logp_t, valid)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(beam0, logp_t, valid))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / chunk
    print(f"{label:24s} {ms:6.2f} ms/frame")
    return ms


def select_nodedup(cfg_, states, lms, costs, payloads, compact=False):
    """Ablate sort 1: prune sort only, no dedup."""
    k = cfg_.beam_size
    n = states.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    eff = jnp.where(states < B.SENTINEL_STATE, costs, B.INF)
    top_costs, top_iota = jax.lax.sort((eff, iota), num_keys=1)
    top_costs, top_iota = top_costs[:k], top_iota[:k]
    valid_ = jnp.isfinite(top_costs)
    cols = [states] + ([] if lms is None else [lms]) + list(payloads)
    payload = jnp.stack(cols, axis=1)[top_iota]
    lms_out = (jnp.zeros((k,), jnp.int32) if lms is None
               else jnp.where(valid_, payload[:, 1], 0))
    off = 1 if lms is None else 2
    return (((jnp.where(valid_, payload[:, 0], -1), lms_out,
              jnp.where(valid_, top_costs, B.INF))
             + tuple(payload[:, off + i] for i in range(len(payloads)))),
            jnp.bool_(False), jnp.int32(0))


def select_slice(cfg_, states, lms, costs, payloads, compact=False):
    """Ablate both sorts: first-K slice."""
    k = cfg_.beam_size
    lms_out = jnp.zeros((k,), jnp.int32) if lms is None else lms[:k]
    return ((states[:k], lms_out, costs[:k]) + tuple(
        p[:k] for p in payloads)), jnp.bool_(False), jnp.int32(0)


print(f"# batch={batch} beam={cfg.beam_size} expand={cfg.expand_size} "
      f"E={cfg.expand_size + cfg.beam_size * (dfst.group + 1)}")
base = timed("base")
B._select_best = select_nodedup
nodedup = timed("no dedup sort")
B._select_best = select_slice
noselect = timed("no sorts at all")
B._select_best = orig_select
B._acoustic_lookup = lambda logp, pdf: jnp.zeros(pdf.shape, jnp.float32)
noac = timed("no acoustic lookup")
B._acoustic_lookup = orig_ac
noB = timed("no CSR overflow pass",
            dataclasses.replace(dfst, max_emit_fanout=0))
print(f"marginals: dedup_sort={base - nodedup:.2f} "
      f"prune_sort={nodedup - noselect:.2f} acoustic={base - noac:.2f} "
      f"csr+sortwidth={base - noB:.2f}")
