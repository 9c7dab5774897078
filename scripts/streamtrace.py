"""Capture an xprof trace of ONE fused streaming chunk step (r4 weak #3).

The streaming latency numbers in BASELINE.md are tunnel-dominated; the
device-side claim (~45 ms per 200 ms chunk at the 50k-trie geometry) was
composed from micro-measurements.  This pins it with a single recorded
artifact: a jax.profiler trace around one steady-state fused chunk step
(fbank + TDNN + 20 decode frames in one program), written to
artifacts/stream_trace/ plus a one-line wall-time summary.

Run: python scripts/streamtrace.py   (~5 min incl. compile on a warm cache)
Env: TRACE_WORDS (50000), TRACE_DIR (artifacts/stream_trace).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/catears_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from catears_tpu.decode.beam import BeamConfig  # noqa: E402
from catears_tpu.io.wav import WaveFormat  # noqa: E402
from catears_tpu.runtime.recognizer import Recognizer  # noqa: E402
from catears_tpu.tools.biggraph import write_trie_model  # noqa: E402

WORDS = int(os.environ.get("TRACE_WORDS", 50000))
TRACE_DIR = os.environ.get(
    "TRACE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "artifacts",
                 "stream_trace"))


def main():
    import tempfile

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as model_dir:
        conf = write_trie_model(model_dir, rng, num_words=WORDS,
                                hidden=1024)
        cfg = BeamConfig(beam_size=2048, expand_size=32768,
                        eps_expand_size=8192, max_eps_iters=3)
        rec = Recognizer(conf, beam_config=cfg)
        utt = rec.create_utterance(WaveFormat(1, 16000, 16))
        pcm = (rng.randn(16000 * 4) * 1000).astype("<i2").tobytes()
        # Warm up past the first chunk so the traced step is the
        # steady-state program (compiled, context carried on device).
        chunk = 1024
        off = 0
        while utt.session.num_frames_decoded < 40:
            utt.process(pcm[off:off + chunk])
            off += chunk
        session = utt.session
        # One steady chunk = 20 frames = 200 ms of audio = 3200 samples.
        need = 3200
        steps0 = session.num_frames_decoded
        os.makedirs(TRACE_DIR, exist_ok=True)
        with jax.profiler.trace(TRACE_DIR):
            t0 = time.perf_counter()
            while session.num_frames_decoded < steps0 + 20:
                utt.process(pcm[off:off + chunk])
                off += chunk
            import jax.numpy as jnp
            jnp.asarray(session.beam.costs).block_until_ready()
            dt = time.perf_counter() - t0
        print(f"# traced ONE fused 20-frame chunk step: {dt * 1e3:.1f} ms "
              f"wall (incl. tunnel); trace in {TRACE_DIR}")
        # Repeat untraced for a cleaner wall-clock distribution.
        times = []
        for _ in range(10):
            steps0 = session.num_frames_decoded
            t0 = time.perf_counter()
            while session.num_frames_decoded < steps0 + 20:
                utt.process(pcm[off:off + chunk])
                off += chunk
                if off >= len(pcm):
                    break
            times.append(time.perf_counter() - t0)
            if off >= len(pcm):
                break
        ts = np.sort(np.asarray(times)) * 1e3
        print(f"# untraced chunk steps: p50 {ts[len(ts) // 2]:.1f} ms, "
              f"min {ts[0]:.1f} ms over {len(ts)} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
