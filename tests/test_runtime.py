"""End-to-end runtime tests: wav bytes -> hypothesis through the full stack.

The reference ships no acoustic model, so E2E uses the synthetic toy model:
real 16 kHz audio -> fbank -> toy TDNN AM -> phone-loop WFST decode.  The
E2E oracle check runs the same features/logp through the numpy oracle
decoder and requires an identical transcript.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from catears_tpu.decode.beam import BeamConfig
from catears_tpu.decode.oracle import OracleDecoder
from catears_tpu.frontend.fbank import Fbank
from catears_tpu.graph.fst import FlatFst
from catears_tpu.io.wav import WaveFormat, read_16k_pcm, read_pcm_header
from catears_tpu.runtime import capi
from catears_tpu.runtime.recognizer import Recognizer, decode_wav_file
from catears_tpu.tools.toy import write_toy_model

TEST_BEAM = BeamConfig(beam_size=256, expand_size=2048, eps_expand_size=1024,
                       max_eps_iters=6, beam=1e9, am_scale=0.1)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("e2e_model")
    write_toy_model(str(out), num_words=5, hidden=32, num_pdfs=24)
    return str(out)


@pytest.fixture(scope="module")
def recognizer(model_dir):
    return Recognizer(os.path.join(model_dir, "toy.conf"),
                      beam_config=TEST_BEAM)


class TestEndToEnd:
    def test_wav_to_hyp_matches_oracle(self, recognizer, data_dir):
        wav_path = os.path.join(data_dir, "en-us-hello.wav")
        hyp = decode_wav_file(recognizer, wav_path)

        # Oracle pipeline: batch fbank -> batch AM -> oracle decode
        wave = read_16k_pcm(wav_path)
        feats = Fbank().compute(wave)
        logp = recognizer.am.forward(feats)
        oracle = OracleDecoder(recognizer.fst, recognizer.am.tid2pdf,
                               am_scale=0.1, beam=1e9)
        for row in logp:
            oracle.process(row)
        expected = " ".join(recognizer.symbol_table.get(w)
                            for w in oracle.best_path().words)
        assert hyp == expected
        assert len(hyp) > 0

    def test_streaming_chunk_sizes_agree(self, recognizer, data_dir):
        """Byte chunking must not change the transcript."""
        wav_path = os.path.join(data_dir, "en-us-cat.wav")
        h1 = decode_wav_file(recognizer, wav_path, chunk_bytes=1024)
        h2 = decode_wav_file(recognizer, wav_path, chunk_bytes=313)
        assert h1 == h2

    def test_capi_wrappers(self, model_dir, data_dir):
        rec = capi.ce_stt_init(os.path.join(model_dir, "toy.conf"))
        assert rec is not None
        wav_path = os.path.join(data_dir, "en-us-hello.wav")
        with open(wav_path, "rb") as fd:
            fmt = capi.ce_read_pcm_header(fd)
            assert fmt is not None
            utt = capi.ce_utt_init(rec, fmt)
            assert utt is not None
            while True:
                chunk = fd.read(1024)
                if not chunk:
                    break
                assert capi.ce_stt_process(utt, chunk) != capi.CE_STT_FAILED
        capi.ce_stt_end_of_stream(utt)
        assert isinstance(utt.hyp, str)
        assert utt.loglikelihood_per_frame != 0.0

    def test_capi_error_path(self):
        assert capi.ce_stt_init("/nonexistent/config") is None
        assert "nonexistent" in capi.ce_stt_last_error()


class TestCli:
    def test_cli_wav_and_scp(self, model_dir, data_dir, tmp_path):
        scp = tmp_path / "test.scp"
        scp.write_text(
            f"hello {os.path.join(data_dir, 'en-us-hello.wav')}\n"
            f"cat {os.path.join(data_dir, 'en-us-cat.wav')}\n")
        env = dict(os.environ, JAX_PLATFORMS="")
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "import catears_tpu.cli as c, sys;"
             f"sys.exit(c.main(['{model_dir}/toy.conf', '{scp}']))"],
            capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, out.stderr
        lines = out.stdout.strip().splitlines()
        assert len(lines) == 2
        assert lines[0].startswith("hello ")
        assert lines[1].startswith("cat ")


class TestBatchScp:
    def test_batched_scp_matches_streaming(self, recognizer, model_dir,
                                           data_dir, tmp_path):
        """Batched multi-utterance decode == one-by-one streaming decode."""
        from catears_tpu.runtime.batch import decode_scp
        scp = tmp_path / "b.scp"
        hello = os.path.join(data_dir, "en-us-hello.wav")
        cat = os.path.join(data_dir, "en-us-cat.wav")
        scp.write_text(f"u1 {hello}\nu2 {cat}\nu3 {hello}\n")
        batched = decode_scp(recognizer, str(scp), batch_size=3)
        assert [n for n, _ in batched] == ["u1", "u2", "u3"]
        expected = {
            "u1": decode_wav_file(recognizer, hello),
            "u2": decode_wav_file(recognizer, cat),
        }
        assert dict(batched)["u1"] == expected["u1"]
        assert dict(batched)["u2"] == expected["u2"]
        assert dict(batched)["u3"] == expected["u1"]


class TestSessionCheckpoint:
    def test_snapshot_and_resume(self, recognizer, data_dir):
        """Mid-utterance state snapshot restores into a fresh utterance."""
        import pickle

        from catears_tpu.io.wav import read_pcm_header
        wav_path = os.path.join(data_dir, "en-us-hello.wav")
        with open(wav_path, "rb") as fd:
            fmt = read_pcm_header(fd)
            payload = fd.read()
        half = len(payload) // 2

        # Uninterrupted decode
        utt_ref = recognizer.create_utterance(fmt)
        utt_ref.process(payload[:half])
        utt_ref.process(payload[half:])
        utt_ref.end_of_stream()

        # Decode first half, snapshot (through pickle), resume elsewhere
        utt_a = recognizer.create_utterance(fmt)
        utt_a.process(payload[:half])
        blob = pickle.dumps(utt_a.get_state())

        utt_b = recognizer.create_utterance(fmt)
        utt_b.set_state(pickle.loads(blob))
        utt_b.process(payload[half:])
        utt_b.end_of_stream()
        assert utt_b.hyp == utt_ref.hyp


class TestObservability:
    def test_metrics_counters_move(self, recognizer, data_dir):
        """The runtime counts audio seconds / decoded frames and stage time
        (reference exposes only loglikelihood_per_frame; SURVEY.md §5)."""
        from catears_tpu.utils import log

        log.reset_metrics()
        decode_wav_file(recognizer, os.path.join(data_dir, "en-us-hello.wav"))
        m = log.metrics()
        assert m["audio_seconds"] > 0.3
        assert m["frames_decoded"] >= 40
        assert m.get("process_seconds", 0) + m.get("decode_seconds", 0) > 0
