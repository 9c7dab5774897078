"""Recognizer / Utterance runtime (ce_stt lifecycle parity).

Mirrors the reference public API semantics (reference src/ce_stt.h:40-76,
src/ce_stt.cc):

  Recognizer(config)       ~ ce_stt_init: loads HCLG, AM, symbol table,
                             optional big LM (keys `large_lm`+`original_lm`)
  recognizer.create_utterance(format) ~ ce_utt_init (am_scale 0.1 hardcoded
                             at src/ce_stt.cc:263)
  utt.process(bytes)       ~ ce_stt_process: bytes -> samples -> fbank ->
                             AM chunks -> decoder frames; partial hypothesis
                             refresh every 20 decoded frames
  utt.end_of_stream()      ~ ce_stt_end_of_stream
  utt.hyp, utt.loglikelihood_per_frame

Additions over the reference: optional online CMVN between fbank and the AM
(config key `cmvn_stats`; the reference shipped CMVN unwired), and batch
decoding across utterances (see catears_tpu.parallel).
"""

from __future__ import annotations

from typing import Optional

from catears_tpu.am.model import AcousticModel, AMStream
from catears_tpu.decode.beam import BeamConfig
from catears_tpu.decode.decoder import Decoder
from catears_tpu.frontend.cmvn import CMVNStream
from catears_tpu.frontend.fbank import Fbank, FbankStream
from catears_tpu.graph.fst import DeltaLmFst, FlatFst, LmFst
from catears_tpu.io.binfmt import read_vec0_file
from catears_tpu.io.config import Configuration
from catears_tpu.io.symbols import SymbolTable
from catears_tpu.io.wav import WaveFormat, WaveReader
from catears_tpu.utils import log
from catears_tpu.utils.errors import CorruptionError

AM_SCALE = 0.1  # hardcoded in the reference, src/ce_stt.cc:263
PARTIAL_HYP_INTERVAL = 20  # frames, src/ce_stt.cc:326-328


class Recognizer:
    def __init__(self, config_path: str,
                 beam_config: Optional[BeamConfig] = None):
        conf = Configuration.read(config_path)
        self.conf = conf
        self.fst = FlatFst.read(conf.get_path("fst"))
        self.am = AcousticModel.read(conf)
        self.symbol_table = SymbolTable.read(conf.get_path("symbol_table"))
        self.delta_lm = self._read_delta_lm(conf)
        self.cmvn_stats = None
        if conf.has("cmvn_stats"):
            self.cmvn_stats = read_vec0_file(conf.get_path("cmvn_stats"))
        self.fbank = Fbank()
        if beam_config is None:
            # Decoder geometry straight from the model config — the
            # deployment contract emitted by `python -m
            # catears_tpu.tools.tune` (one-call sizing; see
            # decode.decoder.autosize).  Unset keys keep BeamConfig
            # defaults.
            geo = {}
            for key in ("beam_size", "expand_size", "eps_expand_size",
                        "lm_expand_size", "select_compact",
                        "max_eps_iters"):
                if conf.has(key):
                    geo[key] = conf.get_int(key)
            if conf.has("beam"):
                geo["beam"] = conf.get_float("beam")
            beam_config = BeamConfig(am_scale=AM_SCALE, **geo)
        self.beam_config = beam_config
        # Arc-block width for the device graph layout (DeviceFst.group);
        # tune to the graph's typical emitting fanout.  csr_group widens
        # the overflow-CSR rows independently (0 = same as arc_group).
        self.arc_group = conf.get_int("arc_group", 4)
        self.csr_group = conf.get_int("csr_group", 0) or None

    def _read_delta_lm(self, conf: Configuration) -> Optional[DeltaLmFst]:
        large_lm_file = conf.get_path("large_lm", "")
        if not large_lm_file:
            return None
        original_lm_file = conf.get_path("original_lm", "")
        if not original_lm_file:
            raise CorruptionError(
                f"unable to find key 'original_lm' in {conf.filename}")
        small_lm = read_vec0_file(original_lm_file)
        lm = LmFst.read_lm(large_lm_file)
        return DeltaLmFst(small_lm, lm, self.symbol_table)

    def create_utterance(self, fmt: WaveFormat) -> "Utterance":
        return Utterance(self, fmt)

    def create_stream_batch(self, n_streams: int):
        """N concurrent live streams in one fused device program per
        chunk step (runtime.streaming.BatchStreamingSession) — the
        TPU-native production shape of the reference's streaming design
        center (src/ce_stt.cc:295-340)."""
        from catears_tpu.runtime.streaming import BatchStreamingSession

        cfg, dfst, dlm = self._decode_graph()
        return BatchStreamingSession(
            self.am, self.fst, self.delta_lm, cfg, dfst, dlm, n_streams,
            chunk_frames=PARTIAL_HYP_INTERVAL, cmvn_stats=self.cmvn_stats)

    def _decode_graph(self):
        """Cached (BeamConfig, DeviceFst, DeviceLm): the device graph is
        built once per Recognizer, not once per utterance."""
        cached = getattr(self, "_graph_cache", None)
        if cached is None:
            dec = Decoder(
                self.fst, self.am.tid2pdf, am_scale=AM_SCALE,
                delta_lm=self.delta_lm, config=self.beam_config,
                chunk_frames=PARTIAL_HYP_INTERVAL,
                arc_group=self.arc_group, csr_group=self.csr_group)
            cached = (dec.cfg, dec.dfst, dec.dlm)
            self._graph_cache = cached
        return cached


class Utterance:
    """One streaming decode session.

    Two execution paths with identical semantics:
      - fused (default): fbank+(CMVN)+AM+decode in one device program per
        20-frame chunk (runtime/streaming.py) — the low-latency path;
        online CMVN runs on device as a carried 600-frame ring buffer
      - componentized: FbankStream -> CMVNStream -> AMStream -> Decoder,
        used when fused=False
    """

    def __init__(self, recognizer: Recognizer, fmt: WaveFormat,
                 fused: bool = True):
        self.recognizer = recognizer
        self.wave_reader = WaveReader()
        self.wave_reader.set_format(fmt)
        self.cmvn_stream = None
        cfg, dfst, dlm = recognizer._decode_graph()
        self.decoder = Decoder(
            recognizer.fst, recognizer.am.tid2pdf, am_scale=AM_SCALE,
            delta_lm=recognizer.delta_lm, config=cfg,
            chunk_frames=PARTIAL_HYP_INTERVAL, dfst=dfst, dlm=dlm)
        self.session = None
        if fused:
            from catears_tpu.runtime.streaming import StreamingSession
            self.session = StreamingSession(
                recognizer.am, recognizer.fst, recognizer.delta_lm,
                self.decoder.cfg, self.decoder.dfst, self.decoder.dlm,
                chunk_frames=PARTIAL_HYP_INTERVAL,
                cmvn_stats=recognizer.cmvn_stats)
        else:
            if recognizer.cmvn_stats is not None:
                self.cmvn_stream = CMVNStream(recognizer.cmvn_stats)
            self.fbank_stream = FbankStream(recognizer.fbank)
            self.am_stream = AMStream(recognizer.am)
        self.hyp = ""
        self.loglikelihood_per_frame = 0.0
        self._last_partial_at = 0

    def process(self, data: bytes) -> int:
        """Feed raw PCM bytes; returns the number of samples consumed."""
        samples = self.wave_reader.process(data)
        if samples.size == 0:
            return 0
        log.count("audio_seconds", samples.size / 16000.0)
        if self.session is not None:
            with log.timed("process"):
                self.session.process(samples)
            decoded = self.session.num_frames_decoded
            if decoded - self._last_partial_at >= PARTIAL_HYP_INTERVAL:
                self._store_hyp(end_of_stream=False)
                self._last_partial_at = decoded
            return int(samples.size)
        with log.timed("frontend"):
            feats = self.fbank_stream.process(samples)
            if self.cmvn_stream is not None and feats.shape[0]:
                feats = self.cmvn_stream.process(feats)
        with log.timed("am"):
            logp = self.am_stream.process(feats)
        if logp.shape[0]:
            with log.timed("decode"):
                self.decoder.process(logp)
            decoded = self.decoder.num_frames_decoded
            if decoded - self._last_partial_at >= PARTIAL_HYP_INTERVAL:
                self._store_hyp(end_of_stream=False)
                self._last_partial_at = decoded
        return int(samples.size)

    def end_of_stream(self) -> None:
        if self.session is not None:
            self.session.end_of_stream()
            self._store_hyp(end_of_stream=True)
            return
        logp = self.am_stream.end_of_stream()
        if logp.shape[0]:
            self.decoder.process(logp)
        self.decoder.end_of_stream()
        self._store_hyp(end_of_stream=True)

    # -- session checkpoint/resume ----------------------------------------
    # The reference keeps resumable mid-utterance state in its Instance
    # objects (src/ce_stt.cc:53-60); here the whole session snapshots to
    # plain numpy structures (picklable), restorable into a fresh Utterance.

    def get_state(self) -> dict:
        import numpy as np

        state = {
            "wave_buffer": bytes(self.wave_reader._buffer),
            "cmvn_history": (self.cmvn_stream._history.copy()
                             if self.cmvn_stream is not None else None),
            "hyp": self.hyp,
            "llh_per_frame": self.loglikelihood_per_frame,
            "last_partial_at": self._last_partial_at,
        }
        if self.session is not None:
            s = self.session
            s._materialize()
            state["session"] = {
                "samples": s._samples.copy(),
                "consumed_frames": s._consumed_frames,
                "ctx": None if s._ctx is None else np.asarray(s._ctx),
                "beam": tuple(np.asarray(x) for x in s.beam),
                "cm": tuple(np.asarray(x) for x in s._cm),
                "traces": [(t.prev_slot.copy(), t.words.copy())
                           for t in s._host_traces],
                "num_frames_decoded": s.num_frames_decoded,
                "flushed": s._flushed,
            }
        else:
            state["fbank_buffer"] = self.fbank_stream._buffer.copy()
            state["am_buffer"] = (None if self.am_stream._buffer is None
                                  else self.am_stream._buffer.copy())
            state["am_started"] = self.am_stream._started
            state["decoder"] = self.decoder.get_state()
        return state

    def set_state(self, state: dict) -> None:
        import jax.numpy as jnp

        from catears_tpu.decode.beam import BeamState
        from catears_tpu.decode.hyp import HostTrace

        self.wave_reader._buffer = bytearray(state["wave_buffer"])
        if self.cmvn_stream is not None and state["cmvn_history"] is not None:
            self.cmvn_stream._history = state["cmvn_history"].copy()
        if self.session is not None:
            s = self.session
            ss = state["session"]
            s._samples = ss["samples"].copy()
            s._consumed_frames = ss["consumed_frames"]
            s._ctx = (None if ss["ctx"] is None else jnp.asarray(ss["ctx"]))
            s.beam = BeamState(*(jnp.asarray(x) for x in ss["beam"]))
            if "cm" in ss:
                s._cm = tuple(jnp.asarray(x) for x in ss["cm"])
            s._host_traces = [HostTrace(p, w) for p, w in ss["traces"]]
            s._dev_traces = []
            s.num_frames_decoded = ss["num_frames_decoded"]
            s._flushed = ss["flushed"]
            # The tracker memo indexes the restored trace list.
            from catears_tpu.decode.hyp import IncrementalBacktracker
            s._tracker = IncrementalBacktracker()
        else:
            self.fbank_stream._buffer = state["fbank_buffer"].copy()
            self.am_stream._buffer = (None if state["am_buffer"] is None
                                      else state["am_buffer"].copy())
            self.am_stream._started = state["am_started"]
            self.decoder.set_state(state["decoder"])
        self.hyp = state["hyp"]
        self.loglikelihood_per_frame = state["llh_per_frame"]
        self._last_partial_at = state["last_partial_at"]

    def _store_hyp(self, end_of_stream: bool) -> None:
        if self.session is not None:
            hyp = self.session.best_path(end_of_stream)
            frames = max(self.session.num_frames_decoded, 1)
        else:
            self.decoder.is_end_of_stream = end_of_stream
            hyp = self.decoder.best_path()
            frames = max(self.decoder.num_frames_decoded, 1)
        table = self.recognizer.symbol_table
        self.hyp = " ".join(table.get(w) for w in hyp.words)
        self.loglikelihood_per_frame = hyp.weight / frames


def decode_wav_file(recognizer: Recognizer, path: str,
                    chunk_bytes: int = 1024) -> str:
    """Decode one wav file streamed in fixed-size chunks (CLI parity)."""
    from catears_tpu.io.wav import read_pcm_header

    with open(path, "rb") as fd:
        fmt = read_pcm_header(fd)
        utt = recognizer.create_utterance(fmt)
        while True:
            chunk = fd.read(chunk_bytes)
            if not chunk:
                break
            utt.process(chunk)
    utt.end_of_stream()
    return utt.hyp
