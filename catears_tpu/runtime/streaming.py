"""Fused low-latency streaming session: one device dispatch per frame chunk.

The componentized streaming path (FbankStream -> AMStream -> Decoder) is
semantically exact but pays a host<->device round trip per stage per call —
fatal for real-time use through a remote device.  This session fuses
fbank + TDNN forward + beam search for a fixed F-frame chunk into ONE jit
program, carrying the AM context window and the beam entirely on device:

  step(samples_window, ctx, beam) -> (ctx', beam', trace)

Semantics are identical to the unfused path (same replicate padding, same
AM emission lag of right_context frames, same decoder) — enforced by
equivalence tests in tests/test_streaming.py.  End-of-stream and
shorter-than-one-chunk utterances flush through the host path.

Used by Utterance automatically when online CMVN is not configured (CMVN's
float64 host accumulation keeps the componentized path).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from catears_tpu.am.model import AcousticModel
from catears_tpu.decode.beam import BeamConfig, decode_chunk, init_beam_batch
from catears_tpu.decode.hyp import HostTrace, best_path
from catears_tpu.decode.oracle import Hypothesis
from catears_tpu.frontend.fbank import (
    FRAME_LENGTH,
    FRAME_SHIFT,
    fbank_from_wave,
    num_frames,
)
from catears_tpu.graph.device import DeviceFst, DeviceLm
from catears_tpu.graph.fst import DeltaLmFst, FlatFst
from catears_tpu.utils import log


def _am_apply(nnet_def, quantized, params, log_prior, window):
    if quantized:
        from catears_tpu.am.quant import nnet_forward_quant
        return nnet_forward_quant(nnet_def, params, window) - log_prior
    from catears_tpu.am.nnet import nnet_forward
    return nnet_forward(nnet_def, params, window) - log_prior


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _fused_first(nnet_def, cfg: BeamConfig, has_lm: bool, quantized: bool,
                 n_frames: int, left: int, ctx_len: int,
                 params, log_prior, dfst, dlm, beam, samples):
    """First chunk: fbank -> left replicate pad -> AM -> decode."""
    feats = fbank_from_wave(samples, n_frames)  # [F + R, 40]
    window = jnp.concatenate([jnp.repeat(feats[:1], left, axis=0), feats])
    logp = _am_apply(nnet_def, quantized, params, log_prior, window)
    valid = jnp.ones((logp.shape[0], 1), bool)
    beam, trace = decode_chunk(cfg, has_lm, dfst, dlm, beam,
                               logp[:, None, :], valid)
    return window[-ctx_len:], beam, trace


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _fused_steady(nnet_def, cfg: BeamConfig, has_lm: bool, quantized: bool,
                  n_frames: int, params, log_prior, dfst, dlm, ctx, beam,
                  samples):
    """Steady chunk: fbank -> concat carried context -> AM -> decode."""
    feats = fbank_from_wave(samples, n_frames)  # [F, 40]
    window = jnp.concatenate([ctx, feats])
    logp = _am_apply(nnet_def, quantized, params, log_prior, window)
    valid = jnp.ones((logp.shape[0], 1), bool)
    beam, trace = decode_chunk(cfg, has_lm, dfst, dlm, beam,
                               logp[:, None, :], valid)
    return window[-ctx.shape[0]:], beam, trace


@functools.partial(jax.jit, static_argnums=(0, 1))
def _am_only(nnet_def, quantized, params, log_prior, window):
    return _am_apply(nnet_def, quantized, params, log_prior, window)


class StreamingSession:
    """Device-resident streaming decode for one utterance."""

    def __init__(self, am: AcousticModel, fst: FlatFst,
                 delta_lm: Optional[DeltaLmFst], cfg: BeamConfig,
                 dfst: DeviceFst, dlm: Optional[DeviceLm],
                 chunk_frames: int = 20):
        self.am = am
        self.fst = fst
        self.delta_lm = delta_lm
        self.cfg = cfg
        self.dfst = dfst
        self.dlm = dlm
        self.has_lm = dlm is not None
        self.f = chunk_frames
        self.l = am.left_context
        self.r = am.right_context
        self._samples = np.zeros(0, np.float32)
        self._consumed_frames = 0  # feats computed by fused steps
        self._ctx = None  # device [L+R, 40] after the first step
        beam, init_trace = init_beam_batch(cfg, self.has_lm, 1, dfst, dlm)
        self.beam = beam
        self._host_traces: List[HostTrace] = [
            HostTrace(np.asarray(init_trace.prev_slot[0]),
                      np.asarray(init_trace.words[0]))
        ]
        self._dev_traces = []  # stacked [F, 1, ...] chunk traces
        self.num_frames_decoded = 0
        self._flushed = False

    # -- internals ---------------------------------------------------------

    def _available_frames(self) -> int:
        return num_frames(self._samples.shape[0])

    def _next_window_frames(self) -> int:
        return self.f + self.r if self._ctx is None else self.f

    def _run_step(self) -> None:
        n_frames = self._next_window_frames()
        start = self._consumed_frames * FRAME_SHIFT
        end = start + FRAME_LENGTH + FRAME_SHIFT * (n_frames - 1)
        samples = jnp.asarray(self._samples[start:end])
        ctx_len = self.l + self.r
        if self._ctx is None:
            self._ctx, self.beam, trace = _fused_first(
                self.am.nnet_def, self.cfg, self.has_lm, self.am.quantized,
                n_frames, self.l, ctx_len, self.am.params, self.am.log_prior,
                self.dfst, self.dlm, self.beam, samples)
        else:
            self._ctx, self.beam, trace = _fused_steady(
                self.am.nnet_def, self.cfg, self.has_lm, self.am.quantized,
                n_frames, self.am.params, self.am.log_prior, self.dfst,
                self.dlm, self._ctx, self.beam, samples)
        self._consumed_frames += n_frames
        self.num_frames_decoded += self.f
        log.count("frames_decoded", self.f)
        self._dev_traces.append((trace, self.f))

    def process(self, samples: np.ndarray) -> None:
        if self._flushed:
            return
        if samples.size:
            self._samples = np.concatenate(
                [self._samples, samples.astype(np.float32)])
        while (self._available_frames()
               >= self._consumed_frames + self._next_window_frames()):
            self._run_step()

    def end_of_stream(self) -> None:
        """Flush remaining feats through the host AM path (exact padding)."""
        if self._flushed:
            return
        self._flushed = True
        total = self._available_frames()
        t_extra = total - self._consumed_frames
        if self._ctx is None:
            # Never filled one chunk: whole-utterance host path
            if total == 0:
                return
            feats = np.asarray(fbank_from_wave(jnp.asarray(self._samples),
                                               total))
            logp = self.am.forward(feats)
        else:
            ctx = np.asarray(self._ctx)  # [L+R, 40]
            if t_extra > 0:
                start = self._consumed_frames * FRAME_SHIFT
                feats_extra = np.asarray(fbank_from_wave(
                    jnp.asarray(self._samples[start:]), t_extra))
                window = np.concatenate([ctx, feats_extra])
            else:
                window = ctx
            window = np.concatenate(
                [window, np.repeat(window[-1:], self.r, axis=0)])
            # AM emits len - L - R = t_extra + R rows (the held-back tail)
            logp = np.asarray(_am_only(self.am.nnet_def, self.am.quantized,
                                       self.am.params, self.am.log_prior,
                                       jnp.asarray(window, jnp.float32)))
        self._decode_host(np.asarray(logp))

    def _decode_host(self, logp: np.ndarray) -> None:
        if logp.shape[0] == 0:
            return
        f = self.f
        n = logp.shape[0]
        n_pad = -(-n // f) * f
        lp = np.zeros((n_pad, 1, logp.shape[1]), np.float32)
        lp[:n, 0] = logp
        valid = np.zeros((n_pad, 1), bool)
        valid[:n] = True
        for off in range(0, n_pad, f):
            self.beam, trace = decode_chunk(
                self.cfg, self.has_lm, self.dfst, self.dlm, self.beam,
                jnp.asarray(lp[off:off + f]), jnp.asarray(valid[off:off + f]))
            n_valid = int(valid[off:off + f].sum())
            self._dev_traces.append((trace, n_valid))
            self.num_frames_decoded += n_valid
            log.count("frames_decoded", n_valid)

    def _materialize(self) -> None:
        for trace, n_valid in self._dev_traces:
            prev = np.asarray(trace.prev_slot)  # [F, 1, K]
            words = np.asarray(trace.words)
            self._host_traces.extend(
                HostTrace(prev[i, 0], words[i, 0]) for i in range(n_valid))
        self._dev_traces = []

    @property
    def overflowed(self) -> bool:
        """True if any frame's arc expansion truncated (result suspect)."""
        return bool(np.asarray(self.beam.overflow)[0])

    def best_path(self, end_of_stream: bool) -> Hypothesis:
        if self.overflowed:
            from catears_tpu.utils.errors import BeamCapacityError
            raise BeamCapacityError(
                f"arc expansion overflowed capacity (expand_size="
                f"{self.cfg.expand_size}, eps_expand_size="
                f"{self.cfg.eps_expand_size}) after "
                f"{self.num_frames_decoded} frames")
        self._materialize()
        states = np.asarray(self.beam.states[0])
        lms = np.asarray(self.beam.lm[0])
        costs = np.asarray(self.beam.costs[0])
        return best_path(self._host_traces, states, lms, costs, self.fst,
                         self.delta_lm, end_of_stream=end_of_stream)
