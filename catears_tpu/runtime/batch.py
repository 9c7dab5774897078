"""Batched (offline) decoding of .scp utterance lists.

This is the throughput path: utterances are loaded with the native threaded
WAV loader, featurized and run through the AM per utterance, then decoded
TOGETHER in one batched device beam search (data-parallel over beam slots).
The reference CLI decodes scp entries strictly one at a time
(src/main.cc:55-77); batching across utterances is the TPU-native win.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from catears_tpu.decode.decoder import decode_batch
from catears_tpu.frontend.cmvn import OnlineCMVN
from catears_tpu.io.wav import read_16k_pcm, read_scp
from catears_tpu.runtime.recognizer import Recognizer
from catears_tpu.utils import native


def load_waves(paths: List[str]) -> List[np.ndarray]:
    """Native threaded batch load, falling back to Python per-file reads."""
    batch = native.load_wav_batch(paths) if native.available() else None
    if batch is not None:
        return batch
    return [read_16k_pcm(p) for p in paths]


def decode_scp(recognizer: Recognizer, scp_path: str, batch_size: int = 16,
               chunk_frames: int = 50) -> List[Tuple[str, str]]:
    """Decode every `name path` entry; returns (name, hyp) pairs in order."""
    entries = read_scp(scp_path)
    results: List[Tuple[str, str]] = []
    cmvn = (OnlineCMVN(recognizer.cmvn_stats)
            if recognizer.cmvn_stats is not None else None)
    table = recognizer.symbol_table
    for lo in range(0, len(entries), batch_size):
        chunk = entries[lo:lo + batch_size]
        waves = load_waves([path for _, path in chunk])
        logps = []
        for wave in waves:
            feats = recognizer.fbank.compute(wave)
            if cmvn is not None:
                feats = cmvn.apply(feats)
            logps.append(recognizer.am.forward(feats))
        lengths = [lp.shape[0] for lp in logps]
        t_max = max(max(lengths), 1)
        p = logps[0].shape[1]
        packed = np.zeros((len(chunk), t_max, p), np.float32)
        for i, lp in enumerate(logps):
            packed[i, :lp.shape[0]] = lp
        hyps = decode_batch(recognizer.fst, recognizer.am.tid2pdf, packed,
                            lengths, delta_lm=recognizer.delta_lm,
                            config=recognizer.beam_config,
                            chunk_frames=chunk_frames)
        for (name, _), hyp in zip(chunk, hyps):
            results.append((name, " ".join(table.get(w) for w in hyp.words)))
    return results
