"""Host-side backtrace of device backpointer traces -> word sequences.

Replaces the reference's OLabel linked lists in a mark-and-sweep pool
(reference src/decoder.h:237-268, src/pool.h): the device emits a per-frame
backpointer arena; the host walks it backwards from the best final slot.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from catears_tpu.decode.oracle import Hypothesis
from catears_tpu.graph.fst import DeltaLmFst, FlatFst


@dataclass
class HostTrace:
    """One frame's compact trace for one utterance (numpy FrameTrace)."""

    prev_slot: np.ndarray  # i32 [K]
    words: np.ndarray  # i32 [K, W] newest-first, 0-padded


def backtrace(traces: List[HostTrace], slot: int) -> List[int]:
    """Follow prev_slot links from `slot` in the last trace to the root."""
    if not traces:
        return []
    if len(traces) >= 64:
        # Long utterances: the native C++ walker beats the per-frame Python
        # loop once stacking the traces is amortized.
        from catears_tpu.utils import native
        if native.available():
            prev = np.stack([t.prev_slot for t in traces])
            words = np.stack([t.words for t in traces])
            out = native.backtrace(prev, words, slot)
            if out is not None:
                return out
    words_rev: List[int] = []
    cur = slot
    for f in range(len(traces) - 1, -1, -1):
        t = traces[f]
        for w in t.words[cur]:
            if w > 0:
                words_rev.append(int(w))
        cur = int(t.prev_slot[cur])
        if cur < 0:
            break
    return words_rev[::-1]


def assemble_words(frame_words: np.ndarray) -> List[int]:
    """[T, W] device-backtrace output -> transcript word-id list.

    Each frame's W slots are newest-first, so the forward transcript walks
    frames in order and reverses within each frame.
    """
    out: List[int] = []
    for row in frame_words:
        out.extend(int(w) for w in row[::-1] if w > 0)
    return out


def best_path(
    traces: List[HostTrace],
    states: np.ndarray,  # i32 [K] final beam HCLG states
    lm_states: np.ndarray,  # i32 [K]
    costs: np.ndarray,  # f32 [K]
    fst: FlatFst,
    delta_lm: Optional[DeltaLmFst] = None,
    end_of_stream: bool = True,
) -> Hypothesis:
    """Pick the best final token and backtrace it (Decoder::BestPath)."""
    total = costs.astype(np.float64).copy()
    if end_of_stream:
        valid = states >= 0
        idx = np.where(valid, states, 0)
        total += np.where(valid, fst.final[idx], np.inf)
        if delta_lm is not None:
            for i in np.nonzero(valid & np.isfinite(total))[0]:
                total[i] += delta_lm.final(int(lm_states[i]))
    total[states < 0] = np.inf
    if not np.isfinite(total).any():
        return Hypothesis([], 0.0)
    best_slot = int(np.argmin(total))
    words = backtrace(traces, best_slot)
    return Hypothesis(words, float(total[best_slot]))
