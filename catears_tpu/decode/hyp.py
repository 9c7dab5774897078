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
    """One frame's trace for one utterance (numpy copies of FrameTrace)."""

    bp_ids: np.ndarray  # i32 [K]
    arena_parent: np.ndarray  # i32 [M]
    arena_olabel: np.ndarray  # i32 [M]


def backtrace(traces: List[HostTrace], slot: int) -> List[int]:
    """Follow the chain from `slot` in the last trace back to the root."""
    if not traces:
        return []
    words_rev: List[int] = []
    f = len(traces) - 1
    arena_id = int(traces[f].bp_ids[slot])
    guard = 0
    max_steps = sum(t.arena_parent.size for t in traces) + len(traces)
    while f >= 0:
        t = traces[f]
        olabel = int(t.arena_olabel[arena_id])
        if olabel > 0:
            words_rev.append(olabel)
        parent = int(t.arena_parent[arena_id])
        if parent >= 0:
            arena_id = parent  # same-frame chain (epsilon hop)
        else:
            prev_slot = -parent - 1
            f -= 1
            if f >= 0:
                arena_id = int(traces[f].bp_ids[prev_slot])
        guard += 1
        if guard > max_steps:
            raise RuntimeError("backtrace did not terminate (cyclic trace)")
    return words_rev[::-1]


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
