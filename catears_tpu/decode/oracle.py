"""Slow, obviously-correct reference Viterbi decoder (numpy + dicts).

Differential-testing oracle for the device beam search: identical semantics
(exact top-k + beam threshold + bounded epsilon closure + strict-improvement
dedup), implemented with hash maps like the reference C++ decoder
(reference src/decoder.cc).  With pruning disabled (large beam_size), both
must produce the same word sequence.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from catears_tpu.graph.fst import DeltaLmFst, FlatFst


@dataclass
class Hypothesis:
    words: List[int]
    weight: float


class OracleDecoder:
    def __init__(self, fst: FlatFst, tid2pdf: np.ndarray,
                 am_scale: float = 0.1, beam: float = 16.0,
                 beam_size: int = 10**9, max_eps_iters: int = 6,
                 delta_lm: Optional[DeltaLmFst] = None,
                 one_pass_eps: Optional[bool] = None):
        self.fst = fst
        self.tid2pdf = np.asarray(tid2pdf, np.int64)
        self.am_scale = am_scale
        self.beam = beam
        self.beam_size = beam_size
        self.max_eps_iters = max_eps_iters
        self.delta_lm = delta_lm
        if one_pass_eps is None:
            # Mirror Decoder's default dispatch: graphs that survive the
            # full offline epsilon pipeline decode with the device's
            # eps-free frame — relax the whole closure, prune ONCE at the
            # end of the frame.
            from catears_tpu.graph.transform import prepare_decode_graph
            one_pass_eps = prepare_decode_graph(fst)[2] == "eps_free"
        self.one_pass_eps = one_pass_eps
        # (hclg_state, lm_state) -> [cost, words_tuple]
        self.tokens: Dict[Tuple[int, int], Tuple[float, Tuple[int, ...]]] = {}
        self.num_frames_decoded = 0
        self.initialize()

    # -- helpers -----------------------------------------------------------

    def _lm_propagate(self, lm_state: int, olabel: int) -> Tuple[int, float]:
        if self.delta_lm is None or olabel == 0:
            return lm_state, 0.0
        hit = self.delta_lm.get_arc(lm_state, olabel)
        if hit is None:
            return lm_state, 0.0  # reference warns and keeps the state
        return hit

    def _sorted_items(self):
        return sorted(self.tokens.items(),
                      key=lambda kv: (kv[1][0], kv[0][0], kv[0][1]))

    def _truncate(self, apply_beam: bool):
        """Exact top-K by (cost, state, lm), optionally + beam threshold.

        The device decoder applies the beam threshold once after the emitting
        top-k; epsilon-closure iterations only re-top-k the merged beam (the
        fixed emitting cutoff already filters closure candidates).
        """
        if not self.tokens:
            return
        items = self._sorted_items()
        kept = items[:self.beam_size]
        if apply_beam:
            cutoff = items[0][1][0] + self.beam
            kept = [(k, v) for k, v in kept if v[0] <= cutoff]
        self.tokens = dict(kept)

    def _eps_closure(self, cutoff: float, truncate: bool = True) -> None:
        for _ in range(self.max_eps_iters):
            accepted = False
            for (state, lm_state), (cost, words) in self._sorted_items():
                lo, hi = self.fst.arc_range(state)
                n_eps = self.fst.num_eps(state)
                for a in range(lo, lo + n_eps):
                    olabel = int(self.fst.arc_olabel[a])
                    total = cost + float(self.fst.arc_weight[a])
                    lm2, lm_w = self._lm_propagate(lm_state, olabel)
                    total += lm_w
                    if total > cutoff:
                        continue
                    key = (int(self.fst.arc_next[a]), lm2)
                    new_words = words + (olabel,) if olabel else words
                    if key not in self.tokens or total < self.tokens[key][0]:
                        self.tokens[key] = (total, new_words)
                        accepted = True
            if not accepted:
                break
            if truncate:
                self._truncate(apply_beam=False)

    # -- public API --------------------------------------------------------

    def initialize(self) -> None:
        lm_start = (self.delta_lm.start_state()
                    if self.delta_lm is not None else 0)
        self.tokens = {(self.fst.start, lm_start): (0.0, ())}
        self.num_frames_decoded = 0
        self._eps_closure(math.inf)

    def process(self, logp: np.ndarray) -> bool:
        """One frame of pdf log-probs; returns False when the beam dies.

        On death the previous beam is kept (frozen) so best_path still
        returns the last valid partial hypothesis — matching the device
        decoder's freeze semantics.
        """
        if getattr(self, "dead", False):
            return False
        prev = self._sorted_items()
        self.tokens = {}
        for (state, lm_state), (cost, words) in prev:
            lo, hi = self.fst.arc_range(state)
            n_eps = self.fst.num_eps(state)
            for a in range(lo + n_eps, hi):
                ilabel = int(self.fst.arc_ilabel[a])
                pdf = int(self.tid2pdf[ilabel])
                ac = -self.am_scale * float(logp[pdf])
                total = cost + float(self.fst.arc_weight[a]) + ac
                olabel = int(self.fst.arc_olabel[a])
                lm2, lm_w = self._lm_propagate(lm_state, olabel)
                total += lm_w
                key = (int(self.fst.arc_next[a]), lm2)
                new_words = words + (olabel,) if olabel else words
                if key not in self.tokens or total < self.tokens[key][0]:
                    self.tokens[key] = (total, new_words)
        if not self.tokens:
            self.tokens = dict(prev)  # freeze the last valid beam
            self.dead = True
            return False
        if self.one_pass_eps:
            # Device one-pass semantics: relax the full epsilon closure
            # from the UNPRUNED emitting relaxation (dict dedup makes
            # from-all-candidates == from-winners), then prune exactly
            # once over the union.
            self._eps_closure(math.inf, truncate=False)
            self._truncate(apply_beam=True)
        else:
            self._truncate(apply_beam=True)
            best = min(v[0] for v in self.tokens.values())
            self._eps_closure(best + self.beam)
        self.num_frames_decoded += 1
        return bool(self.tokens)

    def best_path(self, end_of_stream: bool = True) -> Hypothesis:
        best_key, best_cost = None, math.inf
        for (state, lm_state), (cost, _) in self.tokens.items():
            total = cost
            if end_of_stream:
                total += self.fst.final_weight(state)
                if self.delta_lm is not None:
                    total += self.delta_lm.final(lm_state)
            if math.isfinite(total) and total < best_cost:
                best_cost = total
                best_key = (state, lm_state)
        if best_key is None:
            return Hypothesis([], 0.0)
        return Hypothesis(list(self.tokens[best_key][1]), best_cost)
