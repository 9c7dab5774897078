"""Offline graph transforms that trade arcs for decode-loop rounds.

`close_epsilons` adds the min-plus transitive closure of the epsilon
subgraph as direct arcs (keeping the originals), so the device epsilon
closure provably completes in ONE relaxation round.  mkgraph HCLGs chain
epsilons word-end -> LM-history -> backoff-root (depth 2-3 per LM order);
each closure round costs two full beam-sized sorts per frame
(decode/beam._eps_closure), so collapsing the depth removes about half
the per-frame closure work for a few-percent arc-count increase.

The reference resolves the same chains dynamically with a worklist
(reference src/decoder.cc:240-292); a TPU decoder pays per ROUND, not per
arc, which makes the offline trade profitable.

Exactness: every epsilon path u => x with total weight w and at most one
non-epsilon output label o becomes a direct arc (u, x, eps, o, w), deduped
by (u, x, o) keeping the minimum weight.  Reachable (state, cost) sets and
transcripts are identical; only the number of relaxation rounds needed to
saturate them changes.  If any epsilon path carries two or more output
labels (not produced by mkgraph), or the epsilon subgraph has non-trivial
zero-weight cycles deeper than `max_rounds`, the transform bails and
returns the input unchanged.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from catears_tpu.graph.fst import FlatFst


def _dedup_min(src, dst, olab, wgt):
    """Keep the min-weight arc per (src, dst, olab); returns sorted-by-key."""
    order = np.lexsort((wgt, olab, dst, src))
    src, dst, olab, wgt = src[order], dst[order], olab[order], wgt[order]
    first = np.ones(src.size, bool)
    first[1:] = ((src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
                 | (olab[1:] != olab[:-1]))
    return src[first], dst[first], olab[first], wgt[first]


def close_epsilons(fst: FlatFst, max_rounds: int = 8,
                   growth_limit: float = 0.5) -> Tuple[FlatFst, bool]:
    """Epsilon-closure arcs for depth-1 relaxation.

    Returns (new_fst, ok).  ok=False (input returned) when closure cannot
    be represented (multi-olabel paths / no convergence / growth beyond
    `growth_limit` of the total arc count).
    """
    n = fst.num_states
    state_of_arc = np.repeat(np.arange(n, dtype=np.int64),
                             np.diff(fst.offsets))
    is_eps = fst.arc_ilabel == 0
    if not is_eps.any():
        return fst, True
    esrc = state_of_arc[is_eps]
    edst = fst.arc_next[is_eps].astype(np.int64)
    eolab = fst.arc_olabel[is_eps].astype(np.int64)
    ewgt = fst.arc_weight[is_eps].astype(np.float64)

    # CSR over the ORIGINAL eps arcs, for joining closure frontiers.
    order = np.argsort(esrc, kind="stable")
    j_src, j_dst = esrc[order], edst[order]
    j_olab, j_wgt = eolab[order], ewgt[order]
    eps_of = np.zeros(n + 1, np.int64)
    np.add.at(eps_of[1:], j_src, 1)
    np.cumsum(eps_of, out=eps_of)

    # Relative growth limit with an absolute floor so tiny graphs (where
    # closure can triple a handful of eps arcs) are never rejected.
    budget = max(int(fst.num_arcs * growth_limit), 4096)
    csrc, cdst, colab, cwgt = _dedup_min(esrc, edst, eolab, ewgt)
    for _ in range(max_rounds):
        # Join every closure arc u=>v with every original eps arc v->x.
        counts = eps_of[cdst + 1] - eps_of[cdst]
        has = counts > 0
        if not has.any():
            break
        rep = np.repeat(np.arange(csrc.size), counts)
        starts = np.repeat(eps_of[cdst], counts)
        seg0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(counts.sum()) - np.repeat(seg0, counts)
        vx = starts + within
        if np.any((colab[rep] != 0) & (j_olab[vx] != 0)):
            return fst, False  # a path would carry two output labels
        nsrc = csrc[rep]
        ndst = j_dst[vx]
        nolab = np.where(colab[rep] != 0, colab[rep], j_olab[vx])
        nwgt = cwgt[rep] + j_wgt[vx]
        m_src, m_dst, m_olab, m_wgt = _dedup_min(
            np.concatenate([csrc, nsrc]), np.concatenate([cdst, ndst]),
            np.concatenate([colab, nolab]), np.concatenate([cwgt, nwgt]))
        if m_src.size - esrc.size > budget:
            return fst, False
        converged = (m_src.size == csrc.size
                     and np.array_equal(m_src, csrc)
                     and np.array_equal(m_dst, cdst)
                     and np.array_equal(m_olab, colab)
                     and np.allclose(m_wgt, cwgt, rtol=0, atol=0))
        csrc, cdst, colab, cwgt = m_src, m_dst, m_olab, m_wgt
        if converged:
            break
    else:
        return fst, False  # did not converge within max_rounds

    keep = ~is_eps
    out = FlatFst.from_arrays(
        fst.start, fst.final,
        np.concatenate([state_of_arc[keep], csrc]),
        np.concatenate([fst.arc_next[keep].astype(np.int64), cdst]),
        np.concatenate([fst.arc_ilabel[keep].astype(np.int64),
                        np.zeros_like(csrc)]),
        np.concatenate([fst.arc_olabel[keep].astype(np.int64), colab]),
        np.concatenate([fst.arc_weight[keep].astype(np.float64),
                        cwgt]).astype(np.float32))
    return out, True
