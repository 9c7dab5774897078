"""Graph layer tests: LmFst backoff walks and DeltaLmFst rescoring.

Golden sentence scores mirror reference test/fst_test.cc:153-210 (computed on
the same G.pfst / lm.words.txt / lm.1order.bin fixtures).
"""

import os

import numpy as np
import pytest

from catears_tpu.io.binfmt import read_vec0_file
from catears_tpu.graph.fst import DeltaLmFst, FlatFst, LmFst
from catears_tpu.io.symbols import SymbolTable


@pytest.fixture(scope="module")
def lm_fst(data_dir):
    return LmFst.read_lm(os.path.join(data_dir, "G.pfst"))


@pytest.fixture(scope="module")
def symbols(data_dir):
    return SymbolTable.read(os.path.join(data_dir, "lm.words.txt"))


def lm_score(lm: LmFst, table: SymbolTable, query: str) -> float:
    """Sentence log-prob via BOS + words + EOS + final, as in the reference."""
    state = lm.start
    score = 0.0
    hit = lm.get_arc_backoff(state, table.bos_id)
    assert hit is not None
    state, w = hit
    score += w
    for word in query.split():
        wid = table.get_id(word)
        assert wid != -1, word
        hit = lm.get_arc_backoff(state, wid)
        assert hit is not None, word
        state, w = hit
        score += w
    hit = lm.get_arc_backoff(state, table.eos_id)
    assert hit is not None
    state, w = hit
    score += w
    score += lm.final_backoff(state)
    return -score


def delta_lm_score(delta: DeltaLmFst, table: SymbolTable, query: str) -> float:
    state = delta.start_state()
    score = 0.0
    for word in query.split():
        wid = table.get_id(word)
        hit = delta.get_arc(state, wid)
        assert hit is not None, word
        state, w = hit
        score += w
    return score + delta.final(state)


GOLDEN_LM = [
    (-38.767048, "marisa runs the kirisame magic shop"),
    (-28.481011, "reimu and marisa are friends"),
    (-62.663559, "reimu and marisa are playable characters in the games of touhou"),
    (-6.2797366, "marisa"),
]

GOLDEN_DELTA = [
    (0.886695, "marisa runs the kirisame magic shop"),
    (-1.433023, "reimu and marisa are friends"),
    (-0.688201, "reimu and marisa are playable characters in the games of touhou"),
    (-0.510554, "marisa"),
]


class TestLmFst:
    @pytest.mark.parametrize("expected,query", GOLDEN_LM)
    def test_sentence_scores(self, lm_fst, symbols, expected, query):
        assert abs(lm_score(lm_fst, symbols, query) - expected) < 1e-4

    def test_backoff_miss_returns_none(self, lm_fst):
        # ilabel far beyond vocab: no arc anywhere along the backoff chain
        assert lm_fst.get_arc_backoff(lm_fst.start, 10**6) is None


class TestDeltaLmFst:
    @pytest.mark.parametrize("expected,query", GOLDEN_DELTA)
    def test_delta_scores(self, data_dir, lm_fst, symbols, expected, query):
        small_lm = read_vec0_file(os.path.join(data_dir, "lm.1order.bin"))
        delta = DeltaLmFst(small_lm, lm_fst, symbols)
        assert abs(delta_lm_score(delta, symbols, query) - expected) < 1e-4


class TestFlatFstConversions:
    def test_const_fst_matches_pkfst(self, data_dir):
        """The same graph through both loaders must behave identically."""
        pk = FlatFst.read(os.path.join(data_dir, "G.pfst"))
        # Re-export as ConstFst and reload
        import io as _io

        from catears_tpu.io.openfst import ConstFst, read_const_fst, write_const_fst
        counts = np.diff(pk.offsets).astype(np.int32)
        cf = ConstFst(start=pk.start, final=pk.final,
                      arc_pos=pk.offsets[:-1].astype(np.int64),
                      arc_count=counts, arc_ilabel=pk.arc_ilabel,
                      arc_olabel=pk.arc_olabel, arc_weight=pk.arc_weight,
                      arc_next=pk.arc_next)
        buf = _io.BytesIO()
        write_const_fst(buf, cf)
        buf.seek(0)
        back = FlatFst.from_const_fst(read_const_fst(buf))
        assert back.start == pk.start
        np.testing.assert_array_equal(back.final, pk.final)
        np.testing.assert_array_equal(back.offsets, pk.offsets)
        np.testing.assert_array_equal(back.arc_ilabel, pk.arc_ilabel)
        np.testing.assert_array_equal(back.arc_next, pk.arc_next)
