"""Native C++ library tests: differential vs the Python implementations."""

import os

import numpy as np
import pytest

from catears_tpu.graph.fst import FlatFst
from catears_tpu.io.binfmt import write_pkfst
from catears_tpu.io.openfst import ConstFst, write_const_fst
from catears_tpu.io.wav import read_16k_pcm
from catears_tpu.tools.convert_fst import flat_to_raw
from catears_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeWav:
    def test_batch_load_matches_python(self, data_dir):
        paths = [os.path.join(data_dir, "en-us-hello.wav"),
                 os.path.join(data_dir, "en-us-cat.wav"),
                 os.path.join(data_dir, "en-us-hello.wav")]
        batch = native.load_wav_batch(paths, num_threads=2)
        assert batch is not None
        for path, wave in zip(paths, batch):
            np.testing.assert_array_equal(wave, read_16k_pcm(path))


class TestNativeConstFst:
    def test_parse_matches_python(self, data_dir, tmp_path):
        import io as _io
        fst = FlatFst.read(os.path.join(data_dir, "G.pfst"))
        counts = np.diff(fst.offsets).astype(np.int32)
        cf = ConstFst(start=fst.start, final=fst.final,
                      arc_pos=fst.offsets[:-1].astype(np.int64),
                      arc_count=counts, arc_ilabel=fst.arc_ilabel,
                      arc_olabel=fst.arc_olabel, arc_weight=fst.arc_weight,
                      arc_next=fst.arc_next)
        buf = _io.BytesIO()
        write_const_fst(buf, cf)
        parsed = native.parse_const_fst(buf.getvalue())
        assert parsed is not None
        start, final, pos, cnt, arcs = parsed
        assert start == fst.start
        np.testing.assert_array_equal(final, fst.final)
        np.testing.assert_array_equal(pos, fst.offsets[:-1])
        np.testing.assert_array_equal(cnt, counts)
        np.testing.assert_array_equal(arcs[:, 0], fst.arc_ilabel)
        np.testing.assert_array_equal(arcs[:, 1], fst.arc_olabel)
        np.testing.assert_array_equal(
            arcs[:, 2].view(np.float32), fst.arc_weight)
        np.testing.assert_array_equal(arcs[:, 3], fst.arc_next)


class TestNativeBacktrace:
    def test_matches_python(self):
        from catears_tpu.decode.hyp import HostTrace, backtrace
        rng = np.random.RandomState(0)
        t, k, w = 12, 8, 3
        prev = rng.randint(0, k, (t, k)).astype(np.int32)
        prev[0] = -1  # root frame
        words = np.where(rng.rand(t, k, w) < 0.3,
                         rng.randint(1, 50, (t, k, w)), 0).astype(np.int32)
        traces = [HostTrace(prev[f], words[f]) for f in range(t)]
        for slot in range(k):
            py = backtrace(traces, slot)
            nat = native.backtrace(prev, words, slot)
            assert nat == py


class TestNativeEditDistance:
    def test_matches_python(self):
        from catears_tpu.tools.score import edit_distance
        rng = np.random.RandomState(1)
        for _ in range(20):
            a = list(rng.randint(0, 5, rng.randint(0, 15)))
            b = list(rng.randint(0, 5, rng.randint(0, 15)))
            py = edit_distance([str(x) for x in a], [str(x) for x in b])[0]
            nat = native.edit_distance(a, b)
            assert nat == py
