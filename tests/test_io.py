"""IO layer tests: config, binary formats, wav, symbols, ConstFst."""

import io
import os

import numpy as np
import pytest

from catears_tpu.io import binfmt, openfst
from catears_tpu.io.config import Configuration
from catears_tpu.io.symbols import SymbolTable
from catears_tpu.io.wav import (
    WaveFormat,
    WaveReader,
    read_16k_pcm,
    read_pcm_header,
)
from catears_tpu.utils.errors import CorruptionError


class TestConfiguration:
    def test_parse_and_relative_path(self, data_dir):
        # Mirrors reference test/configuration_test.cc: relative paths resolve
        # against the config file's own directory.
        conf = Configuration.read(os.path.join(data_dir, "test.conf"))
        assert conf.get_int("int_val") == 1
        path = conf.get_path("testconf")  # keys are lowercased
        assert path == os.path.join(data_dir, "test_conf.txt")
        with open(path) as fd:
            assert fd.read().strip() == "Success!"

    def test_defaults_and_missing(self, data_dir):
        conf = Configuration.read(os.path.join(data_dir, "test.conf"))
        assert conf.get_string("nokey", "fallback") == "fallback"
        assert conf.get_int("nokey", 22) == 22
        with pytest.raises(CorruptionError):
            conf.get_string("nokey")


class TestVec0Mat0:
    def test_vec0_roundtrip(self):
        for dtype in (np.float32, np.int32, np.uint8):
            vec = (np.random.RandomState(3).rand(17) * 100).astype(dtype)
            buf = io.BytesIO()
            binfmt.write_vec0(buf, vec)
            buf.seek(0)
            out = binfmt.read_vec0(buf, dtype)
            np.testing.assert_array_equal(vec, out)

    def test_mat0_roundtrip(self):
        mat = np.random.RandomState(5).randn(7, 13).astype(np.float32)
        buf = io.BytesIO()
        binfmt.write_mat0(buf, mat)
        buf.seek(0)
        out = binfmt.read_mat0(buf)
        np.testing.assert_array_equal(mat, out)

    def test_real_cmvn_stats_fixture(self, data_dir):
        stats = binfmt.read_vec0_file(os.path.join(data_dir, "cmvn_stats.bin"))
        assert stats.shape == (41,)
        assert stats[40] > 0  # frame count

    def test_bad_magic(self):
        buf = io.BytesIO(b"XXXX" + b"\x00" * 16)
        with pytest.raises(CorruptionError):
            binfmt.read_vec0(buf)


class TestNnetFormat:
    def test_roundtrip(self):
        rng = np.random.RandomState(7)
        spec = binfmt.NnetSpec(left_context=2, right_context=1, layers=[
            binfmt.LayerSpec(binfmt.LAYER_SPLICE, indices=(-1, 0, 1)),
            binfmt.LayerSpec(binfmt.LAYER_LINEAR,
                             weight=rng.randn(120, 64).astype(np.float32),
                             bias=rng.randn(64).astype(np.float32)),
            binfmt.LayerSpec(binfmt.LAYER_RELU),
            binfmt.LayerSpec(binfmt.LAYER_BATCHNORM,
                             scale=rng.rand(64).astype(np.float32),
                             offset=rng.randn(64).astype(np.float32)),
            binfmt.LayerSpec(binfmt.LAYER_NARROW, narrow_left=1,
                             narrow_right=1),
            binfmt.LayerSpec(binfmt.LAYER_LOGSOFTMAX),
        ])
        buf = io.BytesIO()
        binfmt.write_nnet(buf, spec)
        buf.seek(0)
        out = binfmt.read_nnet(buf)
        assert out.left_context == 2 and out.right_context == 1
        assert [l.kind for l in out.layers] == [l.kind for l in spec.layers]
        np.testing.assert_array_equal(out.layers[1].weight, spec.layers[1].weight)
        np.testing.assert_array_equal(out.layers[1].bias, spec.layers[1].bias)
        assert out.layers[0].indices == (-1, 0, 1)
        assert out.layers[4].narrow_left == 1


class TestPkFst:
    def test_real_fixture_testinput(self, data_dir):
        # Arc-level asserts mirroring reference test/fst_test.cc:24-72.
        raw = binfmt.read_pkfst_file(os.path.join(data_dir, "testinput.fst"))
        assert raw.start == 0
        assert raw.final[0] == np.inf and raw.final[1] == np.inf
        assert raw.final[2] == np.float32(3.5)
        from catears_tpu.graph.fst import FlatFst
        fst = FlatFst.from_raw(raw)
        lo, hi = fst.arc_range(0)
        assert hi - lo == 2
        assert (fst.arc_next[lo], fst.arc_ilabel[lo], fst.arc_olabel[lo],
                fst.arc_weight[lo]) == (1, 1, 1, np.float32(0.5))
        assert (fst.arc_next[lo + 1], fst.arc_ilabel[lo + 1],
                fst.arc_olabel[lo + 1], fst.arc_weight[lo + 1]) == (
                    1, 2, 2, np.float32(1.5))
        lo, hi = fst.arc_range(1)
        assert hi - lo == 1
        assert (fst.arc_next[lo], fst.arc_ilabel[lo], fst.arc_olabel[lo],
                fst.arc_weight[lo]) == (2, 3, 3, np.float32(2.5))
        lo, hi = fst.arc_range(2)
        assert hi == lo

    def test_roundtrip(self, data_dir):
        raw = binfmt.read_pkfst_file(os.path.join(data_dir, "G.pfst"))
        buf = io.BytesIO()
        binfmt.write_pkfst(buf, raw)
        buf.seek(0)
        raw2 = binfmt.read_pkfst(buf)
        assert raw2.start == raw.start
        np.testing.assert_array_equal(raw.final, raw2.final)
        np.testing.assert_array_equal(raw.arc_ilabel, raw2.arc_ilabel)
        np.testing.assert_array_equal(raw.arc_weight, raw2.arc_weight)


class TestWav:
    def test_header_and_payload(self, data_dir):
        path = os.path.join(data_dir, "en-us-hello.wav")
        with open(path, "rb") as fd:
            fmt = read_pcm_header(fd)
        assert fmt.num_channels == 1
        assert fmt.sample_rate == 16000
        assert fmt.bits_per_sample == 16
        pcm = read_16k_pcm(path)
        assert pcm.dtype == np.float32
        assert pcm.size == (os.path.getsize(path) - 44) // 2
        # Raw amplitudes, not normalized
        assert np.abs(pcm).max() > 1.0

    def test_streaming_chunks_match_batch(self, data_dir):
        path = os.path.join(data_dir, "en-us-hello.wav")
        whole = read_16k_pcm(path)
        with open(path, "rb") as fd:
            fmt = read_pcm_header(fd)
            reader = WaveReader()
            reader.set_format(fmt)
            parts = []
            while True:
                chunk = fd.read(1023)  # odd size: exercises carry buffer
                if not chunk:
                    break
                parts.append(reader.process(chunk))
        np.testing.assert_array_equal(whole, np.concatenate(parts))

    def test_bad_format_rejected(self):
        reader = WaveReader()
        with pytest.raises(CorruptionError):
            reader.set_format(WaveFormat(2, 16000, 16))
        with pytest.raises(CorruptionError):
            reader.set_format(WaveFormat(1, 8000, 16))
        with pytest.raises(CorruptionError):
            reader.set_format(WaveFormat(1, 16000, 24))


class TestSymbolTable:
    def test_real_fixture(self, data_dir):
        table = SymbolTable.read(os.path.join(data_dir, "lm.words.txt"))
        assert table.get(table.get_id("marisa")) == "marisa"
        assert table.bos_id == table.get_id("<s>")
        assert table.eos_id == table.get_id("</s>")
        assert table.get_id("definitely-not-a-word") == -1


class TestConstFst:
    def test_roundtrip(self):
        rng = np.random.RandomState(11)
        n_states, n_arcs = 13, 40
        state_of_arc = np.sort(rng.randint(0, n_states, n_arcs))
        counts = np.bincount(state_of_arc, minlength=n_states)
        pos = np.concatenate([[0], np.cumsum(counts)[:-1]])
        final = np.where(rng.rand(n_states) < 0.3,
                         rng.rand(n_states).astype(np.float32), np.inf)
        cf = openfst.ConstFst(
            start=0,
            final=final.astype(np.float32),
            arc_pos=pos.astype(np.int64),
            arc_count=counts.astype(np.int32),
            arc_ilabel=rng.randint(0, 5, n_arcs).astype(np.int32),
            arc_olabel=rng.randint(0, 5, n_arcs).astype(np.int32),
            arc_weight=rng.rand(n_arcs).astype(np.float32),
            arc_next=rng.randint(0, n_states, n_arcs).astype(np.int32),
        )
        buf = io.BytesIO()
        openfst.write_const_fst(buf, cf)
        buf.seek(0)
        out = openfst.read_const_fst(buf)
        assert out.start == cf.start
        np.testing.assert_array_equal(out.final, cf.final)
        np.testing.assert_array_equal(out.arc_pos, cf.arc_pos)
        np.testing.assert_array_equal(out.arc_count, cf.arc_count)
        np.testing.assert_array_equal(out.arc_ilabel, cf.arc_ilabel)
        np.testing.assert_array_equal(out.arc_weight, cf.arc_weight)


class TestTruncationFuzz:
    """Every binary reader must fail TYPED (CatEarsError family) on
    truncated or bit-flipped inputs — never with an uncaught struct/index
    crash (the reference's Status-code contract, src/status.h:37-103)."""

    def test_truncations_raise_typed_errors(self, tmp_path, data_dir):
        import io as _io

        from catears_tpu.graph.fst import FlatFst
        from catears_tpu.io.binfmt import read_vec0_file
        from catears_tpu.io.wav import read_pcm_header
        from catears_tpu.utils.errors import CatEarsError

        rng = np.random.RandomState(0)
        g_pfst = open(os.path.join(data_dir, "G.pfst"), "rb").read()
        uni = open(os.path.join(data_dir, "lm.1order.bin"), "rb").read()
        wav = open(os.path.join(data_dir, "en-us-hello.wav"), "rb").read()
        scratch = tmp_path / "fuzz.bin"

        def via_file(reader):
            def run(b):
                scratch.write_bytes(b)
                return reader(str(scratch))
            return run

        def expect_typed(fn):
            try:
                fn()
            except CatEarsError:
                return
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"untyped failure {type(e).__name__}: {e}") from e
            # parsing damaged input "successfully" is acceptable only when
            # the damage misses every validated field; the point here is
            # that failures, when they happen, are typed.
            return

        for payload, reader in (
            (g_pfst, via_file(FlatFst.read)),
            (uni, via_file(read_vec0_file)),
            (wav, lambda b: read_pcm_header(_io.BytesIO(b))),
        ):
            for cut in (0, 1, 3, 7, len(payload) // 2, len(payload) - 1):
                expect_typed(lambda b=payload[:cut], r=reader: r(b))
            for _ in range(20):
                b = bytearray(payload)
                pos = rng.randint(0, min(64, len(b)))  # header region
                b[pos] ^= 1 << rng.randint(0, 8)
                expect_typed(lambda bb=bytes(b), r=reader: r(bb))
