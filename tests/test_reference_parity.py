"""Transcript parity against the actual reference binary.

Builds a synthetic-but-complete model in the REFERENCE's artifact formats
(NN02 nnet, VEC0 prior/tid2pdf, OpenFST ConstFst HCLG, words.txt), decodes
real test audio with the reference pocketkaldi CLI AND with this framework,
and requires identical transcripts.

The reference binary is built by scripts/build_reference.sh (done on demand
here); skipped if the toolchain/reference tree is unavailable.
"""

import os
import subprocess

import numpy as np
import pytest

from catears_tpu.graph.fst import FlatFst
from catears_tpu.io.openfst import ConstFst, write_const_fst
from catears_tpu.runtime.recognizer import Recognizer, decode_wav_file
from catears_tpu.tools.toy import write_toy_model

REFERENCE_BIN = os.environ.get("CATEARS_REFERENCE_BIN",
                               "/tmp/refbuild/pocketkaldi")
BUILD_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "scripts", "build_reference.sh")


def _ensure_reference_bin() -> bool:
    if os.path.exists(REFERENCE_BIN):
        return True
    if not os.path.isdir("/root/reference"):
        return False
    try:
        proc = subprocess.run(["bash", BUILD_SCRIPT], capture_output=True,
                              timeout=600)
        return proc.returncode == 0 and os.path.exists(REFERENCE_BIN)
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(not _ensure_reference_bin(),
                                reason="reference binary unavailable")


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Toy model with BOTH graph formats + a reference-compatible config."""
    out = tmp_path_factory.mktemp("parity_model")
    write_toy_model(str(out), num_words=5, hidden=32, num_pdfs=24)
    # Reference loads HCLG via OpenFST ConstFst: export our toy graph
    fst = FlatFst.read(os.path.join(out, "toy.fst"))
    counts = np.diff(fst.offsets).astype(np.int32)
    cf = ConstFst(start=fst.start, final=fst.final,
                  arc_pos=fst.offsets[:-1].astype(np.int64),
                  arc_count=counts, arc_ilabel=fst.arc_ilabel,
                  arc_olabel=fst.arc_olabel, arc_weight=fst.arc_weight,
                  arc_next=fst.arc_next)
    with open(os.path.join(out, "toy.hclg"), "wb") as fd:
        write_const_fst(fd, cf)
    with open(os.path.join(out, "ref.conf"), "w") as fd:
        fd.write("fst = toy.hclg\n")
        fd.write("nnet = toy.nnet\n")
        fd.write("prior = toy.prior\n")
        fd.write("left_context = 2\n")
        fd.write("right_context = 2\n")
        fd.write("chunk_size = 8\n")
        fd.write("num_pdfs = 24\n")
        fd.write("tid2pdf = toy.tid2pdf\n")
        fd.write("symbol_table = words.txt\n")
    return str(out)


class TestTranscriptParity:
    @pytest.mark.parametrize("wav", ["en-us-hello.wav", "en-us-cat.wav"])
    def test_same_transcript(self, model_dir, data_dir, wav):
        wav_path = os.path.join(data_dir, wav)
        ref_out = subprocess.run(
            [REFERENCE_BIN, os.path.join(model_dir, "ref.conf"), wav_path],
            capture_output=True, text=True, timeout=300)
        assert ref_out.returncode == 0, ref_out.stderr
        ref_hyp = ref_out.stdout.strip()

        rec = Recognizer(os.path.join(model_dir, "ref.conf"))
        our_hyp = decode_wav_file(rec, wav_path)
        assert our_hyp == ref_hyp, (
            f"reference: {ref_hyp!r}  ours: {our_hyp!r}")

    @pytest.mark.parametrize("wav", ["en-us-hello.wav", "en-us-cat.wav"])
    def test_same_transcript_with_delta_lm(self, model_dir, data_dir, wav,
                                           tmp_path):
        """Online big-LM rescoring: both implementations, same transcript."""
        from catears_tpu.io.binfmt import write_pkfst, write_vec0
        from catears_tpu.tools.toy import make_toy_lm

        rng = np.random.RandomState(42)
        lm_fst, small_lm = make_toy_lm(rng, num_words=5, bos_id=6, eos_id=7)
        with open(os.path.join(model_dir, "toy.lm"), "wb") as fd:
            write_pkfst(fd, lm_fst)
        with open(os.path.join(model_dir, "toy.uni"), "wb") as fd:
            write_vec0(fd, small_lm)
        with open(os.path.join(model_dir, "ref.conf")) as fd:
            base_conf = fd.read()
        conf_path = os.path.join(model_dir, "ref_lm.conf")
        with open(conf_path, "w") as fd:
            fd.write(base_conf)
            fd.write("large_lm = toy.lm\noriginal_lm = toy.uni\n")

        wav_path = os.path.join(data_dir, wav)
        ref_out = subprocess.run([REFERENCE_BIN, conf_path, wav_path],
                                 capture_output=True, text=True, timeout=300)
        assert ref_out.returncode == 0, ref_out.stderr
        rec = Recognizer(conf_path)
        assert rec.delta_lm is not None
        our_hyp = decode_wav_file(rec, wav_path)
        assert our_hyp == ref_out.stdout.strip()

    def test_both_graph_formats_agree(self, model_dir, data_dir):
        """Our runtime must decode identically from ConstFst and pk::fst_0."""
        wav_path = os.path.join(data_dir, "en-us-hello.wav")
        rec_const = Recognizer(os.path.join(model_dir, "ref.conf"))
        rec_pk = Recognizer(os.path.join(model_dir, "toy.conf"))
        assert (decode_wav_file(rec_const, wav_path)
                == decode_wav_file(rec_pk, wav_path))


class TestMidSizeParity:
    """Transcript parity beyond the 5-word toy: a mkgraph-shaped trie HCLG
    (1.5k words, ~15k states) exported to the reference's artifact formats
    (OpenFST ConstFst + NN02 + VEC0), decoded by the reference binary and
    by this framework on the same real audio.  The reference handles
    arbitrary-size graphs within its 30k-token budget
    (/root/reference/src/decoder.h:54); this checks agreement holds on a
    graph where beam pruning and word-end epsilon traffic actually engage.
    """

    @pytest.fixture(scope="class")
    def mid_model(self, tmp_path_factory):
        from catears_tpu.io import binfmt
        from catears_tpu.tools.biggraph import make_trie_graph
        from catears_tpu.tools.toy import make_toy_nnet

        out = tmp_path_factory.mktemp("parity_mid")
        rng = np.random.RandomState(11)
        g = make_trie_graph(rng, num_words=1500, num_phones=50,
                            variants=2, bigram_states=400)
        nnet = make_toy_nnet(rng, hidden=64, num_pdfs=g.num_pdfs)
        with open(os.path.join(out, "mid.nnet"), "wb") as fd:
            binfmt.write_nnet(fd, nnet)
        prior = (np.ones(g.num_pdfs) / g.num_pdfs).astype(np.float32)
        with open(os.path.join(out, "mid.prior"), "wb") as fd:
            binfmt.write_vec0(fd, prior)
        with open(os.path.join(out, "mid.tid2pdf"), "wb") as fd:
            binfmt.write_vec0(fd, g.tid2pdf)
        counts = np.diff(g.fst.offsets).astype(np.int32)
        cf = ConstFst(start=g.fst.start, final=g.fst.final,
                      arc_pos=g.fst.offsets[:-1].astype(np.int64),
                      arc_count=counts, arc_ilabel=g.fst.arc_ilabel,
                      arc_olabel=g.fst.arc_olabel,
                      arc_weight=g.fst.arc_weight, arc_next=g.fst.arc_next)
        with open(os.path.join(out, "mid.hclg"), "wb") as fd:
            write_const_fst(fd, cf)
        with open(os.path.join(out, "words.txt"), "w") as fd:
            fd.write("<eps> 0\n")
            for i in range(1, g.num_words + 1):
                fd.write(f"word{i} {i}\n")
            fd.write(f"<s> {g.num_words + 1}\n")
            fd.write(f"</s> {g.num_words + 2}\n")
        conf = os.path.join(out, "mid.conf")
        with open(conf, "w") as fd:
            fd.write("fst = mid.hclg\nnnet = mid.nnet\nprior = mid.prior\n")
            fd.write(f"left_context = {nnet.left_context}\n")
            fd.write(f"right_context = {nnet.right_context}\n")
            fd.write(f"chunk_size = 8\nnum_pdfs = {g.num_pdfs}\n")
            fd.write("tid2pdf = mid.tid2pdf\nsymbol_table = words.txt\n")
        return conf

    @pytest.mark.parametrize("wav", ["en-us-hello.wav", "en-us-cat.wav"])
    def test_same_transcript_at_scale(self, mid_model, data_dir, wav):
        from catears_tpu.decode.beam import BeamConfig

        wav_path = os.path.join(data_dir, wav)
        ref_out = subprocess.run([REFERENCE_BIN, mid_model, wav_path],
                                 capture_output=True, text=True, timeout=600)
        assert ref_out.returncode == 0, ref_out.stderr
        ref_hyp = ref_out.stdout.strip()
        # Beam capacity comparable to the reference's 30k-token budget so
        # any disagreement is semantic, not a pruning-budget artifact.
        cfg = BeamConfig(beam_size=8192, expand_size=32768,
                         eps_expand_size=16384, max_eps_iters=4)
        rec = Recognizer(mid_model, beam_config=cfg)
        our_hyp = decode_wav_file(rec, wav_path)
        assert our_hyp == ref_hyp, (
            f"reference: {ref_hyp!r}  ours: {our_hyp!r}")


def _write_wav(path, samples: np.ndarray):
    """Write a canonical 16-bit mono 16 kHz wav file."""
    import struct
    pcm = np.clip(samples, -32768, 32767).astype("<i2").tobytes()
    with open(path, "wb") as fd:
        fd.write(b"RIFF")
        fd.write(struct.pack("<i", 36 + len(pcm)))
        fd.write(b"WAVEfmt ")
        fd.write(struct.pack("<ihhiihh", 16, 1, 1, 16000, 32000, 2, 16))
        fd.write(b"data")
        fd.write(struct.pack("<i", len(pcm)))
        fd.write(pcm)


class TestScpBatchParity:
    def test_batch_cer_zero_vs_reference(self, model_dir, tmp_path):
        """10 synthetic utterances: reference scp decode vs our batched
        decode must have CER 0 against each other."""
        from catears_tpu.runtime.batch import decode_scp
        from catears_tpu.tools.score import score

        rng = np.random.RandomState(5)
        scp = tmp_path / "batch.scp"
        lines = []
        for i in range(10):
            wav = tmp_path / f"u{i}.wav"
            seconds = rng.uniform(0.5, 1.5)
            _write_wav(str(wav),
                       rng.randn(int(16000 * seconds)) * 2000)
            lines.append(f"utt{i} {wav}")
        scp.write_text("\n".join(lines) + "\n")

        ref_out = subprocess.run(
            [REFERENCE_BIN, os.path.join(model_dir, "ref.conf"), str(scp)],
            capture_output=True, text=True, timeout=600)
        assert ref_out.returncode == 0, ref_out.stderr
        ref_txt = tmp_path / "ref_hyp.txt"
        ref_txt.write_text(ref_out.stdout)

        rec = Recognizer(os.path.join(model_dir, "ref.conf"))
        ours = decode_scp(rec, str(scp), batch_size=4)
        hyp_txt = tmp_path / "our_hyp.txt"
        hyp_txt.write_text("".join(f"{n} {h}\n" for n, h in ours))

        result = score(str(ref_txt), str(hyp_txt), char_tok=True)
        assert result.ref_tokens > 0
        assert result.errors == 0, (ref_out.stdout, ours)
