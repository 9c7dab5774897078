"""Offline tool tests: AM converter, FST converter, LM tools, scoring."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from catears_tpu.io import binfmt
from catears_tpu.tools import convert_am, convert_misc, lm, score
from catears_tpu.tools.convert_fst import flat_to_raw

NNET3_TEXT = """\
<Nnet3>
input-node name=input dim=4
component-node name=tdnn1.affine component=tdnn1.affine \
input=Append(Offset(input, -1), input, Offset(input, 1))
component-node name=tdnn1.relu component=tdnn1.relu input=tdnn1.affine
component-node name=tdnn1.batchnorm component=tdnn1.batchnorm \
input=tdnn1.relu
component-node name=output.affine component=output.affine \
input=tdnn1.batchnorm
component-node name=output.log-softmax component=output.log-softmax \
input=output.affine
output-node name=output input=output.log-softmax objective=linear
<NumComponents> 4
<ComponentName> tdnn1.affine <NaturalGradientAffineComponent> \
<LinearParams> [
  1 0 0 0 1 0 0 0 1 0 0 0
  0 1 0 0 0 1 0 0 0 1 0 0 ]
<BiasParams> [ 0.5 -0.5 ]
</NaturalGradientAffineComponent>
<ComponentName> tdnn1.relu <RectifiedLinearComponent> <Dim> 2 \
</RectifiedLinearComponent>
<ComponentName> tdnn1.batchnorm <BatchNormComponent> <Dim> 2 \
<Epsilon> 0.001 <TargetRms> 1.0 <StatsMean> [ 0.1 0.2 ] \
<StatsVar> [ 1.0 4.0 ] </BatchNormComponent>
<ComponentName> output.affine <NaturalGradientAffineComponent> \
<LinearParams> [
  1 0
  0 1
  1 1 ]
<BiasParams> [ 0 0 0 ]
</NaturalGradientAffineComponent>
</Nnet3>
<LeftContext> 1 <RightContext> 1 <Priors>  [ 0.2 0.3 0.5 ]
"""
# note: log-softmax appears in the graph but as a separate component below


NNET3_TEXT = NNET3_TEXT.replace(
    "</Nnet3>",
    "<ComponentName> output.log-softmax <LogSoftmaxComponent> <Dim> 3 "
    "</LogSoftmaxComponent>\n</Nnet3>")


class TestConvertAm:
    def test_convert_and_run(self, tmp_path):
        spec, prior = convert_am.convert(NNET3_TEXT)
        convert_am.verify_dims(spec)
        assert spec.left_context == 1 and spec.right_context == 1
        kinds = [l.kind for l in spec.layers]
        assert kinds == [binfmt.LAYER_SPLICE, binfmt.LAYER_NARROW,
                         binfmt.LAYER_LINEAR, binfmt.LAYER_RELU,
                         binfmt.LAYER_BATCHNORM, binfmt.LAYER_LINEAR,
                         binfmt.LAYER_LOGSOFTMAX]
        assert spec.layers[0].indices == (-1, 0, 1)
        # Kaldi [out=2, in=12] -> stored [12, 2]
        assert spec.layers[2].weight.shape == (12, 2)
        np.testing.assert_allclose(prior, [0.2, 0.3, 0.5])
        # batchnorm: scale = (var+eps)^-0.5, offset = -mean*scale
        np.testing.assert_allclose(spec.layers[4].scale,
                                   [(1.001) ** -0.5, (4.001) ** -0.5],
                                   rtol=1e-6)

        # Run the converted nnet end-to-end
        from catears_tpu.am.nnet import build_nnet, nnet_forward
        import jax.numpy as jnp
        nnet_def, params = build_nnet(spec)
        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        out = np.asarray(nnet_forward(nnet_def, params, x))
        assert out.shape == (1, 3)  # narrow consumed the context
        np.testing.assert_allclose(np.exp(out).sum(), 1.0, rtol=1e-5)

    def test_cli_roundtrip(self, tmp_path):
        src = tmp_path / "am.txt"
        src.write_text(NNET3_TEXT)
        out = tmp_path / "model"
        assert convert_am.main([str(src), str(out)]) == 0
        spec = binfmt.read_nnet_file(str(out) + ".nnet")
        assert len(spec.layers) == 7
        prior = binfmt.read_vec0_file(str(out) + ".prior")
        assert prior.size == 3


class TestConvertFst:
    def test_const_to_pkfst(self, tmp_path, data_dir):
        # pk -> our ConstFst writer -> convert back to pk: bitwise stable
        from catears_tpu.graph.fst import FlatFst
        fst = FlatFst.read(os.path.join(data_dir, "G.pfst"))
        raw = flat_to_raw(fst)
        out = tmp_path / "g2.pfst"
        with open(out, "wb") as fd:
            binfmt.write_pkfst(fd, raw)
        fst2 = FlatFst.read(str(out))
        np.testing.assert_array_equal(fst.arc_ilabel, fst2.arc_ilabel)
        np.testing.assert_array_equal(fst.offsets, fst2.offsets)


ARPA = """\

\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-1.0\t<s>\t-0.5
-0.30103\thello
-0.60206\tworld
-2.0\t</s>

\\2-grams:
-0.1\thello world

\\end\\
"""


class TestLmTools:
    def test_prune_to_unigram(self):
        lines = lm.prune_to_unigram(ARPA.splitlines())
        text = "\n".join(lines)
        assert "\\1-grams:" in text
        assert "2-grams" not in text
        assert "hello world" not in text
        assert "-0.30103 hello" in text

    def test_unigram_cost_vector(self, tmp_path):
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(ARPA)
        costs = lm.read_unigram_costs(str(arpa))
        assert abs(costs["hello"] + 0.30103) < 1e-9
        vocab = {"<eps>": 0, "hello": 1, "world": 2, "<s>": 3, "</s>": 4}
        costs["<s>"] = 0.0
        arr = lm.build_cost_vector(costs, vocab)
        # -log10 p * ln(10) == -ln p
        assert abs(arr[1] - 0.30103 * lm.M_LN10) < 1e-5
        assert arr[3] == 0.0
        assert arr[0] == np.inf


class TestConvertMisc:
    def test_trans(self, tmp_path):
        src = tmp_path / "id2pdf.txt"
        src.write_text("4\n6\n1 0\n2 0\n3 1\n4 2\n5 3\n6 3\n")
        out = tmp_path / "tid2pdf.bin"
        num_pdfs = convert_misc.convert_trans(str(src), str(out))
        assert num_pdfs == 4
        v = binfmt.read_vec0_file(str(out), np.int32)
        np.testing.assert_array_equal(v, [0, 0, 0, 1, 2, 3, 3])

    def test_cmvn(self, tmp_path):
        src = tmp_path / "stats.txt"
        vals = " ".join(str(float(i)) for i in range(82))
        src.write_text(f" [\n {vals} ]\n")
        out = tmp_path / "cmvn.bin"
        convert_misc.convert_cmvn_stats(str(src), str(out))
        v = binfmt.read_vec0_file(str(out))
        np.testing.assert_array_equal(v, np.arange(41, dtype=np.float32))


class TestScore:
    def test_edit_distance(self):
        err, s, d, i = score.edit_distance(list("kitten"), list("sitting"))
        assert err == 3 and s == 2 and i == 1

    def test_char_tokenize(self):
        assert score.char_tokenize("hello world") == ["hello", "world"]
        assert score.char_tokenize("你好 world") == ["你", "好", "world"]
        assert score.char_tokenize("你好吗") == ["你", "好", "吗"]

    def test_score_files(self, tmp_path):
        ref = tmp_path / "ref.txt"
        hyp = tmp_path / "hyp.txt"
        ref.write_text("utt1 hello world\nutt2 the cat sat\n")
        hyp.write_text("utt1 hello word\nutt2 the cat sat\n")
        r = score.score(str(ref), str(hyp))
        assert r.errors == 1 and r.ref_tokens == 5
        assert abs(r.wer - 0.2) < 1e-9

    def test_missing_utterance(self, tmp_path):
        ref = tmp_path / "ref.txt"
        hyp = tmp_path / "hyp.txt"
        ref.write_text("utt1 a b\nutt2 c\n")
        hyp.write_text("utt1 a b\n")
        r = score.score(str(ref), str(hyp))
        assert r.missing == 1 and r.errors == 1


class TestTokenErrors:
    def test_matches_python_dp(self):
        from catears_tpu.tools.score import edit_distance, token_errors

        rng = np.random.RandomState(3)
        for _ in range(20):
            ref = [str(x) for x in rng.randint(0, 8, rng.randint(0, 12))]
            hyp = [str(x) for x in rng.randint(0, 8, rng.randint(0, 12))]
            assert token_errors(ref, hyp) == edit_distance(ref, hyp)[0]


class TestArpaToFst:
    ARPA2 = """\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-99\t<s>\t-0.30103
-0.69897\t</s>
-0.52288\ta\t-0.39794
-0.69897\tb\t-0.30103
-1.0\tc

\\2-grams:
-0.30103\t<s> a
-0.39794\ta b
-0.52288\tb </s>
-0.69897\ta a

\\end\\
"""
    ARPA3 = """\\data\\
ngram 1=4
ngram 2=3
ngram 3=2

\\1-grams:
-99 <s> -0.4
-0.6 </s>
-0.5 x -0.3
-0.8 y -0.2

\\2-grams:
-0.4 <s> x -0.15
-0.5 x y -0.25
-0.9 y x

\\3-grams:
-0.3 <s> x y
-0.6 x y x

\\end\\
"""

    @pytest.mark.parametrize("arpa,alphabet,maxlen",
                             [("ARPA2", "abc", 3), ("ARPA3", "xy", 4)])
    def test_exhaustive_sentence_parity(self, tmp_path, arpa, alphabet,
                                        maxlen):
        """FST backoff walk == raw ARPA-table scorer for every short
        sentence (the reference's LmFst parity strategy,
        test/fst_test.cc:153-176)."""
        import itertools

        from catears_tpu.graph.fst import LmFst
        from catears_tpu.tools.arpa import (arpa_to_fst, parse_arpa,
                                            sentence_cost)

        text = getattr(self, arpa)
        path = tmp_path / "lm.arpa"
        path.write_text(text)
        fst, vocab = arpa_to_fst(str(path))
        lm = LmFst(**fst.__dict__)
        grams = parse_arpa(text.splitlines())

        def fst_cost(words):
            s, total = fst.start, 0.0
            for w in list(words) + ["</s>"]:
                hit = lm.get_arc_backoff(s, vocab[w])
                if hit is None:
                    return float("inf")
                s, wgt = hit
                total += wgt
            return total + lm.final_backoff(s)

        for n in range(maxlen + 1):
            for sent in itertools.product(alphabet, repeat=n):
                ref = sentence_cost(grams, list(sent))
                got = fst_cost(sent)
                same_inf = ref == got == float("inf")
                assert same_inf or abs(ref - got) < 1e-5, (sent, ref, got)

    def test_backoff_arc_first_in_span(self, tmp_path):
        """LmFst requires the epsilon backoff arc first in each span."""
        from catears_tpu.tools.arpa import arpa_to_fst

        path = tmp_path / "lm.arpa"
        path.write_text(self.ARPA2)
        fst, _ = arpa_to_fst(str(path))
        for s in range(fst.num_states):
            lo, hi = fst.arc_range(s)
            eps = np.flatnonzero(fst.arc_ilabel[lo:hi] == 0)
            assert eps.size <= 1
            if eps.size:
                assert eps[0] == 0


class TestFitBigram:
    def test_fit_normalizes_and_scores(self, tmp_path):
        """fit_bigram_arpa produces a well-formed backoff bigram: per
        history the probabilities of all continuations (observed bigrams
        + backoff x unseen unigrams) sum to ~1, the FST walk agrees with
        the raw-table scorer, and observed bigrams beat unseen ones."""
        from catears_tpu.graph.fst import LmFst
        from catears_tpu.tools.arpa import (arpa_to_fst, parse_arpa,
                                            sentence_cost)
        from catears_tpu.tools.lm import fit_bigram_arpa

        rng = np.random.RandomState(0)
        vocab = [f"w{i}" for i in range(1, 9)]
        # Markov corpus: w_i prefers w_{i+1 mod 8}
        seqs = []
        for _ in range(200):
            seq, cur = [], rng.randint(1, 9)
            for _ in range(rng.randint(3, 10)):
                seq.append(f"w{cur}")
                cur = (cur % 8) + 1 if rng.rand() < 0.8 \
                    else rng.randint(1, 9)
            seqs.append(seq)
        lines = fit_bigram_arpa(seqs, vocab)
        grams = parse_arpa(lines)
        # Per-history normalization
        p_uni = {w: 10 ** p for (w,), (p, _) in grams[0].items()}
        for (h,), (_, bo) in grams[0].items():
            if h == "</s>":
                continue
            seen = {w: 10 ** p for (hh, w), (p, _) in grams[1].items()
                    if hh == h}
            if not seen:
                continue
            unseen_mass = sum(p for w, p in p_uni.items()
                              if w not in seen and w != "<s>")
            total = sum(seen.values()) + 10 ** bo * unseen_mass
            assert abs(total - 1.0) < 0.05, (h, total)
        # FST parity with the raw table scorer
        path = tmp_path / "fit.arpa"
        path.write_text("\n".join(lines) + "\n")
        fst, vmap = arpa_to_fst(str(path))
        lm = LmFst(**fst.__dict__)

        def fst_cost(words):
            s, total = fst.start, 0.0
            for w in list(words) + ["</s>"]:
                hit = lm.get_arc_backoff(s, vmap[w])
                assert hit is not None
                s, wgt = hit
                total += wgt
            return total

        for sent in (["w1", "w2", "w3"], ["w5", "w1", "w8"], ["w8"]):
            ref = sentence_cost(grams, sent)
            got = fst_cost(sent)
            assert abs(ref - got) < 1e-4, (sent, ref, got)
        # The chain structure is learned: following the chain is cheaper.
        assert (sentence_cost(grams, ["w1", "w2", "w3", "w4"])
                < sentence_cost(grams, ["w1", "w7", "w3", "w8"]))


class TestExtractId2Pdf:
    MDL = """<TransitionModel>
<Topology>
<TopologyEntry>
<ForPhones>
1 2
</ForPhones>
<State> 0 <PdfClass> 0 <Transition> 0 0.75 <Transition> 1 0.25 </State>
<State> 1 <PdfClass> 1 <Transition> 1 0.75 <Transition> 2 0.25 </State>
<State> 2 </State>
</TopologyEntry>
</Topology>
<Triples> 4
1 0 0
1 1 1
2 0 2
2 1 3
</Triples>
<LogProbs>
 [ 0 ]
</LogProbs>
</TransitionModel>
"""

    def test_triples_numbering(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "extract_id2pdf",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "extract_id2pdf.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        num_pdfs, tid2pdf = mod.parse_transition_model(self.MDL)
        assert num_pdfs == 4
        # 4 transition states x 2 transitions each = 8 tids (+ tid 0)
        assert tid2pdf == [0, 0, 0, 1, 1, 2, 2, 3, 3]


class TestMkgraphRecipe:
    def test_end_to_end_decode_dir(self, tmp_path, data_dir):
        """mkgraph.py assembles a working decode dir from 'Kaldi' inputs:
        HCLG fst + words.txt + ARPA LM + id2pdf text + converted AM."""
        from catears_tpu.decode.beam import BeamConfig
        from catears_tpu.runtime.recognizer import Recognizer, decode_wav_file
        from catears_tpu.tools.toy import (make_phone_loop_graph,
                                           write_toy_model)

        src = tmp_path / "kaldi_artifacts"
        conf_path = write_toy_model(str(src), num_words=5, hidden=32,
                                    num_pdfs=24)
        rng = np.random.RandomState(0)
        graph = make_phone_loop_graph(rng, num_words=5, num_pdfs=24)
        id2pdf = src / "id2pdf.txt"
        with open(id2pdf, "w") as fd:
            fd.write(f"24\n{graph.num_transitions}\n")
            for tid, pdf in enumerate(graph.tid2pdf):
                fd.write(f"{tid} {pdf}\n")
        arpa = src / "lm.arpa"
        words = [f"word{i}" for i in range(1, 6)]
        lines = ["\\data\\", "ngram 1=7", "", "\\1-grams:",
                 "-99\t<s>\t-0.3", "-0.7\t</s>"]
        lines += [f"-0.8\t{w}\t-0.2" for w in words]
        lines += ["", "\\2-grams:", "-0.4\t<s> word1", "", "\\end\\"]
        arpa.write_text("\n".join(lines) + "\n")
        # the toy ARPA has a 2-gram section header only when counts say so
        arpa.write_text(arpa.read_text().replace("ngram 1=7",
                                                 "ngram 1=7\nngram 2=1"))

        out = tmp_path / "graph"
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "mkgraph", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "mkgraph.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rc = mod.main([
            "--out", str(out), "--words", str(src / "words.txt"),
            "--hclg", str(src / "toy.fst"), "--lm", str(arpa),
            "--id2pdf", str(id2pdf), "--nnet", str(src / "toy.nnet"),
            "--prior", str(src / "toy.prior"), "--left-context", "2",
            "--right-context", "2", "--chunk-size", "8"])
        assert rc == 0
        for name in ("catears.conf", "hclg.fst", "g.pfst",
                     "original_lm.bin", "tid2pdf.bin", "am.nnet",
                     "am.prior", "words.txt"):
            assert (out / name).exists(), name

        cfg = BeamConfig(beam_size=128, expand_size=1024,
                         eps_expand_size=512, max_eps_iters=6, beam=1e9)
        rec = Recognizer(str(out / "catears.conf"), beam_config=cfg)
        assert rec.delta_lm is not None  # big-LM rescoring wired up
        # delta(word1 | <s>) = bigram cost - unigram subtraction
        import math
        wid = rec.symbol_table.get_id("word1")
        nxt, delta = rec.delta_lm.get_arc(rec.delta_lm.start_state(), wid)
        assert abs(delta - (0.4 - 0.8) * math.log(10)) < 1e-5
        hyp = decode_wav_file(rec, os.path.join(data_dir,
                                                "en-us-hello.wav"))
        assert isinstance(hyp, str)
        assert rec is not None


class TestTuneCli:
    def test_tune_and_deploy_keys(self, tmp_path, capsys, data_dir):
        import numpy as np

        from catears_tpu.runtime.recognizer import Recognizer
        from catears_tpu.tools.toy import write_toy_model
        from catears_tpu.tools.tune import main as tune_main

        conf = write_toy_model(str(tmp_path), rng=np.random.RandomState(2),
                               num_words=25, hidden=32, num_pdfs=48)
        wav = os.path.join(data_dir, "en-us-hello.wav")
        assert tune_main([conf, wav, "--margin=1.5",
                          "--beam-size=128"]) == 0
        out = capsys.readouterr().out
        keys = dict(line.split(" = ") for line in out.splitlines()
                    if " = " in line)
        assert int(keys["beam_size"]) == 128
        assert int(keys["expand_size"]) >= 1
        # The printed keys ARE the deployment contract: appended to the
        # model config, the Recognizer picks them up directly.
        with open(conf, "a", encoding="utf-8") as fd:
            fd.write("\n" + "\n".join(
                f"{k} = {v}" for k, v in keys.items()) + "\n")
        rec = Recognizer(conf)
        assert rec.beam_config.beam_size == 128
        assert rec.beam_config.expand_size == int(keys["expand_size"])
