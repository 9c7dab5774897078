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
