"""Acoustic model tests: per-layer hand-computed cases, NN02 load,
streaming == whole-utterance equivalence (reference test/nnet_test.cc model).
"""

import io
import os

import jax.numpy as jnp
import numpy as np
import pytest

from catears_tpu.am.model import AcousticModel, AMStream
from catears_tpu.am.nnet import (
    build_nnet,
    narrow,
    nnet_forward,
    normalize_rms,
    splice,
)
from catears_tpu.io import binfmt
from catears_tpu.io.config import Configuration
from catears_tpu.tools.toy import make_toy_nnet, write_toy_model


class TestLayers:
    def test_splice_clamps_edges(self):
        x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(3, 2))
        out = np.asarray(splice(x, (-1, 0, 1)))
        # Row 0: left context clamped to row 0
        np.testing.assert_array_equal(out[0], [0, 1, 0, 1, 2, 3])
        np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4, 5])
        # Row 2: right context clamped to row 2
        np.testing.assert_array_equal(out[2], [2, 3, 4, 5, 4, 5])

    def test_splice_asymmetric(self):
        x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
        out = np.asarray(splice(x, (-2, 0)))
        np.testing.assert_array_equal(out[0], [0, 1, 0, 1])
        np.testing.assert_array_equal(out[3], [2, 3, 6, 7])

    def test_narrow(self):
        x = jnp.asarray(np.arange(10, dtype=np.float32).reshape(5, 2))
        out = np.asarray(narrow(x, 1, 2))
        np.testing.assert_array_equal(out, [[2, 3], [4, 5]])
        # Too few rows: pass-through (reference src/nnet.cc:186-189)
        out = np.asarray(narrow(x, 3, 2))
        np.testing.assert_array_equal(out, np.asarray(x))

    def test_linear(self):
        w = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
        b = np.array([0.5, -0.5], np.float32)
        spec = binfmt.NnetSpec(0, 0, [
            binfmt.LayerSpec(binfmt.LAYER_LINEAR, weight=w, bias=b)])
        nnet_def, params = build_nnet(spec)
        x = jnp.asarray([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        out = np.asarray(nnet_forward(nnet_def, params, x))
        np.testing.assert_allclose(out, [[6.5, 7.5], [3.5, 3.5]])

    def test_normalize_rms(self):
        x = jnp.asarray([[3.0, 4.0, 0.0, 0.0]])
        out = np.asarray(normalize_rms(x))
        # rms of output row must be 1: scale = sqrt(D / sum(x^2)) = sqrt(4/25)
        np.testing.assert_allclose(out, [[1.2, 1.6, 0.0, 0.0]], rtol=1e-6)

    def test_batchnorm_relu_logsoftmax(self):
        spec = binfmt.NnetSpec(0, 0, [
            binfmt.LayerSpec(binfmt.LAYER_BATCHNORM,
                             scale=np.array([2.0, 1.0], np.float32),
                             offset=np.array([0.0, -1.0], np.float32)),
            binfmt.LayerSpec(binfmt.LAYER_RELU),
            binfmt.LayerSpec(binfmt.LAYER_LOGSOFTMAX),
        ])
        nnet_def, params = build_nnet(spec)
        x = jnp.asarray([[1.0, 0.5]])
        # batchnorm: [2.0, -0.5]; relu: [2.0, 0.0]; logsoftmax
        out = np.asarray(nnet_forward(nnet_def, params, x))
        expect = np.array([2.0, 0.0])
        expect = expect - np.log(np.exp(expect).sum())
        np.testing.assert_allclose(out[0], expect, rtol=1e-6)

    def test_softmax(self):
        spec = binfmt.NnetSpec(0, 0, [binfmt.LayerSpec(binfmt.LAYER_SOFTMAX)])
        nnet_def, params = build_nnet(spec)
        out = np.asarray(nnet_forward(nnet_def, params,
                                      jnp.asarray([[0.0, 0.0, 1.0]])))
        assert abs(out.sum() - 1.0) < 1e-6
        assert out[0, 2] > out[0, 0]


class TestAcousticModel:
    @pytest.fixture(scope="class")
    def model_dir(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("toy_model")
        write_toy_model(str(out))
        return str(out)

    def test_read_from_config(self, model_dir):
        conf = Configuration.read(os.path.join(model_dir, "toy.conf"))
        am = AcousticModel.read(conf)
        assert am.num_pdfs == 48
        assert am.left_context == 2 and am.right_context == 2
        assert am.tid2pdf.dtype == np.int32

    def test_forward_shape_and_prior(self, model_dir):
        conf = Configuration.read(os.path.join(model_dir, "toy.conf"))
        am = AcousticModel.read(conf)
        rng = np.random.RandomState(1)
        feats = rng.randn(50, 40).astype(np.float32)
        out = am.forward(feats)
        assert out.shape == (50, 48)
        # output = log_softmax - log_prior; log-prior of uniform = -log(48)
        row_logsumexp = np.log(np.exp(out + np.log(1.0 / 48)).sum(axis=1))
        np.testing.assert_allclose(row_logsumexp, 0.0, atol=1e-4)

    def test_streaming_equals_batch(self, model_dir):
        """Chunked streaming with L/R padding == whole-utterance forward."""
        conf = Configuration.read(os.path.join(model_dir, "toy.conf"))
        am = AcousticModel.read(conf)
        rng = np.random.RandomState(2)
        feats = rng.randn(53, 40).astype(np.float32)  # not a chunk multiple
        batch = am.forward(feats)

        stream = AMStream(am)
        parts = []
        for i in range(0, 53, 7):  # ragged feed
            parts.append(stream.process(feats[i:i + 7]))
        parts.append(stream.end_of_stream())
        streamed = np.concatenate(parts)
        assert streamed.shape == batch.shape
        np.testing.assert_allclose(streamed, batch, atol=1e-4)

    def test_streaming_short_utterance(self, model_dir):
        """Utterance shorter than one chunk still flushes at EOS."""
        conf = Configuration.read(os.path.join(model_dir, "toy.conf"))
        am = AcousticModel.read(conf)
        feats = np.random.RandomState(3).randn(3, 40).astype(np.float32)
        stream = AMStream(am)
        out1 = stream.process(feats)
        assert out1.shape[0] == 0
        out2 = stream.end_of_stream()
        np.testing.assert_allclose(out2, am.forward(feats), atol=1e-4)
