"""Mesh parallelism tests on the 8-device virtual CPU mesh.

Sharded (dp x tp) execution must produce the same log-probs and decode
results as unsharded single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catears_tpu.decode.beam import BeamConfig, decode_chunk, init_beam_batch
from catears_tpu.frontend.fbank import num_frames
from catears_tpu.graph.device import DeviceFst
from catears_tpu.graph.fst import FlatFst
from catears_tpu.parallel.mesh import ShardedPipeline, make_mesh
from catears_tpu.am.model import AcousticModel
from catears_tpu.am.nnet import build_nnet
from catears_tpu.tools.toy import make_phone_loop_graph, make_toy_nnet

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    num_pdfs = 32
    graph = make_phone_loop_graph(rng, num_words=6, num_pdfs=num_pdfs)
    nnet = make_toy_nnet(rng, hidden=64, num_pdfs=num_pdfs)
    nnet_def, params = build_nnet(nnet)
    prior = np.full(num_pdfs, 1.0 / num_pdfs, np.float32)
    am = AcousticModel(nnet_def, params, np.log(prior), graph.tid2pdf,
                       nnet.left_context, nnet.right_context, 8, num_pdfs)
    fst = FlatFst.from_raw(graph.fst)
    dfst = DeviceFst.build(fst, graph.tid2pdf)
    cfg = BeamConfig(beam_size=64, expand_size=512, eps_expand_size=256,
                     max_eps_iters=3)
    return am, fst, dfst, cfg


class TestShardedPipeline:
    @pytest.mark.parametrize("model_parallel", [1, 2])
    def test_sharded_equals_unsharded(self, setup, model_parallel):
        am, fst, dfst, cfg = setup
        mesh = make_mesh(8, model_parallel=model_parallel)
        pipe = ShardedPipeline(am, dfst, None, cfg, mesh)
        batch = 8
        samples = 4000
        t = num_frames(samples)
        rng = np.random.RandomState(1)
        wave_np = (rng.randn(batch, samples) * 1000).astype(np.float32)
        wave = jax.device_put(jnp.asarray(wave_np), pipe.data_sharding)
        beam = pipe.make_beam(batch)
        with mesh:
            step = pipe.jit_full_step(t)
            logp, beam_out, traces = step(wave, beam)
            logp = np.asarray(logp)
            costs = np.asarray(beam_out.costs)
            states = np.asarray(beam_out.states)

        # Unsharded reference on device 0
        ref_logps = np.stack([am.forward(
            np.asarray(jnp.asarray(
                __import__("catears_tpu.frontend.fbank",
                           fromlist=["fbank_from_wave"]).fbank_from_wave(
                    jnp.asarray(wave_np[i]), t))))
            for i in range(batch)])
        np.testing.assert_allclose(logp, ref_logps, atol=2e-4)

        beam_ref, _ = init_beam_batch(cfg, False, batch, dfst, None)
        logp_t = jnp.asarray(np.transpose(ref_logps, (1, 0, 2)))
        valid = jnp.ones((t, batch), bool)
        beam_ref, _ = decode_chunk(cfg, False, dfst, None, beam_ref, logp_t,
                                   valid)
        np.testing.assert_array_equal(states, np.asarray(beam_ref.states))
        np.testing.assert_allclose(costs, np.asarray(beam_ref.costs),
                                   atol=1e-3)

    def test_sharded_ragged_lengths(self, setup):
        """Ragged batches through ShardedPipeline.full_step: utterance b
        decodes exactly lengths[b] frames, matching the unsharded
        ragged decode bit-for-bit."""
        am, fst, dfst, cfg = setup
        mesh = make_mesh(4, model_parallel=1)
        pipe = ShardedPipeline(am, dfst, None, cfg, mesh)
        batch, samples = 4, 4000
        t = num_frames(samples)
        rng = np.random.RandomState(3)
        wave_np = (rng.randn(batch, samples) * 1000).astype(np.float32)
        lengths_np = np.array([t, t // 2, t - 1, 3], np.int32)
        wave = jax.device_put(jnp.asarray(wave_np), pipe.data_sharding)
        lens = jax.device_put(jnp.asarray(lengths_np), pipe.data_sharding)
        beam = pipe.make_beam(batch)
        with mesh:
            step = pipe.jit_full_step(t)
            logp, beam_out, _ = step(wave, beam, lens)
            costs = np.asarray(beam_out.costs)
            states = np.asarray(beam_out.states)

        from catears_tpu.frontend.fbank import fbank_from_wave
        ref_logps = np.stack([am.forward(np.asarray(
            fbank_from_wave(jnp.asarray(wave_np[i]), t)))
            for i in range(batch)])
        beam_ref, _ = init_beam_batch(cfg, False, batch, dfst, None)
        logp_t = jnp.asarray(np.transpose(ref_logps, (1, 0, 2)))
        valid = jnp.asarray(np.arange(t)[:, None] < lengths_np[None, :])
        beam_ref, _ = decode_chunk(cfg, False, dfst, None, beam_ref,
                                   logp_t, valid)
        np.testing.assert_array_equal(states, np.asarray(beam_ref.states))
        np.testing.assert_allclose(costs, np.asarray(beam_ref.costs),
                                   atol=1e-3)
