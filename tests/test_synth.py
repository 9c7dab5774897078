"""Trained-acoustics realism pipeline (tools.synth + scripts/realism.py).

Small-scale end-to-end check: synthesize formant-like phone audio for a
trie graph, train the TDNN on (own-fbank, pdf-label) pairs, and decode
fresh synthetic utterances through the FULL wave -> fbank -> AM -> WFST
pipeline — the decode must recover most of the spoken words from audio
alone (no planted likelihoods anywhere).
"""

import numpy as np
import pytest

from catears_tpu.tools.biggraph import make_trie_graph
from catears_tpu.tools.synth import (
    Synthesizer,
    empirical_prior,
    fbank_labels,
    train_am,
    write_trained_model,
)
from catears_tpu.tools.toy import make_toy_nnet

NUM_PHONES, VARIANTS = 20, 1


@pytest.fixture(scope="module")
def trained():
    rng = np.random.RandomState(0)
    g = make_trie_graph(rng, num_words=60, num_phones=NUM_PHONES,
                        variants=VARIANTS, bigram_states=15,
                        phones_per_word=(3, 5))
    synth = Synthesizer(g, NUM_PHONES, VARIANTS, rng)
    spec = make_toy_nnet(rng, hidden=64, num_pdfs=g.num_pdfs,
                         num_tdnn_layers=2)
    left, right = spec.left_context, spec.right_context

    from catears_tpu.frontend.fbank import fbank_from_wave, num_frames
    import jax.numpy as jnp

    data, labels_all = [], []
    for _ in range(24):
        s, t, _ = synth.utterance(rng, 300)
        nf = num_frames(s.shape[0])
        f = np.asarray(fbank_from_wave(jnp.asarray(s), nf))
        lab = fbank_labels(t, nf)
        labels_all.append(lab)
        data.append((f, lab[left:nf - right]))
    spec2, acc = train_am(spec, data, steps=800, batch=8)
    prior = empirical_prior(labels_all, g.num_pdfs)
    return g, synth, spec2, prior, acc


def test_trains_to_usable_accuracy(trained):
    _, _, _, _, acc = trained
    # 60 pdfs, distinct formant signatures: far above chance, below
    # perfect (boundary frames + noise stay confusable).
    assert acc > 0.5, acc


def test_decodes_spoken_words_from_audio(trained, tmp_path):
    from catears_tpu.decode.beam import BeamConfig
    from catears_tpu.runtime.recognizer import Recognizer, decode_wav_file
    from catears_tpu.tools.score import edit_distance
    from catears_tpu.tools.synth import write_wav

    g, synth, spec2, prior, _ = trained
    our_conf, _ = write_trained_model(str(tmp_path), g, spec2, prior)
    cfg = BeamConfig(beam_size=512, expand_size=4096, eps_expand_size=2048,
                     max_eps_iters=3)
    rec = Recognizer(our_conf, beam_config=cfg)
    rng = np.random.RandomState(77)
    errs = ref_len = 0
    for i in range(3):
        s, _, words = synth.utterance(rng, 300)
        wav = tmp_path / f"t{i}.wav"
        write_wav(str(wav), s)
        hyp = decode_wav_file(rec, str(wav)).split()
        truth = [f"word{w}" for w in words]
        errs += edit_distance(truth, hyp)[0]
        ref_len += len(truth)
    wer = errs / max(1, ref_len)
    # Real acoustics through the full pipeline: the spoken words are
    # recovered from audio alone (20 fully-distinct phone signatures at
    # this scale — headline-scale confusability is scripts/realism.py).
    assert wer < 0.15, wer
