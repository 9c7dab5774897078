"""Fused Pallas fbank kernel: window -> DFT -> power -> mel -> log.

One kernel per 128-frame tile does the whole per-frame chain in VMEM:
DC removal, pre-emphasis, Hamming window, the real-DFT matmul (MXU), the
power spectrum, the mel filterbank matmul (MXU) and the floored log — no
HBM round trips between stages (reference srfft+fbank chain, src/srfft.cc
+ src/fbank.cc).

Measured on TPU v5e the fused kernel matches the XLA path's speed
(~0.7 ms / 1000 frames — XLA already fuses this chain well), with ~6e-4
max log-domain deviation from different matmul padding/accumulation order.
The XLA path stays the default (it carries the 1e-4 Kaldi golden parity);
this kernel is the hand-scheduled variant and the template for future
frontend fusion work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from catears_tpu.frontend.fbank import (
    FLT_EPSILON,
    FRAME_LENGTH,
    NUM_BINS,
    NUM_FFT_BINS,
    PREEMPH_COEFF,
    _constants,
)

TILE = 128


PAD_LEN = 512  # frame samples padded to a lane-aligned width
OUT_PAD = 128  # mel outputs padded to one lane group


@functools.lru_cache(maxsize=None)
def _kernel_constants():
    """(hamming [512], dft [512, 512], mel [256, 128]) float32, lane-aligned.

    The nyquist bin (index 256) carries zero mel weight (Kaldi computes mel
    over fft bins [0, 256)), so the kernel drops it: 256 re + 256 im DFT
    columns.  All tiles are padded with zeros to 128-multiples so Mosaic
    sees aligned shapes; the zero padding is numerically inert.
    """
    hamming, dft, mel = _constants()
    n_re = NUM_FFT_BINS  # 256
    re = dft[:, :n_re]  # drop bin 256 from the 257 re columns
    im = dft[:, NUM_FFT_BINS + 1:NUM_FFT_BINS + 1 + n_re]
    dft2 = np.zeros((PAD_LEN, 2 * n_re), np.float32)
    dft2[:FRAME_LENGTH] = np.concatenate([re, im], axis=1)
    hamming_pad = np.zeros(PAD_LEN, np.float32)
    hamming_pad[:FRAME_LENGTH] = hamming
    mel_pad = np.zeros((n_re, OUT_PAD), np.float32)
    mel_pad[:, :NUM_BINS] = mel[:n_re]
    return hamming_pad, dft2, mel_pad


def _fbank_kernel(frames_ref, hamming_ref, dft_ref, mel_ref, out_ref):
    from jax.experimental.pallas import tpu as pltpu

    x = frames_ref[:]  # [TILE, 512]; cols >= 400 are zero
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    in_frame = col < FRAME_LENGTH
    mean = jnp.sum(x, axis=1, keepdims=True) * (1.0 / FRAME_LENGTH)
    x = jnp.where(in_frame, x - mean, 0.0)
    prev = pltpu.roll(x, 1, axis=1)
    prev = jnp.where(col == 0, x, prev)  # x[0] uses itself as predecessor
    x = (x - PREEMPH_COEFF * prev) * hamming_ref[:]
    spec = jnp.dot(x, dft_ref[:], preferred_element_type=jnp.float32)
    re = spec[:, :NUM_FFT_BINS]
    im = spec[:, NUM_FFT_BINS:]
    power = re * re + im * im
    energies = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    # Padded mel columns are all-zero -> log(eps); sliced off by the caller
    out_ref[:] = jnp.log(jnp.maximum(energies, FLT_EPSILON))


def fbank_from_frames_pallas(frames: jnp.ndarray,
                             interpret: bool = None) -> jnp.ndarray:
    """[T, 400] raw sample frames -> [T, 40] log-mel features (fused)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    hamming, dft2, mel = (jnp.asarray(c) for c in _kernel_constants())
    t = frames.shape[0]
    t_pad = -(-t // TILE) * TILE
    frames = jnp.pad(frames, ((0, t_pad - t),
                              (0, PAD_LEN - frames.shape[1])))
    out = pl.pallas_call(
        _fbank_kernel,
        grid=(t_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, PAD_LEN), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, OUT_PAD), jnp.float32),
        interpret=interpret,
    )(frames, hamming, dft2, mel)
    return out[:t, :NUM_BINS]
