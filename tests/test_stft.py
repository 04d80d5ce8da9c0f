"""DSP core tests: DFT-matmul correctness and perfect reconstruction."""

import numpy as np
import pytest

import jax.numpy as jnp

from koala_tpu.constants import FFT_SIZE, FRAME_LENGTH, NUM_BINS
from koala_tpu.ops import stft as stft_ops


def test_dft_matches_numpy_rfft(rng):
    x = rng.standard_normal((4, FFT_SIZE)).astype(np.float32)
    re, im = stft_ops.stft_frame(jnp.asarray(x), windowed=False)
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-2, rtol=1e-4)


def test_inverse_dft_roundtrip(rng):
    x = rng.standard_normal((4, FFT_SIZE)).astype(np.float32)
    re, im = stft_ops.stft_frame(jnp.asarray(x), windowed=False)
    y = stft_ops.istft_frame(re, im, windowed=False)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_window_cola():
    w = np.asarray(stft_ops.analysis_window())
    overlap_sum = w[:FRAME_LENGTH] ** 2 + w[FRAME_LENGTH:] ** 2
    np.testing.assert_allclose(overlap_sum, 1.0, atol=1e-6)


def test_frame_signal_shapes(rng):
    t = 7
    x = rng.standard_normal((3, t * FRAME_LENGTH)).astype(np.float32)
    frames = stft_ops.frame_signal(jnp.asarray(x))
    assert frames.shape == (3, t, FFT_SIZE)
    # frame 0's left half is the zero carry; right half is hop 0
    np.testing.assert_array_equal(np.asarray(frames[:, 0, :FRAME_LENGTH]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(frames[:, 0, FRAME_LENGTH:]), x[:, :FRAME_LENGTH])
    # frame 2 covers hops 1 and 2
    np.testing.assert_array_equal(
        np.asarray(frames[:, 2]), x[:, FRAME_LENGTH:3 * FRAME_LENGTH])


def test_perfect_reconstruction_delay_one_hop(rng):
    """Analysis -> unit mask -> synthesis must reproduce the input delayed by
    exactly FRAME_LENGTH samples (the engine's delay_sample contract)."""
    t = 12
    x = rng.standard_normal((2, t * FRAME_LENGTH)).astype(np.float32)
    frames = stft_ops.frame_signal(jnp.asarray(x))
    re, im = stft_ops.stft_frame(frames)
    synth = stft_ops.istft_frame(re, im)
    y = np.asarray(stft_ops.overlap_add(synth))
    assert y.shape == x.shape
    # output hop 0 is the (windowed-zeros) warmup; hops 1.. reproduce input
    np.testing.assert_allclose(
        y[:, FRAME_LENGTH:], x[:, : (t - 1) * FRAME_LENGTH], atol=1e-4)
