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


def test_stft_pair_matches_concat_frame(rng):
    """The hop-split analysis form (engine hot path: no [.., 512] concat)
    must match the windowed full-frame DFT."""
    prev = rng.standard_normal((3, 5, FRAME_LENGTH)).astype(np.float32)
    cur = rng.standard_normal((3, 5, FRAME_LENGTH)).astype(np.float32)
    re_s, im_s = stft_ops.stft_pair(jnp.asarray(prev), jnp.asarray(cur))
    frames = jnp.concatenate([jnp.asarray(prev), jnp.asarray(cur)], axis=-1)
    re_f, im_f = stft_ops.stft_frame(frames)
    np.testing.assert_allclose(np.asarray(re_s), np.asarray(re_f),
                               atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(im_s), np.asarray(im_f),
                               atol=1e-3, rtol=1e-5)


def test_istft_halves_match_full_synth(rng):
    """The head/tail synthesis split must equal the two hop-halves of the
    windowed full synthesis frame (bit-exact per element: the split is by
    output column, so each sample's contraction is unchanged)."""
    re = rng.standard_normal((4, NUM_BINS)).astype(np.float32)
    im = rng.standard_normal((4, NUM_BINS)).astype(np.float32)
    head, tail = stft_ops.istft_halves(jnp.asarray(re), jnp.asarray(im))
    full = stft_ops.istft_frame(jnp.asarray(re), jnp.asarray(im))
    np.testing.assert_allclose(np.asarray(head),
                               np.asarray(full)[..., :FRAME_LENGTH],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tail),
                               np.asarray(full)[..., FRAME_LENGTH:],
                               atol=1e-5, rtol=1e-5)
