"""Trainer subsystem tests: samplers, losses, and a short CPU train run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from koala_tpu.constants import DELAY_SAMPLE, FRAME_LENGTH
from koala_tpu.train.data import MixtureSampler, speed_perturb, synth_noise
from koala_tpu.train.device_sampler import DeviceSampler
from koala_tpu.train.train import delayed, make_loss_fn, snr_loss


@pytest.fixture(scope="module")
def banks(request):
    rng = np.random.default_rng(0)
    speech = [np.sin(np.linspace(0, 700 * np.pi, 20000)).astype(np.float32) * 0.3]
    noise = [rng.standard_normal(20000).astype(np.float32) * 0.05]
    return speech, noise


def test_speed_perturb_lengths():
    x = np.arange(1000, dtype=np.float32)
    assert len(speed_perturb(x, 0.9)) > len(x)
    assert len(speed_perturb(x, 1.1)) < len(x)
    np.testing.assert_allclose(speed_perturb(x, 1.0), x)


def test_synth_noise_unit_rms(rng):
    for color in ("white", "pink", "brown"):
        n = synth_noise(rng, 16000, color)
        assert abs(np.sqrt(np.mean(n ** 2)) - 1.0) < 1e-3


def test_mixture_sampler_shapes_and_range(banks):
    speech, noise = banks
    sampler = MixtureSampler(speech, noise, segment_frames=10, seed=1)
    noisy, clean = sampler.sample(16)
    assert noisy.shape == clean.shape == (16, 10 * FRAME_LENGTH)
    assert np.max(np.abs(noisy)) <= 1.0


def test_device_sampler_matches_distribution(banks):
    speech, noise = banks
    seg = 8 * FRAME_LENGTH
    ds = DeviceSampler(jnp.asarray(np.concatenate(speech)),
                       jnp.asarray(np.concatenate(noise)), seg)
    noisy, clean = jax.jit(lambda k: ds.sample(k, 32))(jax.random.PRNGKey(0))
    noisy, clean = np.asarray(noisy), np.asarray(clean)
    assert noisy.shape == clean.shape == (32, seg)
    assert np.isfinite(noisy).all() and np.isfinite(clean).all()
    # some examples must be exact speech-only passthrough (noisy == clean != 0)
    same = [(noisy[i] == clean[i]).all() and np.abs(clean[i]).max() > 0
            for i in range(32)]
    # and some mixtures (noisy != clean, clean != 0)
    mixed = [not (noisy[i] == clean[i]).all() and np.abs(clean[i]).max() > 0
             for i in range(32)]
    assert any(same) and any(mixed)


def test_delayed_alignment():
    x = jnp.arange(1000, dtype=jnp.float32)[None, :]
    d = delayed(x)
    assert d.shape == x.shape
    np.testing.assert_array_equal(np.asarray(d[0, :DELAY_SAMPLE]), 0.0)
    np.testing.assert_array_equal(np.asarray(d[0, DELAY_SAMPLE:]),
                                  np.asarray(x[0, :-DELAY_SAMPLE]))


def test_snr_loss_basics():
    ref = jnp.ones((2, 1000))
    assert float(snr_loss(ref, ref)) < -80.0        # perfect -> very negative
    assert float(snr_loss(ref * 0.0, ref)) > -1.0   # silence estimate -> ~0 dB
    # silent reference: loss decreases as estimate approaches silence
    noisy_est = jnp.ones((2, 1000)) * 0.5
    silent_ref = jnp.zeros((2, 1000))
    assert float(snr_loss(noisy_est, silent_ref)) > float(
        snr_loss(noisy_est * 1e-4, silent_ref))


def test_short_training_improves_loss(banks):
    """A few optimizer steps on CPU must reduce the loss."""
    import optax

    from koala_tpu.models import mask_gru
    from koala_tpu.train.train import make_train_step

    speech, noise = banks
    cfg = dict(mask_gru.DEFAULT_CONFIG)
    params = mask_gru.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer)
    sampler = MixtureSampler(speech, noise, segment_frames=8, seed=2)

    noisy, clean = sampler.sample(8)
    first = None
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, noisy, clean)
        if first is None:
            first = float(loss)
    assert float(loss) < first
