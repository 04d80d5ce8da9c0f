"""Acceptance parity tests against the reference's behavioral contract,
using the bundled trained model and the reference's own audio fixtures.

These are the reference's three energy-parity cases at its 0.02 RMS
tolerance (binding/python/test_koala.py:71-114) plus an SI-SDR improvement
gate (BASELINE.json metric). Skipped when the trained model or the
reference fixtures are unavailable.
"""

import numpy as np
import pytest

from koala_tpu.models import params_io
from koala_tpu.train.evaluate import evaluate, rms_case, si_sdr


@pytest.fixture(scope="module")
def results(trained_model, speech_pcm, noise_pcm):
    params, cfg = params_io.load_params(trained_model)
    return evaluate(params, cfg, np.asarray(speech_pcm), np.asarray(noise_pcm))


def test_pure_speech_energy_parity(results):
    assert results["dev_pure_speech"] < 0.02, results


def test_pure_noise_suppressed(results):
    assert results["dev_pure_noise"] < 0.02, results


def test_mixed_recovers_speech_energy(results):
    assert results["dev_mixed"] < 0.02, results


def test_si_sdr_improvement(results):
    assert results["si_sdr_gain_db"] > 3.0, results
    assert results["si_sdr_mixed_db"] > 12.0, results


@pytest.fixture(scope="module")
def heldout_results(trained_model):
    """Held-out synthetic dev fixtures (speech_dev/noise_dev, fresh-seed
    draws from the corpus family; NEVER in the training tapes — see
    scripts/make_corpus.py). Guards against train-on-test: the bundled
    model must generalize, not memorize (VERDICT round-1 missing #1)."""
    import os

    from koala_tpu.io import read_wav

    samples = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "resources", "audio_samples")
    sp = os.path.join(samples, "speech_dev.wav")
    no = os.path.join(samples, "noise_dev.wav")
    if not (os.path.exists(sp) and os.path.exists(no)):
        pytest.skip("held-out dev fixtures missing")
    params, cfg = params_io.load_params(trained_model)
    return evaluate(params, cfg, read_wav(sp), read_wav(no))


def test_heldout_energy_parity(heldout_results):
    assert heldout_results["dev_pure_speech"] < 0.02, heldout_results
    assert heldout_results["dev_pure_noise"] < 0.02, heldout_results
    assert heldout_results["dev_mixed"] < 0.02, heldout_results


def test_heldout_si_sdr_gain(heldout_results):
    assert heldout_results["si_sdr_gain_db"] > 8.0, heldout_results


def test_heldout_stoi_improvement(heldout_results):
    """Intelligibility metric gate (STOI, the open PESQ stand-in per
    BASELINE.json 'SI-SDR/PESQ parity'; see koala_tpu/train/stoi.py)."""
    assert (heldout_results["stoi_mixed"]
            > heldout_results["stoi_input"] + 0.05), heldout_results


def test_streaming_api_matches_harness(trained_model, speech_pcm, access_key):
    """The public frame-by-frame API reproduces the pure-speech case."""
    import koala_tpu

    k = koala_tpu.create(access_key, model_path=trained_model)
    speech = np.asarray(speech_pcm)
    out = []
    for start in range(0, len(speech) - k.frame_length + 1, k.frame_length):
        out.append(k.process(speech[start:start + k.frame_length].tolist()))
    enhanced = np.concatenate([np.asarray(o, np.int16) for o in out])
    k.delete()
    assert rms_case(enhanced, speech) < 0.02
