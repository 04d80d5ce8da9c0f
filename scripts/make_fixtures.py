"""Generate the repo's own audio fixtures (resources/audio_samples/).

The reference ships two 5.855 s WAVs (clean speech + noise) that its tests
mix; we do not copy them. Instead this script synthesizes a speech-like
fixture (glottal-pulse harmonics through time-varying formant-ish AM, with
word/sentence pauses) and a noise fixture (pink + babble-ish modulated
noise) with matched length/level, so the full test suite can run without
the reference checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from koala_tpu.constants import SAMPLE_RATE
from koala_tpu.io import write_wav

DURATION_S = 5.855
N = int(DURATION_S * SAMPLE_RATE)


def synth_speech(rng: np.random.Generator) -> np.ndarray:
    t = np.arange(N) / SAMPLE_RATE
    # pitch contour: 110-180 Hz wandering
    f0 = 140 + 30 * np.sin(2 * np.pi * 0.4 * t) + 10 * np.sin(2 * np.pi * 1.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SAMPLE_RATE
    voiced = np.zeros(N)
    for k, amp in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (5, 0.2), (6, 0.12),
                   (8, 0.08), (10, 0.05)):
        voiced += amp * np.sin(k * phase + 0.1 * k)
    # formant-ish coloration via slow AM of harmonic groups
    voiced *= 1.0 + 0.35 * np.sin(2 * np.pi * 2.1 * t + 1.0)
    # syllable envelope (4 Hz) and word/sentence gating
    syllable = 0.55 + 0.45 * np.sin(2 * np.pi * 3.7 * t) ** 2
    gate = np.ones(N)
    pos = 0
    while pos < N:
        word = int(rng.uniform(0.25, 0.8) * SAMPLE_RATE)
        pause = int(rng.uniform(0.08, 0.35) * SAMPLE_RATE)
        gate[pos + word:pos + word + pause] = 0.0
        pos += word + pause
    # smooth the gate edges (10 ms ramps)
    ramp = np.hanning(321)
    gate = np.convolve(gate, ramp / ramp.sum(), mode="same")
    # unvoiced bursts at some word onsets
    fric = rng.standard_normal(N) * 0.15
    fric_env = (np.convolve((np.diff(gate, prepend=0) > 0.002).astype(float),
                            np.hanning(800), mode="same"))
    x = voiced * syllable * gate + fric * fric_env
    x = x / np.max(np.abs(x)) * 0.35
    return np.round(x * 32767).astype(np.int16)


def synth_noise(rng: np.random.Generator) -> np.ndarray:
    w = rng.standard_normal(N)
    spec = np.fft.rfft(w)
    freq = np.maximum(np.fft.rfftfreq(N), 1.0 / N)
    pink = np.fft.irfft(spec / freq ** 0.5, N)
    # slow amplitude modulation so the noise is non-stationary
    t = np.arange(N) / SAMPLE_RATE
    am = 1.0 + 0.3 * np.sin(2 * np.pi * 0.7 * t) + 0.2 * np.sin(2 * np.pi * 2.9 * t)
    x = pink * am
    x = x / np.max(np.abs(x)) * 0.22
    return np.round(x * 32767).astype(np.int16)


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "resources", "audio_samples")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260817)
    write_wav(os.path.join(out_dir, "speech_synth.wav"), synth_speech(rng))
    write_wav(os.path.join(out_dir, "noise_synth.wav"), synth_noise(rng))
    print("wrote fixtures to", out_dir)


if __name__ == "__main__":
    main()
