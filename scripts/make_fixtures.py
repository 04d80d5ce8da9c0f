"""Generate the repo's own audio fixtures (resources/audio_samples/).

The reference ships two 5.855 s WAVs (clean speech + noise) that its tests
mix; we do not copy them. Ours are drawn from the same synthesis family as
the training corpus (koala_tpu.train.corpus) but with DEDICATED seeds that
never appear in the training tapes or the dev battery — they are
acceptance-test material (no train-on-test).

History: the original fixtures came from a cruder AM-gated harmonic
synthesizer. That family was removed from the task entirely — an AM-gated
harmonic stack is the literal definition of the "am"/"tonal" NOISE
classes, so using it as speech made the speech/noise boundary
ill-defined. Fixtures are now Klatt-family speech + a noise-family clip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from koala_tpu.constants import SAMPLE_RATE
from koala_tpu.io import write_wav

DURATION_S = 5.855
N = int(DURATION_S * SAMPLE_RATE)

SPEECH_SEED = 7000   # disjoint from train (100/200) and dev battery (9xxx)
NOISE_SEED = 7100


def synth_speech(rng: np.random.Generator) -> np.ndarray:
    from koala_tpu.train.corpus import build_speech_tape

    x = build_speech_tape(SPEECH_SEED, 2, dur_range=(3.0, 3.2))[:N]
    return np.round(np.clip(x, -1, 1) * 32767).astype(np.int16)


def synth_noise(rng: np.random.Generator) -> np.ndarray:
    from koala_tpu.train.corpus import synth_noise_clip

    # Same difficulty calibration as the dev battery (scripts/make_corpus.py):
    # reference noise.wav profile — overall RMS 0.023, max frame RMS 0.06.
    x = synth_noise_clip(np.random.default_rng(NOISE_SEED),
                         DURATION_S, "colored") * 0.023
    fr = x[:len(x) // 256 * 256].reshape(-1, 256)
    worst = float(np.sqrt((fr * fr).mean(axis=1)).max())
    if worst > 0.06:
        x = x * (0.06 / worst)
    return np.round(np.clip(x, -1, 1) * 32767).astype(np.int16)


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
