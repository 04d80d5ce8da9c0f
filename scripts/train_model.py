"""Train the bundled mask_gru model and write models/koala_params_tpu.pv.

Usage: python scripts/train_model.py [--steps 4000] [--cpu] [--eval-only]

Speech/noise sources default to the reference's bundled fixtures (read-only
mount). The trained model is the framework's default model file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tapes(speech_paths, noise_paths):
    from koala_tpu.io import read_wav
    from koala_tpu.train.data import speed_perturb, synth_noise

    rng = np.random.default_rng(7)
    speech = []
    for p in speech_paths:
        s = read_wav(p).astype(np.float32) / 32768.0
        for f in (0.9, 1.0, 1.1):
            speech.append(speed_perturb(s, f) if f != 1.0 else s)
    speech_tape = np.concatenate(speech)

    noise = [read_wav(p).astype(np.float32) / 32768.0 for p in noise_paths]
    color_len = 30 * 16000
    for color in ("white", "pink", "brown"):
        # unit-RMS colored noise, scaled to a plausible ambient level
        noise.append(synth_noise(rng, color_len, color) * 0.05)
    noise_tape = np.concatenate(noise)
    return speech_tape, noise_tape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--segment-frames", type=int, default=63)
    ap.add_argument("--cpu", action="store_true", help="train on CPU backend")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--init-from", default=None, help="warm-start model file")
    ap.add_argument("--out", default=None)
    ap.add_argument("--speech", nargs="*",
                    default=["/root/reference/resources/audio_samples/test.wav"])
    ap.add_argument("--noise", nargs="*",
                    default=["/root/reference/resources/audio_samples/noise.wav"])
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from koala_tpu.io import read_wav
    from koala_tpu.models import mask_gru, params_io
    from koala_tpu.models.params_io import default_model_path
    from koala_tpu.train.evaluate import evaluate
    from koala_tpu.train.train import train_on_device

    out_path = args.out or default_model_path()
    speech_int16 = read_wav(args.speech[0])
    noise_int16 = read_wav(args.noise[0])

    if not args.eval_only:
        params = None
        cfg = None
        if args.init_from:
            params, cfg = params_io.load_params(args.init_from)
        speech_tape, noise_tape = build_tapes(args.speech, args.noise)
        print("tapes: speech %d samples, noise %d samples"
              % (len(speech_tape), len(noise_tape)), flush=True)
        params, cfg = train_on_device(
            speech_tape, noise_tape,
            steps=args.steps, batch=args.batch, lr=args.lr, seed=args.seed,
            segment_frames=args.segment_frames, config=cfg, params=params)
        params = __import__("jax").device_get(params)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        params_io.save_params(out_path, params, cfg)
        print("saved", out_path, "(%d bytes)" % os.path.getsize(out_path))

    params, cfg = params_io.load_params(out_path)
    # Evaluate on the CPU backend for stable numerics/latency.
    import jax
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        results = evaluate(params, cfg, np.asarray(speech_int16),
                           np.asarray(noise_int16))
    for k, v in results.items():
        print("%-22s %.4f" % (k, v))
    ok = (results["dev_pure_speech"] < 0.02 and results["dev_pure_noise"] < 0.02
          and results["dev_mixed"] < 0.02)
    print("HARNESS:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
