"""Batched offline enhancement demo (BASELINE.json config 3): enhance many
WAV files as one batch of concurrent streams on one device.

Usage:
  python demo/koala_demo_batch.py --input_dir noisy/ --output_dir clean/ \
      [--batch 256] [--device best]

Files are padded to the longest utterance in each batch, enhanced in a
single delay-compensated device call per batch, and trimmed back to their
original lengths. Throughput (audio-seconds per second) is reported.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--access_key", default="DEMOKEY0DEMOKEY0")
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--device", default=None)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import koala_tpu
    from koala_tpu.io import read_wav, write_wav

    paths = sorted(glob.glob(os.path.join(args.input_dir, "*.wav")))
    if not paths:
        print("no WAV files in", args.input_dir)
        sys.exit(1)
    os.makedirs(args.output_dir, exist_ok=True)

    total_audio = 0.0
    start = time.perf_counter()
    pool = None
    for i in range(0, len(paths), args.batch):
        group = paths[i:i + args.batch]
        pcms = [read_wav(p) for p in group]
        longest = max(len(p) for p in pcms)
        batch = np.zeros((len(group), longest), np.int16)
        for j, p in enumerate(pcms):
            batch[j, :len(p)] = p

        if pool is None or pool.batch_size != len(group):
            if pool is not None:
                pool.delete()
            pool = koala_tpu.create_batch(
                args.access_key, batch_size=len(group),
                model_path=args.model_path, device=args.device)
        else:
            pool.reset()

        enhanced = pool.enhance(batch)
        for j, p in enumerate(group):
            out_path = os.path.join(args.output_dir, os.path.basename(p))
            write_wav(out_path, enhanced[j, :len(pcms[j])])
        total_audio += sum(len(p) for p in pcms) / koala_tpu.SAMPLE_RATE
        print("batch %d: %d files" % (i // args.batch, len(group)), flush=True)

    elapsed = time.perf_counter() - start
    if pool is not None:
        pool.delete()
    print("Enhanced %.1f s of audio in %.2f s  (%.0fx real-time)"
          % (total_audio, elapsed, total_audio / elapsed))


if __name__ == "__main__":
    main()
