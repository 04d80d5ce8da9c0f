"""File-enhancement demo: delay-compensated streaming over a WAV file.

Usage:
  python demo/koala_demo_file.py --access_key KEY --input_path noisy.wav \
      --output_path enhanced.wav [--model_path M] [--device best]
      [--show_audio_devices- n/a] [--show_inference_devices]

Reference counterpart: demo/python/koala_demo_file.py (142 LoC) — same
delay-compensation algorithm (run past EOF by delay_sample, trim head,
stop at input_length + delay_sample; reference :96-116) and the same
real-time-factor report as the C demo (demo/c/koala_demo_file.c:500-527).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--access_key", required=False, default="DEMOKEY0DEMOKEY0")
    ap.add_argument("--input_path", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--device", default=None)
    ap.add_argument("--library_path", default=None, help="accepted for parity; unused")
    ap.add_argument("--show_inference_devices", action="store_true")
    ap.add_argument("--batched", action="store_true",
                    help="use the single-call batched path instead of the "
                         "frame-by-frame streaming loop")
    args = ap.parse_args()

    import koala_tpu
    from koala_tpu.io import read_wav, write_wav

    if args.show_inference_devices:
        for d in koala_tpu.available_devices():
            print(d)
        return

    koala = koala_tpu.create(
        access_key=args.access_key,
        model_path=args.model_path,
        device=args.device)

    pcm = read_wav(args.input_path)
    length = len(pcm)
    frame_length = koala.frame_length
    delay_sample = koala.delay_sample

    start_time = time.perf_counter()
    if args.batched:
        enhanced = koala.enhance(pcm)
    else:
        # Frame loop running past EOF by delay_sample, with head-trim —
        # the canonical streaming contract (SURVEY.md §3.4).
        out_chunks = []
        start_sample = 0
        while start_sample < length + delay_sample:
            end_sample = start_sample + frame_length
            frame = np.zeros(frame_length, np.int16)
            src = pcm[start_sample:min(end_sample, length)]
            frame[:len(src)] = src
            out = np.asarray(koala.process(frame.tolist()), np.int16)
            if end_sample > delay_sample:
                if end_sample > length + delay_sample:
                    out = out[:length + delay_sample - start_sample]
                if start_sample < delay_sample:
                    out = out[delay_sample - start_sample:]
                out_chunks.append(out)
            start_sample = end_sample
        enhanced = np.concatenate(out_chunks)
    proc_time = time.perf_counter() - start_time

    write_wav(args.output_path, enhanced)
    audio_time = length / koala.sample_rate
    print("Processed %.3f s of audio in %.3f s" % (audio_time, proc_time))
    print("Real time factor: %.3f" % (proc_time / audio_time))
    koala.delete()


if __name__ == "__main__":
    main()
