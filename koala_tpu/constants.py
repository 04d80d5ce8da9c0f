"""Engine constants for the TPU-native Koala-class noise suppressor.

Contract values mirror the reference engine's measured behavior
(reference: include/pv_koala.h:103-107, pv_sample_rate()==16000,
pv_koala_frame_length()==256 measured from lib/linux/x86_64/libpv_koala.so):

- 16 kHz mono, 16-bit linear PCM.
- One frame = 256 samples = 16 ms.
- Fixed output delay in samples, reported via ``delay_sample``.

The DSP geometry (FFT size, hop, window) is our own TPU-first design and is
NOT taken from the reference (whose engine is a closed binary): a 512-point
DFT realized as a matmul against a precomputed real/imag basis so the hot
path runs on the MXU, 50% overlap with a sqrt-Hann window giving perfect
reconstruction and an algorithmic delay of exactly one hop (256 samples).
"""

SAMPLE_RATE = 16000
FRAME_LENGTH = 256          # samples per process() call (= STFT hop)
FFT_SIZE = 512              # analysis window length (2 hops, 50% overlap)
NUM_BINS = FFT_SIZE // 2 + 1  # 257 rfft bins
DELAY_SAMPLE = FRAME_LENGTH   # algorithmic latency of the 50%-overlap OLA

PCM_SCALE = 32768.0         # int16 <-> float fullscale convention
                            # (matches RMS convention in reference
                            # binding/python/test_koala.py:64-69)

# Magic header for our model parameter files (reference uses
# `koala_params.pv` with magic "koala3.0.0"; ours is a distinct format).
MODEL_MAGIC = b"KOALATPU1\x00"
