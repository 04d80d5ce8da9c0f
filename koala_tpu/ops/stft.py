"""STFT analysis / iSTFT overlap-add synthesis, TPU-first.

Design notes (not taken from the reference, whose DSP lives inside a closed
binary — see SURVEY.md §1 L0):

- The short real DFT (512-point) is realized as **matmuls against a
  precomputed cos/sin basis** instead of an FFT: a [*, 512] @ [512, 257]
  contraction maps straight onto the MXU systolic array, fuses with the
  windowing and with the model's encoder matmul under XLA, and has no
  bit-reversal/permutation stages that fragment TPU vector layout. At these
  sizes (512-point, thousands of concurrent frames) the O(N^2)-as-matmul
  formulation is faster on TPU than the O(N log N) FFT because the MXU
  delivers ~100x the VPU's FLOPs and the basis stays resident in VMEM.

- Geometry: FFT_SIZE=512, hop=FRAME_LENGTH=256 (50% overlap), sqrt-Hann
  window on both analysis and synthesis. Periodic Hann at 50% overlap
  satisfies COLA exactly: w[n]^2 + w[n+256]^2 == 1, giving perfect
  reconstruction with an algorithmic delay of exactly one hop
  (DELAY_SAMPLE=256 samples), which is the engine's reported
  ``delay_sample`` (reference contract: include/pv_koala.h:93-100).

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

from ..constants import FFT_SIZE, FRAME_LENGTH, NUM_BINS

# MXU precision for the DFT matmuls. "default" (the default) = single-pass
# bf16 — the fastest MXU path; measured on the reference fixture mix it is
# quality-neutral (SI-SDR 16.126 vs 16.125 dB at "high", RMS-harness
# deviation unchanged) because the ~0.4% relative spectral error sits
# ~45 dB below the signal, far inside the 0.02 RMS tolerance. "high" =
# 3-pass bf16 (f32-equivalent accuracy, ~3x DFT cost); "highest" = true
# f32. CPU backends compute full f32 regardless, so tests are unaffected.
DFT_PRECISION = os.environ.get("KOALA_STFT_PRECISION", "default")


@functools.lru_cache(maxsize=None)
def _numpy_basis(fft_size: int):
    """Forward/inverse real-DFT bases, built in float64 then cast.

    Forward:  X_k = sum_n x_n e^{-2πi kn/N}  for k in [0, N/2]
      re = x @ FWD_RE,  im = x @ FWD_IM          (FWD_* : [N, K])
    Inverse:  x_n = (1/N) sum_k c_k (Re X_k cos - Im X_k sin)
      x = re @ INV_RE + im @ INV_IM              (INV_* : [K, N])
    with c_k = 1 for k in {0, N/2} and 2 otherwise.
    """
    n = np.arange(fft_size)[:, None].astype(np.float64)
    k = np.arange(fft_size // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / fft_size
    fwd_re = np.cos(ang)
    fwd_im = -np.sin(ang)
    coef = np.full((fft_size // 2 + 1,), 2.0)
    coef[0] = 1.0
    coef[-1] = 1.0
    inv_re = (coef[:, None] * np.cos(ang).T) / fft_size
    inv_im = (coef[:, None] * -np.sin(ang).T) / fft_size
    return (
        fwd_re.astype(np.float32),
        fwd_im.astype(np.float32),
        inv_re.astype(np.float32),
        inv_im.astype(np.float32),
    )


def dft_matrices(fft_size: int = FFT_SIZE):
    """Return (fwd_re[N,K], fwd_im[N,K], inv_re[K,N], inv_im[K,N]) as jnp f32."""
    fwd_re, fwd_im, inv_re, inv_im = _numpy_basis(fft_size)
    return (jnp.asarray(fwd_re), jnp.asarray(fwd_im),
            jnp.asarray(inv_re), jnp.asarray(inv_im))


@functools.lru_cache(maxsize=None)
def _numpy_window(fft_size: int):
    # periodic Hann, sqrt for analysis+synthesis split
    n = np.arange(fft_size).astype(np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / fft_size)
    return np.sqrt(hann).astype(np.float32)


def analysis_window(fft_size: int = FFT_SIZE) -> jnp.ndarray:
    """sqrt-Hann window used for both analysis and synthesis."""
    return jnp.asarray(_numpy_window(fft_size))


@functools.lru_cache(maxsize=None)
def _windowed_bases(fft_size: int):
    """(fwd [N, 2K] = window-folded [cos | -sin], inv_re/inv_im [K, N]
    window-folded): the analysis window is folded into the forward basis
    ROWS and the synthesis window into the inverse basis COLUMNS, and the
    forward re/im bases are fused side-by-side into ONE matrix.

    Why: at sequence shapes ([B, T, 512] frames) the separate form pays
    (a) an elementwise window pass over the full frame tensor each way
    (~1.6 GB of HBM traffic per B=512, T=376 chunk) and (b) TWO matmuls
    that each re-read the frame tensor. Folding the window moves that
    multiply into the (VMEM-resident, tiny) basis, and fusing re|im makes
    the forward a single [*, 512] @ [512, 514] contraction that reads the
    frames once. All folds are computed in float64 before the f32 cast."""
    n = np.arange(fft_size)[:, None].astype(np.float64)
    k = np.arange(fft_size // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / fft_size
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(fft_size) / fft_size)
    w = np.sqrt(hann)
    fwd = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1) * w[:, None]
    coef = np.full((fft_size // 2 + 1,), 2.0)
    coef[0] = 1.0
    coef[-1] = 1.0
    inv_re = (coef[:, None] * np.cos(ang).T) / fft_size * w[None, :]
    inv_im = (coef[:, None] * -np.sin(ang).T) / fft_size * w[None, :]
    return (fwd.astype(np.float32), inv_re.astype(np.float32),
            inv_im.astype(np.float32))


def stft_frame(frames: jnp.ndarray, windowed: bool = True):
    """[..., FFT_SIZE] time frames -> (re, im) each [..., NUM_BINS].

    Windowed path: ONE frames @ [512, 514] matmul against the
    window-folded fused re|im basis (see _windowed_bases); batch dims ride
    the MXU rows and the frame tensor is read once.
    """
    if windowed:
        fwd, _, _ = _windowed_bases(frames.shape[-1])
        k = frames.shape[-1] // 2 + 1
        basis = jnp.asarray(fwd)
        # Two matmuls against the folded basis halves rather than one
        # [512, 514] contraction: the fused form measured the same speed
        # but its different output tiling broke the 1-LSB int16 agreement
        # between the B=1 step path and the [B, T] sequence path that the
        # serving chunk≡steps tests pin.
        re = jnp.matmul(frames, basis[:, :k], precision=DFT_PRECISION)
        im = jnp.matmul(frames, basis[:, k:], precision=DFT_PRECISION)
        return re, im
    fwd_re, fwd_im, _, _ = dft_matrices(frames.shape[-1])
    re = jnp.matmul(frames, fwd_re, precision=DFT_PRECISION)
    im = jnp.matmul(frames, fwd_im, precision=DFT_PRECISION)
    return re, im


def istft_frame(re: jnp.ndarray, im: jnp.ndarray, windowed: bool = True) -> jnp.ndarray:
    """(re, im) [..., NUM_BINS] -> synthesis-windowed time frame [..., FFT_SIZE]."""
    fft_size = 2 * (re.shape[-1] - 1)
    if windowed:
        _, inv_re, inv_im = _windowed_bases(fft_size)
        return (jnp.matmul(re, jnp.asarray(inv_re), precision=DFT_PRECISION)
                + jnp.matmul(im, jnp.asarray(inv_im), precision=DFT_PRECISION))
    _, _, inv_re, inv_im = dft_matrices(fft_size)
    return (jnp.matmul(re, inv_re, precision=DFT_PRECISION)
            + jnp.matmul(im, inv_im, precision=DFT_PRECISION))


def frame_signal(pcm: jnp.ndarray, hop: int = FRAME_LENGTH,
                 fft_size: int = FFT_SIZE) -> jnp.ndarray:
    """[..., T*hop] -> overlapping [..., T, fft_size] frames.

    Frame t covers samples [(t-1)*hop, (t+1)*hop): the first frame sees one
    hop of leading zeros, matching the streaming engine's fresh-stream state
    so offline and streaming paths are bit-identical.

    Built from two shifted reshapes + concat (no gather): cheap on TPU.
    """
    assert fft_size == 2 * hop, "frame_signal assumes 50% overlap"
    t = pcm.shape[-1] // hop
    hops = pcm[..., : t * hop].reshape(pcm.shape[:-1] + (t, hop))
    prev = jnp.concatenate(
        [jnp.zeros(pcm.shape[:-1] + (1, hop), pcm.dtype), hops[..., :-1, :]], axis=-2)
    return jnp.concatenate([prev, hops], axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int = FRAME_LENGTH) -> jnp.ndarray:
    """[..., T, fft_size] synthesis frames -> [..., T*hop] stream (delayed by hop).

    Output hop t = frames[t, :hop] + frames[t-1, hop:]; the final half-frame
    tail (which would need a flush frame) is dropped, mirroring the
    streaming engine where it lives in the OLA carry.
    """
    head = frames[..., :hop]
    tail = frames[..., hop:]
    prev_tail = jnp.concatenate(
        [jnp.zeros(frames.shape[:-2] + (1, hop), frames.dtype), tail[..., :-1, :]], axis=-2)
    out = head + prev_tail
    return out.reshape(frames.shape[:-2] + (-1,))


__all__ = [
    "dft_matrices",
    "analysis_window",
    "stft_frame",
    "istft_frame",
    "frame_signal",
    "overlap_add",
]
