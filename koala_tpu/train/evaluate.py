"""Acceptance evaluation: the reference's energy-parity harness + SI-SDR.

Ports the reference test harness semantics exactly (binding/python/
test_koala.py:64-114): stream frame-by-frame, per-output-frame RMS compared
against the delay-shifted reference frame, deviation must be < 0.02 at
fullscale 1.0. Three cases: pure speech vs itself, pure noise vs silence,
speech+noise (sample-wise int16 sum) vs clean speech. Plus SI-SDR of the
delay-compensated enhanced mix against clean speech (BASELINE.json metric).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import DELAY_SAMPLE, FRAME_LENGTH
from ..engine.core import make_engine, pcm_to_float
from .stoi import stoi


def _stream_enhance(engine, params, pcm_int16: np.ndarray) -> np.ndarray:
    """Enhance a full int16 utterance via the sequence engine (bit-identical
    to frame-by-frame streaming; see tests/test_engine.py). Returns int16
    of the same number of whole frames, still delayed (no compensation)."""
    n = (len(pcm_int16) // FRAME_LENGTH) * FRAME_LENGTH
    hops = pcm_to_float(jnp.asarray(pcm_int16[:n], jnp.float32)).reshape(
        -1, FRAME_LENGTH)
    state = engine.init_state(())
    _, out = engine.sequence(params, state, hops)
    flat = np.asarray(out).reshape(-1)
    return np.clip(np.round(flat.astype(np.float64) * 32768.0),
                   -32768, 32767).astype(np.int16)


def _rms(x: np.ndarray) -> float:
    x = np.asarray(x, np.float64) / 32768.0
    return float(np.sqrt(np.mean(x * x)))


def rms_case(enhanced: np.ndarray, reference: Optional[np.ndarray],
             delay: int = DELAY_SAMPLE) -> float:
    """Max per-frame energy deviation, harness semantics of
    test_koala.py:71-104. reference=None means 'expect silence'."""
    worst = 0.0
    for start in range(0, len(enhanced) - FRAME_LENGTH + 1, FRAME_LENGTH):
        frame = enhanced[start:start + FRAME_LENGTH]
        if reference is None or start < delay:
            dev = _rms(frame)
        else:
            ref = reference[start - delay:start - delay + FRAME_LENGTH]
            dev = abs(_rms(frame) - _rms(ref))
        worst = max(worst, dev)
    return worst


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SDR in dB."""
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    alpha = np.dot(est, ref) / (np.dot(ref, ref) + 1e-12)
    target = alpha * ref
    noise = est - target
    return float(10.0 * np.log10(
        (np.dot(target, target) + 1e-12) / (np.dot(noise, noise) + 1e-12)))


def evaluate(params, config: Dict[str, Any], speech: np.ndarray,
             noise: np.ndarray) -> Dict[str, float]:
    """Run all three harness cases + SI-SDR; int16 fixture inputs."""
    # Single-stream eval may run on a CPU device inside a TPU-backed
    # process; pin the portable scan path.
    config = dict(config, use_pallas=False)
    engine = make_engine(config.get("kind", "mask_gru"), config)

    mixed = (speech.astype(np.int32) + noise.astype(np.int32))
    mixed = np.clip(mixed, -32768, 32767).astype(np.int16)

    out_speech = _stream_enhance(engine, params, speech)
    out_noise = _stream_enhance(engine, params, noise)
    out_mixed = _stream_enhance(engine, params, mixed)

    n = len(out_mixed) - DELAY_SAMPLE
    from .fwsnrseg import fwsnrseg

    results = {
        "dev_pure_speech": rms_case(out_speech, speech),
        "dev_pure_noise": rms_case(out_noise, None),
        "dev_mixed": rms_case(out_mixed, speech),
        "si_sdr_mixed_db": si_sdr(out_mixed[DELAY_SAMPLE:], speech[:n]),
        "si_sdr_input_db": si_sdr(mixed[:n], speech[:n]),
        # Quality metrics (BASELINE.json "SI-SDR/PESQ parity"): STOI covers
        # intelligibility, fwSNRseg is the documented PESQ correlate — see
        # train/stoi.py, train/fwsnrseg.py and
        # resources/reports/QUALITY_METRICS.md.
        "stoi_mixed": stoi(speech[:n], out_mixed[DELAY_SAMPLE:]),
        "stoi_input": stoi(speech[:n], mixed[:n]),
        "fwsnrseg_mixed": fwsnrseg(speech[:n], out_mixed[DELAY_SAMPLE:]),
        "fwsnrseg_input": fwsnrseg(speech[:n], mixed[:n]),
    }
    results["si_sdr_gain_db"] = results["si_sdr_mixed_db"] - results["si_sdr_input_db"]
    return results


__all__ = ["evaluate", "rms_case", "si_sdr", "stoi"]
