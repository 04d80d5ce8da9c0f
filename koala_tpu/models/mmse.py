"""Parameter-free statistical noise suppressor (decision-directed Wiener).

A classical MMSE-style gain rule: tracked noise PSD + decision-directed
a-priori SNR estimate + Wiener gain with a spectral floor. Needs no trained
weights, so it serves as (a) a quality floor / sanity baseline for the
learned model, and (b) a fully deterministic enhancer for smoke tests.

Everything is elementwise over [*, K] bins — pure VPU work that XLA fuses
into the surrounding STFT matmuls; state is O(1) per stream like the GRU
model, so the same scan/reset machinery applies.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..constants import NUM_BINS

DEFAULT_CONFIG = {
    "kind": "mmse",
    "bins": NUM_BINS,
    "dd_beta": 0.96,       # decision-directed smoothing
    "noise_alpha": 0.92,   # noise PSD smoothing when speech absent
    "gain_floor": 0.03,
    "init_frames": 6.0,    # fast noise adaptation horizon at stream start
}


def init_params(key=None, config: Dict[str, Any] = None):
    # No trainable parameters; keep a placeholder leaf so save/load and the
    # engine's params plumbing stay uniform across model kinds.
    return {"empty": jnp.zeros((1,), jnp.float32)}


def init_state(batch_shape: Tuple[int, ...], config: Dict[str, Any] = None,
               dtype=jnp.float32):
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    k = cfg["bins"]
    shape = tuple(batch_shape) + (k,)
    return {
        "noise": jnp.full(shape, 1e-8, dtype),
        "prev_gain2_post": jnp.zeros(shape, dtype),
        "count": jnp.zeros(tuple(batch_shape), dtype),
    }


def step(params, state, re, im, config: Dict[str, Any] = None):
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    power = re * re + im * im
    noise = state["noise"]
    count = state["count"]

    # Fast adaptation during the first frames (treat stream head as noise
    # reference), then settle to the steady-state smoothing constant.
    boot = jnp.clip(1.0 / (count + 1.0), 1.0 - cfg["noise_alpha"], 1.0)[..., None]

    # SNRs are clipped to a physical range: beyond ~60 dB the gain is
    # saturated anyway, and unbounded values make the recurrent state
    # numerically chaotic (tiny rounding differences amplify).
    snr_cap = 1e6
    gamma = jnp.clip(power / jnp.maximum(noise, 1e-10), 0.0, snr_cap)
    xi = (cfg["dd_beta"] * state["prev_gain2_post"]
          + (1.0 - cfg["dd_beta"]) * jnp.maximum(gamma - 1.0, 0.0))  # a-priori SNR
    xi = jnp.clip(xi, 0.0, snr_cap)
    gain = xi / (1.0 + xi)                                      # Wiener rule

    # Speech-presence probability xi/(1+xi) gates noise updates; compute
    # the complement as 1/(1+xi) directly (1 - presence cancels badly for
    # large xi).
    rate = boot / (1.0 + xi)
    new_noise = noise + rate * (power - noise)
    new_noise = jnp.maximum(new_noise, 1e-10)

    mask = jnp.maximum(gain, cfg["gain_floor"])
    new_state = {
        "noise": new_noise,
        "prev_gain2_post": jnp.clip(gain * gain * gamma, 0.0, snr_cap),
        "count": count + 1.0,
    }
    return new_state, mask


def apply_sequence(params, state, re, im, config: Dict[str, Any] = None):
    """Spectra [*, T, K] -> (final_state, masks). Pure scan (all recurrent)."""
    t_axis = re.ndim - 2
    re_t = jnp.moveaxis(re, t_axis, 0)
    im_t = jnp.moveaxis(im, t_axis, 0)

    def scan_fn(st, frame):
        fre, fim = frame
        st, mask = step(params, st, fre, fim, config)
        return st, mask

    state, masks = jax.lax.scan(scan_fn, state, (re_t, im_t))
    return state, jnp.moveaxis(masks, 0, t_axis)


__all__ = ["DEFAULT_CONFIG", "init_params", "init_state", "step", "apply_sequence"]
