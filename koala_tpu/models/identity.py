"""Identity (unit-mask) model: passes the spectrum through unchanged.

Not a reference feature — a test/diagnostic model kind that isolates the
engine's STFT/OLA machinery: with a unit mask the engine must reproduce its
input exactly, delayed by DELAY_SAMPLE (perfect-reconstruction property of
the sqrt-Hann 50%-overlap geometry; see ops/stft.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

DEFAULT_CONFIG = {"kind": "identity"}


def init_params(key=None, config: Dict[str, Any] = None):
    return {"empty": jnp.zeros((1,), jnp.float32)}


def init_state(batch_shape: Tuple[int, ...], config: Dict[str, Any] = None,
               dtype=jnp.float32):
    return jnp.zeros(tuple(batch_shape) + (1,), dtype)


def step(params, state, re, im, config: Dict[str, Any] = None):
    return state, jnp.ones_like(re)


def apply_sequence(params, state, re, im, config: Dict[str, Any] = None):
    return state, jnp.ones_like(re)


__all__ = ["DEFAULT_CONFIG", "init_params", "init_state", "step", "apply_sequence"]
