"""Batched stream-pool engine: B concurrent streams on one device.

This is new capability relative to the reference (whose engine is strictly
single-stream; SURVEY.md §2 parallelism table): the per-stream streaming
contract is preserved, but B streams advance in lockstep as [B, 256] frames
or [B, T, 256] chunks, with all recurrent state resident in HBM between
calls (donated buffers — no host round-trips of state).

Per-stream ``reset`` is a masked zeroing of state leaves (mixed-lifetime
stream pools: stream i can be rebound to a new utterance while others keep
streaming). Engine-state leaves are [B, ...] with the batch axis leading,
so one [B] mask broadcasts over every leaf.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import DELAY_SAMPLE, FRAME_LENGTH, SAMPLE_RATE
from ..device import parse_device, resolve_jax_device
from ..errors import (
    ERROR_STACK,
    KoalaInvalidArgumentError,
    KoalaInvalidStateError,
    raise_with_stack,
)
from ..models import params_io
from .core import make_engine
from .stream import _float_to_pcm_np, validate_access_key


def masked_reset(state, fresh_state, reset_mask: jnp.ndarray):
    """Replace state leaves with fresh values where reset_mask[b] is True.

    Every leaf is [*batch, ...]; the mask is [*batch] and broadcasts from
    the left. Exact zeroing preserves the bit-determinism contract
    (reference: binding/python/test_koala.py:116-129) under batching.
    """
    batch_ndim = reset_mask.ndim

    def leaf_reset(cur, new):
        m = reset_mask.reshape(reset_mask.shape + (1,) * (cur.ndim - batch_ndim))
        return jnp.where(m, new, cur)

    return jax.tree_util.tree_map(leaf_reset, state, fresh_state)


class KoalaBatch:
    """Pool of ``batch_size`` concurrent noise-suppression streams."""

    def __init__(
            self,
            access_key: str,
            model_path: str,
            batch_size: int,
            device: str = "best",
            library_path: Optional[str] = None) -> None:
        validate_access_key(access_key)
        if not isinstance(batch_size, int) or batch_size <= 0:
            ERROR_STACK.push("`batch_size` must be a positive integer")
            raise_with_stack(KoalaInvalidArgumentError, "Initialization failed")
        if not isinstance(model_path, str) or not os.path.exists(model_path):
            ERROR_STACK.push("could not find model file at `%s`" % model_path)
            raise_with_stack(KoalaInvalidArgumentError, "Initialization failed")

        self._batch_size = batch_size
        self._device = resolve_jax_device(parse_device(device))

        params, config = params_io.load_params(model_path)
        self._engine = make_engine(config.get("kind", "mask_gru"), config)
        self._params = jax.device_put(params, self._device)
        with jax.default_device(self._device):
            self._state = self._engine.init_state((batch_size,))
        self._handle = object()

        eng = self._engine

        def _reset_fn(state, mask):
            return masked_reset(state, eng.init_state((batch_size,)), mask)

        self._reset_jit = jax.jit(_reset_fn, donate_argnums=(0,))

    def _check_handle(self) -> None:
        if getattr(self, "_handle", None) is None:
            ERROR_STACK.push("KoalaBatch object has been deleted or is invalid")
            ERROR_STACK.push("Processing failed on invalid handle")
            raise_with_stack(KoalaInvalidStateError, "Invalid Koala state")

    @property
    def batch_size(self) -> int:
        return self._batch_size

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    @property
    def frame_length(self) -> int:
        return FRAME_LENGTH

    @property
    def delay_sample(self) -> int:
        return DELAY_SAMPLE

    def process(self, frames) -> np.ndarray:
        """[B, 256] int16 frames -> [B, 256] enhanced int16 (delayed)."""
        self._check_handle()
        frames = np.asarray(frames)
        if frames.shape != (self._batch_size, FRAME_LENGTH):
            raise KoalaInvalidArgumentError(
                "Expected input of shape (%d, %d), got %s"
                % (self._batch_size, FRAME_LENGTH, frames.shape))
        hop = frames.astype(np.float32) / 32768.0
        self._state, out = self._engine.step_jit(self._params, self._state, hop)
        return _float_to_pcm_np(np.asarray(out))

    def process_chunk(self, pcm) -> np.ndarray:
        """[B, T*256] int16 -> [B, T*256] enhanced int16 (delayed stream).

        Semantically identical to T successive ``process`` calls; the two
        paths compile to different XLA programs, so int16 outputs can
        differ by 1 LSB at rounding boundaries (tests/test_engine.py)."""
        self._check_handle()
        pcm = np.asarray(pcm)
        if pcm.ndim != 2 or pcm.shape[0] != self._batch_size \
                or pcm.shape[1] % FRAME_LENGTH != 0:
            raise KoalaInvalidArgumentError(
                "Expected input of shape (%d, k*%d), got %s"
                % (self._batch_size, FRAME_LENGTH, pcm.shape))
        t = pcm.shape[1] // FRAME_LENGTH
        hops = (pcm.astype(np.float32) / 32768.0).reshape(
            self._batch_size, t, FRAME_LENGTH)
        self._state, out = self._engine.sequence_jit(self._params, self._state, hops)
        return _float_to_pcm_np(np.asarray(out).reshape(self._batch_size, -1))

    def enhance(self, pcm) -> np.ndarray:
        """Delay-compensated batch enhancement: [B, N] noisy int16 ->
        [B, N] enhanced int16 aligned 1:1 with the input (zero-pad flush +
        head trim, the reference demo algorithm demo/python/
        koala_demo_file.py:96-116 vectorized over streams)."""
        self._check_handle()
        pcm = np.asarray(pcm)
        n = pcm.shape[1]
        total = n + DELAY_SAMPLE
        t = -(-total // FRAME_LENGTH)
        padded = np.zeros((self._batch_size, t * FRAME_LENGTH), np.float32)
        padded[:, :n] = pcm.astype(np.float32)
        hops = (padded / 32768.0).reshape(self._batch_size, t, FRAME_LENGTH)
        # Offline one-shot surface -> the fused-engine fast path on TPU
        # (ops/pallas/engine_fused.py); process/process_chunk keep the
        # shared XLA formulation and its cross-path LSB agreement.
        self._state, out = self._engine.sequence_fast_jit(
            self._params, self._state, hops)
        flat = np.asarray(out).reshape(self._batch_size, -1)
        return _float_to_pcm_np(flat[:, DELAY_SAMPLE:DELAY_SAMPLE + n])

    def reset(self, streams: Optional[Sequence[int]] = None) -> None:
        """Reset all streams, or only the given stream indices."""
        self._check_handle()
        if streams is None:
            mask = np.ones((self._batch_size,), bool)
        else:
            mask = np.zeros((self._batch_size,), bool)
            for s in streams:
                if not 0 <= s < self._batch_size:
                    raise KoalaInvalidArgumentError(
                        "stream index %d out of range [0, %d)" % (s, self._batch_size))
                mask[s] = True
        self._state = self._reset_jit(self._state, mask)

    def save_state(self) -> dict:
        """Snapshot all streams' state as host numpy arrays (checkpoint
        surface for long-form/pod-scale jobs; resumes bit-exactly)."""
        self._check_handle()
        from ..models.params_io import _flatten
        return {k: np.asarray(v) for k, v in
                _flatten(jax.device_get(self._state)).items()}

    def load_state(self, snapshot: dict) -> None:
        self._check_handle()
        from ..models.params_io import _flatten, _unflatten

        fresh = self._engine.init_state((self._batch_size,))
        expected = _flatten(jax.device_get(fresh))
        if set(snapshot.keys()) != set(expected.keys()) or any(
                tuple(np.shape(snapshot[k])) != tuple(np.shape(v))
                for k, v in expected.items()):
            ERROR_STACK.push("state snapshot does not match engine state layout")
            raise_with_stack(KoalaInvalidArgumentError, "Invalid state snapshot")
        restored = _unflatten({k: np.asarray(v) for k, v in snapshot.items()})
        self._state = jax.device_put(restored, self._device)

    def delete(self) -> None:
        self._handle = None
        self._state = None
        self._params = None


__all__ = ["KoalaBatch", "masked_reset"]
