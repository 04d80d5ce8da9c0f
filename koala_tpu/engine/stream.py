"""Single-stream Koala engine: the reference-contract API surface.

Drop-in analog of the reference Python binding's ``Koala`` class
(reference: binding/python/_koala.py:85-340): same constructor signature,
``process``/``reset``/``delete`` methods, ``sample_rate``/``frame_length``/
``delay_sample``/``version`` properties, and the same typed error behavior
(including a ``_handle`` attribute whose nulling makes ``process`` raise
with a populated message stack, as exercised by the reference's
test_process_message_stack, binding/python/test_koala.py:164-185).

Differences by design (TPU-native, no closed binary, no license server):
- ``library_path`` is accepted for compatibility and ignored.
- AccessKey validation is a pure offline format check (non-empty, >= 8
  chars drawn from the base64 alphabet). There is no network activation.
- ``device`` resolves through the JAX backend (device.py grammar).
"""

from __future__ import annotations

import os
import re as _re
from typing import Optional, Sequence

import numpy as np

import jax

from .._version import __version__
from ..constants import DELAY_SAMPLE, FRAME_LENGTH, SAMPLE_RATE
from ..device import parse_device, resolve_jax_device
from ..errors import (
    ERROR_STACK,
    KoalaActivationError,
    KoalaInvalidArgumentError,
    KoalaInvalidStateError,
    raise_with_stack,
)
from ..models import params_io
from .core import make_engine

_ACCESS_KEY_RE = _re.compile(r"^[A-Za-z0-9+/=]{8,}$")


def validate_access_key(access_key: str) -> None:
    """Offline AccessKey format check. Deterministic across calls so repeated
    failures produce identical message stacks (reference behavior:
    binding/python/test_koala.py:136-162)."""
    if not isinstance(access_key, str) or len(access_key) == 0:
        ERROR_STACK.push("`access_key` should be a non-empty string")
        raise_with_stack(KoalaInvalidArgumentError, "Invalid access key")
    if _ACCESS_KEY_RE.match(access_key) is None:
        ERROR_STACK.push("AccessKey format is invalid: expected >= 8 base64 characters")
        ERROR_STACK.push("Failed to validate AccessKey")
        raise_with_stack(KoalaActivationError, "Initialization failed")
    from ..sdk import check_revocation

    check_revocation(access_key)


def _float_to_pcm_np(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(np.asarray(x, np.float64) * 32768.0),
                   -32768, 32767).astype(np.int16)


class Koala:
    """Streaming noise suppressor over one audio stream.

    Consumes consecutive 256-sample frames of 16 kHz mono int16 audio and
    returns enhanced frames of the same size delayed by ``delay_sample``
    samples (contract: reference include/pv_koala.h:26-34, 66-80).
    """

    def __init__(
            self,
            access_key: str,
            model_path: str,
            device: str = "best",
            library_path: Optional[str] = None) -> None:
        validate_access_key(access_key)

        if not isinstance(model_path, str) or not os.path.exists(model_path):
            ERROR_STACK.push("could not find model file at `%s`" % model_path)
            raise_with_stack(KoalaInvalidArgumentError, "Initialization failed")

        spec = parse_device(device)
        self._device = resolve_jax_device(spec)

        params, config = params_io.load_params(model_path)
        self._engine = make_engine(config.get("kind", "mask_gru"), config)
        self._params = jax.device_put(params, self._device)
        # Materialize state directly on the target device (a device_put
        # from the default accelerator would round-trip through it).
        with jax.default_device(self._device):
            self._state = self._engine.init_state(())
        self._handle = object()   # sentinel; nulled by delete()

    # -- lifecycle ---------------------------------------------------------

    def _check_handle(self) -> None:
        if getattr(self, "_handle", None) is None:
            ERROR_STACK.push("Koala object has been deleted or is invalid")
            ERROR_STACK.push("Processing failed on invalid handle")
            raise_with_stack(KoalaInvalidStateError, "Invalid Koala state")

    def process(self, pcm: Sequence[int]) -> Sequence[int]:
        """Process one 256-sample frame; returns the delayed enhanced frame.

        Mirrors reference binding/python/_koala.py:224-254 (length check ->
        typed error; int16 in, int16 out)."""
        self._check_handle()
        if len(pcm) != FRAME_LENGTH:
            raise KoalaInvalidArgumentError(
                "Length of input frame %d does not match required frame length %d"
                % (len(pcm), FRAME_LENGTH))
        # numpy-only conversion: a jnp op here would materialize on the
        # DEFAULT device and drag execution off self._device.
        hop = np.asarray(pcm, dtype=np.float32) / 32768.0
        self._state, out = self._engine.step_jit(self._params, self._state, hop)
        return _float_to_pcm_np(np.asarray(out)).tolist()

    def reset(self) -> None:
        """Restore fresh-stream state; subsequent output is bit-identical to a
        newly created object (reference contract: include/pv_koala.h:83-90,
        verified by binding/python/test_koala.py:116-129)."""
        self._check_handle()
        with jax.default_device(self._device):
            self._state = self._engine.init_state(())

    def delete(self) -> None:
        """Release resources; further calls raise KoalaInvalidStateError."""
        self._handle = None
        self._state = None
        self._params = None

    # -- convenience (delay-compensated full-utterance path) ---------------

    def enhance(self, pcm: Sequence[int]) -> np.ndarray:
        """Enhance a whole utterance with delay compensation: pad, stream,
        trim ``delay_sample`` from the head so output aligns 1:1 with input
        (the algorithm of reference demo/python/koala_demo_file.py:96-116,
        vectorized as one device call)."""
        self._check_handle()
        pcm = np.asarray(pcm)
        n = pcm.shape[-1]
        total = n + DELAY_SAMPLE
        t = -(-total // FRAME_LENGTH)
        padded = np.zeros((t * FRAME_LENGTH,), np.float32)
        padded[:n] = np.asarray(pcm, np.float32)
        hops = (padded / 32768.0).reshape(t, FRAME_LENGTH)
        self._state, out = self._engine.sequence_jit(self._params, self._state, hops)
        flat = np.asarray(out).reshape(-1)
        return _float_to_pcm_np(flat[DELAY_SAMPLE:DELAY_SAMPLE + n])

    # -- state snapshot/restore (long-form streaming; new surface with no
    # reference counterpart, SURVEY.md §5 checkpoint/resume) ---------------

    def save_state(self) -> dict:
        """Snapshot the full streaming state (input carry, OLA tail, model
        recurrence) as host numpy arrays. Restoring it with ``load_state``
        resumes the stream bit-exactly — the checkpoint/resume surface for
        multi-hour audio chunked across calls or processes."""
        self._check_handle()
        import jax as _jax

        from ..models.params_io import _flatten
        return {k: np.asarray(v) for k, v in
                _flatten(_jax.device_get(self._state)).items()}

    def load_state(self, snapshot: dict) -> None:
        """Restore a ``save_state`` snapshot."""
        self._check_handle()
        from ..models.params_io import _flatten, _unflatten

        fresh = self._engine.init_state(())
        expected = _flatten(jax.device_get(fresh))
        if set(snapshot.keys()) != set(expected.keys()):
            ERROR_STACK.push("state snapshot keys do not match engine state")
            raise_with_stack(KoalaInvalidArgumentError, "Invalid state snapshot")
        for k, v in expected.items():
            if tuple(np.shape(snapshot[k])) != tuple(np.shape(v)):
                ERROR_STACK.push("state leaf `%s` has shape %s, expected %s"
                                 % (k, np.shape(snapshot[k]), np.shape(v)))
                raise_with_stack(KoalaInvalidArgumentError, "Invalid state snapshot")
        restored = _unflatten({k: np.asarray(v) for k, v in snapshot.items()})
        self._state = jax.device_put(restored, self._device)

    # -- properties --------------------------------------------------------

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    @property
    def frame_length(self) -> int:
        return FRAME_LENGTH

    @property
    def delay_sample(self) -> int:
        return DELAY_SAMPLE

    @property
    def version(self) -> str:
        return __version__


__all__ = ["Koala", "validate_access_key"]
