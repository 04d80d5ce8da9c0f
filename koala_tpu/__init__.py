"""koala_tpu — TPU-native streaming noise suppression framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
Picovoice Koala SDK (reference: a closed native engine behind C bindings;
see SURVEY.md). Public surface mirrors the reference Python binding
(binding/python/__init__.py, _factory.py): ``create``, ``available_devices``,
the ``Koala`` class, and the 12-member error hierarchy — plus the new
TPU-scale surface: ``KoalaBatch`` (stream pools) and ``koala_tpu.parallel``
(mesh-sharded multi-chip/multi-host runners).
"""

from ._version import __version__
from .constants import DELAY_SAMPLE, FRAME_LENGTH, SAMPLE_RATE
from .device import available_devices
from .engine import Koala, KoalaBatch
from .errors import (
    KoalaActivationError,
    KoalaActivationLimitError,
    KoalaActivationRefusedError,
    KoalaActivationThrottledError,
    KoalaError,
    KoalaIOError,
    KoalaInvalidArgumentError,
    KoalaInvalidStateError,
    KoalaKeyError,
    KoalaMemoryError,
    KoalaRuntimeError,
    KoalaStopIterationError,
    Status,
)
from .factory import create, create_batch
from .sdk import get_sdk, set_sdk

__all__ = [
    "__version__",
    "create",
    "create_batch",
    "available_devices",
    "set_sdk",
    "get_sdk",
    "Koala",
    "KoalaBatch",
    "SAMPLE_RATE",
    "FRAME_LENGTH",
    "DELAY_SAMPLE",
    "Status",
    "KoalaError",
    "KoalaMemoryError",
    "KoalaIOError",
    "KoalaInvalidArgumentError",
    "KoalaStopIterationError",
    "KoalaKeyError",
    "KoalaInvalidStateError",
    "KoalaRuntimeError",
    "KoalaActivationError",
    "KoalaActivationLimitError",
    "KoalaActivationThrottledError",
    "KoalaActivationRefusedError",
]
