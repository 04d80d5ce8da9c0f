"""ctypes binding to the native host runtime (libkoala_tpu_host.so).

The native library implements the host data plane — per-stream SPSC ring
buffers, batched frame gather, PCM conversion, metering (see
include/koala_tpu_host.h and native/koala_host.cpp). This wrapper exposes
it as the `StreamPool` class used by the serving path to feed the batched
device step. Builds the library on first use if the .so is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from .errors import ERROR_STACK, KoalaIOError, KoalaRuntimeError, raise_with_stack

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libkoala_tpu_host.so")

_lib = None


def _build_library() -> None:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, text=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        ERROR_STACK.push("failed to build native host library: %s" % detail[:500])
        raise_with_stack(KoalaRuntimeError, "Native build failed")


def load_hostlib() -> ctypes.CDLL:
    """Load (building if needed) the native host library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_library()
    if not os.path.exists(_LIB_PATH):
        ERROR_STACK.push("native host library missing at `%s`" % _LIB_PATH)
        raise_with_stack(KoalaIOError, "IO error")
    lib = ctypes.CDLL(_LIB_PATH)

    lib.kt_pool_create.restype = ctypes.c_void_p
    lib.kt_pool_create.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.kt_pool_delete.argtypes = [ctypes.c_void_p]
    lib.kt_pool_push.restype = ctypes.c_int
    lib.kt_pool_push.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_int16), ctypes.c_int32]
    lib.kt_pool_frames_ready.restype = ctypes.c_int32
    lib.kt_pool_frames_ready.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.kt_pool_gather.restype = ctypes.c_int32
    lib.kt_pool_gather.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int16),
                                   ctypes.POINTER(ctypes.c_uint8)]
    lib.kt_pool_gather_f32.restype = ctypes.c_int32
    lib.kt_pool_gather_f32.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.POINTER(ctypes.c_uint8)]
    lib.kt_pool_gather_chunk.restype = ctypes.c_int32
    lib.kt_pool_gather_chunk.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int16),
                                         ctypes.POINTER(ctypes.c_int32),
                                         ctypes.c_int32]
    lib.kt_pool_push_rows.restype = ctypes.c_int32
    lib.kt_pool_push_rows.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_int32,
                                      ctypes.POINTER(ctypes.c_int16),
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.c_int32]
    lib.kt_pool_push_rows_f32.restype = ctypes.c_int32
    lib.kt_pool_push_rows_f32.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                          ctypes.c_int32,
                                          ctypes.POINTER(ctypes.c_float),
                                          ctypes.POINTER(ctypes.c_int32),
                                          ctypes.c_int32]
    lib.kt_pool_pull.restype = ctypes.c_int32
    lib.kt_pool_pull.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_int16),
                                 ctypes.c_int32]
    lib.kt_pool_reset_stream.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.kt_pool_dropped_samples.restype = ctypes.c_int64
    lib.kt_pool_dropped_samples.argtypes = [ctypes.c_void_p]
    lib.kt_pcm_to_f32.argtypes = [ctypes.POINTER(ctypes.c_int16),
                                  ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.kt_f32_to_pcm.argtypes = [ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
    lib.kt_rms.restype = ctypes.c_float
    lib.kt_rms.argtypes = [ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
    lib.kt_peak.restype = ctypes.c_float
    lib.kt_peak.argtypes = [ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
    lib.kt_host_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


def _i16ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


class StreamPool:
    """Pool of per-stream ring buffers feeding batched device steps."""

    def __init__(self, num_streams: int, frame_length: int = 256,
                 capacity_frames: int = 64):
        self._lib = load_hostlib()
        self._handle = self._lib.kt_pool_create(num_streams, frame_length,
                                                capacity_frames)
        if not self._handle:
            raise_with_stack(KoalaRuntimeError, "kt_pool_create failed")
        self.num_streams = num_streams
        self.frame_length = frame_length
        self._batch = np.zeros((num_streams, frame_length), np.int16)
        self._active = np.zeros((num_streams,), np.uint8)
        self._chunk_bufs = {}   # max_frames -> ([B,k,frame] i16, [B] i32)

    def push(self, stream: int, samples: np.ndarray) -> bool:
        """Append int16 samples to a stream; False if the ring overflowed."""
        samples = np.ascontiguousarray(samples, np.int16)
        status = self._lib.kt_pool_push(self._handle, stream,
                                        _i16ptr(samples), len(samples))
        return status == 0

    def frames_ready(self, stream: int) -> int:
        return self._lib.kt_pool_frames_ready(self._handle, stream)

    def gather(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """-> (batch [B, frame] int16, active [B] bool, n_active). Rows of
        inactive streams are zero (the engine advances them as silence)."""
        n = self._lib.kt_pool_gather(
            self._handle, _i16ptr(self._batch),
            self._active.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return self._batch, self._active.astype(bool), int(n)

    def gather_chunk(self, max_frames: int) -> Tuple[np.ndarray, np.ndarray, int]:
        """-> (batch [B, k, frame] int16, counts [B] int32, total_frames).
        Pops up to ``max_frames`` backlogged frames per stream; frames past
        a stream's backlog are zero (the chunked engine step masks their
        state commit). This is how the dispatcher amortizes one device
        round-trip over k frames per stream."""
        if max_frames not in self._chunk_bufs:
            self._chunk_bufs[max_frames] = (
                np.zeros((self.num_streams, max_frames, self.frame_length),
                         np.int16),
                np.zeros((self.num_streams,), np.int32))
        batch, counts = self._chunk_bufs[max_frames]
        total = self._lib.kt_pool_gather_chunk(
            self._handle, _i16ptr(batch),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_frames)
        return batch, counts, int(total)

    def push_rows(self, rows: np.ndarray, counts: np.ndarray,
                  first_stream: int = 0) -> int:
        """Batched push: append counts[i] frames from rows[i] ([n, k, frame]
        int16) to streams first_stream+i — the whole pool's audio in ONE
        native hop. Returns total frames appended."""
        rows = np.ascontiguousarray(rows, np.int16)
        if rows.ndim == 2:                      # [n, frame] == one frame/row
            rows = rows[:, None, :]
        counts = np.ascontiguousarray(counts, np.int32)
        return int(self._lib.kt_pool_push_rows(
            self._handle, first_stream, rows.shape[0], _i16ptr(rows),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rows.shape[1]))

    def push_rows_f32(self, rows: np.ndarray, counts: np.ndarray,
                      first_stream: int = 0) -> int:
        """As push_rows, but rows are float32 at fullscale 1.0, converted to
        int16 inside the native call (fused convert+route)."""
        rows = np.ascontiguousarray(rows, np.float32)
        if rows.ndim == 2:
            rows = rows[:, None, :]
        counts = np.ascontiguousarray(counts, np.int32)
        return int(self._lib.kt_pool_push_rows_f32(
            self._handle, first_stream, rows.shape[0],
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rows.shape[1]))

    def pull(self, stream: int, max_samples: int) -> np.ndarray:
        """Pop up to max_samples buffered samples from one stream."""
        out = np.empty((max_samples,), np.int16)
        n = self._lib.kt_pool_pull(self._handle, stream, _i16ptr(out),
                                   max_samples)
        return out[:max(n, 0)]

    def reset_stream(self, stream: int) -> None:
        self._lib.kt_pool_reset_stream(self._handle, stream)

    @property
    def dropped_samples(self) -> int:
        return int(self._lib.kt_pool_dropped_samples(self._handle))

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.kt_pool_delete(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pcm_to_f32(pcm: np.ndarray) -> np.ndarray:
    lib = load_hostlib()
    pcm = np.ascontiguousarray(pcm, np.int16)
    out = np.empty(pcm.shape, np.float32)
    lib.kt_pcm_to_f32(_i16ptr(pcm),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      pcm.size)
    return out


def f32_to_pcm(x: np.ndarray) -> np.ndarray:
    lib = load_hostlib()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.int16)
    lib.kt_f32_to_pcm(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      _i16ptr(out), x.size)
    return out


def rms(pcm: np.ndarray) -> float:
    lib = load_hostlib()
    pcm = np.ascontiguousarray(pcm, np.int16)
    return float(lib.kt_rms(_i16ptr(pcm), pcm.size))


__all__ = ["StreamPool", "load_hostlib", "pcm_to_f32", "f32_to_pcm", "rms"]
