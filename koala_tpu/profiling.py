"""Observability: tracing, logging toggles, and throughput counters.

The reference exposes pv_log_enable/pv_log_disable in the binary (nm
exports; SURVEY.md §5) and measures perf externally with wall-clock loops
and a machine-state probe. TPU-native equivalents here:

- ``log_enable``/``log_disable``: framework logging toggle (python logging).
- ``trace``: context manager around jax.profiler for device traces
  (view in TensorBoard / xprof).
- ``ThroughputMeter``: audio-seconds/s counters for serving loops.
- ``machine_state``: host-side telemetry snapshot (the analog of
  resources/scripts/machine-state.sh — CPU/mem/load around perf runs).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional

from .constants import FRAME_LENGTH, SAMPLE_RATE

logger = logging.getLogger("koala_tpu")
logger.addHandler(logging.NullHandler())


def log_enable(level: int = logging.INFO) -> None:
    """Enable framework logging (analog of pv_log_enable)."""
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "[koala_tpu %(levelname)s %(asctime)s] %(message)s"))
    logger.handlers = [h for h in logger.handlers
                       if isinstance(h, logging.NullHandler)]
    logger.addHandler(handler)
    logger.setLevel(level)


def log_disable() -> None:
    """Disable framework logging (analog of pv_log_disable)."""
    logger.handlers = [logging.NullHandler()]
    logger.setLevel(logging.CRITICAL + 1)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/koala_tpu_trace"):
    """Capture a device profile around a code region:

        with profiling.trace("/tmp/trace"):
            engine.sequence_jit(params, state, hops)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Rolling audio-throughput counter for serving loops."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()
        self._frames = 0
        self._device_steps = 0

    def add_frames(self, n: int) -> None:
        self._frames += n
        self._device_steps += 1

    @property
    def report(self) -> Dict[str, float]:
        elapsed = max(time.perf_counter() - self._start, 1e-9)
        audio_s = self._frames * FRAME_LENGTH / SAMPLE_RATE
        return {
            "elapsed_s": elapsed,
            "frames": self._frames,
            "device_steps": self._device_steps,
            "audio_seconds": audio_s,
            "audio_seconds_per_second": audio_s / elapsed,
            "frames_per_step": self._frames / max(self._device_steps, 1),
        }


def machine_state() -> Dict[str, object]:
    """Host telemetry snapshot (loadavg, meminfo) — the analog of the
    reference's machine-state.sh probe around perf runs."""
    state: Dict[str, object] = {"time": time.time()}
    try:
        state["loadavg"] = os.getloadavg()
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {}
            for line in f:
                parts = line.split(":")
                if parts[0] in ("MemTotal", "MemAvailable", "SwapTotal", "SwapFree"):
                    mem[parts[0]] = parts[1].strip()
            state["meminfo"] = mem
    except OSError:
        pass
    try:
        state["cpu_count"] = os.cpu_count()
    except Exception:
        pass
    return state


__all__ = ["log_enable", "log_disable", "trace", "ThroughputMeter",
           "machine_state", "logger"]
