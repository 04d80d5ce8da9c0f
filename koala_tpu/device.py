"""Device-string grammar and hardware enumeration.

Reproduces the reference's device mini-grammar (reference:
include/pv_koala.h:42-46): ``best | cpu[:NUM_THREADS] | gpu[:GPU_INDEX]``,
extended TPU-first with ``tpu[:INDEX]``. On this framework the accelerator
is whatever JAX backend is live; ``cpu:N`` thread counts are accepted for
compatibility but are a no-op (XLA manages op-level parallelism itself —
see SURVEY.md §2 parallelism table).

``available_devices`` is the analog of pv_koala_list_hardware_devices
(reference: include/pv_koala.h:117-128, binding/python/_factory.py:64-76).
"""

from __future__ import annotations

import re
from typing import List, Optional

from .errors import ERROR_STACK, KoalaInvalidArgumentError, raise_with_stack

_DEVICE_RE = re.compile(r"^(best|cpu|gpu|tpu)(:(\d+))?$")


class DeviceSpec:
    """Parsed device request: kind + optional index/threads."""

    def __init__(self, kind: str, index: Optional[int] = None):
        self.kind = kind
        self.index = index

    def __repr__(self) -> str:
        return f"DeviceSpec({self.kind!r}, {self.index!r})"


def parse_device(device: str) -> DeviceSpec:
    """Parse a device string; raises KoalaInvalidArgumentError on bad grammar."""
    if not isinstance(device, str) or len(device) == 0:
        ERROR_STACK.push("`device` should be a non-empty string")
        raise_with_stack(KoalaInvalidArgumentError, "Invalid device argument")
    m = _DEVICE_RE.match(device.strip().lower())
    if m is None:
        ERROR_STACK.push(
            "device must match `best|cpu[:NUM_THREADS]|gpu[:GPU_INDEX]|tpu[:INDEX]`, got `%s`" % device)
        raise_with_stack(KoalaInvalidArgumentError, "Invalid device argument")
    kind = m.group(1)
    index = int(m.group(3)) if m.group(3) is not None else None
    return DeviceSpec(kind, index)


def resolve_jax_device(spec: DeviceSpec):
    """Resolve a DeviceSpec to a concrete jax.Device.

    ``best`` prefers an accelerator (tpu > gpu > cpu). ``cpu:N`` ignores N
    (thread-count knob is a no-op under XLA). ``gpu`` is accepted as an
    alias for the available accelerator backend so reference call sites
    keep working on TPU machines.
    """
    import jax

    all_devices = jax.devices()
    by_platform: dict = {}
    for d in all_devices:
        by_platform.setdefault(d.platform.lower(), []).append(d)

    def pick(platform: str, index: Optional[int]):
        devs = by_platform.get(platform, [])
        if not devs:
            return None
        if index is None:
            return devs[0]
        if index >= len(devs):
            # cpu:N means "N threads" in the reference grammar, not an
            # index — treat out-of-range cpu indices as the default device.
            if platform == "cpu":
                return devs[0]
            ERROR_STACK.push("device index %d out of range for %s (%d available)"
                             % (index, platform, len(devs)))
            raise_with_stack(KoalaInvalidArgumentError, "Invalid device argument")
        return devs[index]

    if spec.kind == "best":
        for platform in ("tpu", "axon", "gpu", "cuda", "rocm", "cpu"):
            d = pick(platform, None)
            if d is not None:
                return d
        return all_devices[0]

    if spec.kind == "cpu":
        d = pick("cpu", spec.index)
        if d is not None:
            return d
        # The CPU backend may exist without being the default platform
        # (e.g. jax_platforms="tpu,cpu"): query it explicitly.
        try:
            cpus = jax.devices("cpu")
            if cpus:
                return cpus[0]
        except RuntimeError:
            pass
        # No CPU backend registered at all: fall back to the default device.
        return all_devices[0]

    # gpu/tpu: any accelerator platform satisfies the request.
    for platform in ("tpu", "axon", "gpu", "cuda", "rocm"):
        d = by_platform.get(platform)
        if d:
            idx = spec.index or 0
            if idx >= len(d):
                ERROR_STACK.push("device index %d out of range for %s (%d available)"
                                 % (idx, platform, len(d)))
                raise_with_stack(KoalaInvalidArgumentError, "Invalid device argument")
            return d[idx]
    ERROR_STACK.push("no accelerator backend available for device `%s`" % spec.kind)
    raise_with_stack(KoalaInvalidArgumentError, "Invalid device argument")


def available_devices() -> List[str]:
    """List device strings accepted by create(); analog of
    pv_koala_list_hardware_devices (reference pv_koala.h:117-128)."""
    import jax

    import os

    out: List[str] = ["best"]
    counts: dict = {}
    for d in jax.devices():
        counts.setdefault(d.platform.lower(), []).append(d)
    for platform, devs in counts.items():
        name = {"axon": "tpu", "cuda": "gpu", "rocm": "gpu"}.get(platform, platform)
        for i, d in enumerate(devs):
            kind = getattr(d, "device_kind", name)
            out.append("%s:%d - %s" % (name, i, kind))
    # The reference lists "cpu:[0-N] - CPU (N threads)" (its engine has a
    # thread-count knob, pv_koala.h:42-46). Under XLA the op-level thread
    # pool is runtime-managed, so cpu:N parses but the count is a no-op —
    # the listing says so instead of silently implying the knob works.
    n = os.cpu_count() or 1
    out.append("cpu:[0-%d] - CPU (thread count accepted for compatibility; "
               "XLA manages its own thread pool)" % n)
    return out


__all__ = ["DeviceSpec", "parse_device", "resolve_jax_device", "available_devices"]
