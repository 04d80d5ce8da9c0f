"""Async streaming server: many live audio streams -> batched device steps.

The TPU-native analog of the reference's Web-Worker offload (binding/web/
src/koala_worker.ts + koala_worker_handler.ts: audio thread posts frames to
a worker so it never blocks on the engine). Here:

  producers (audio callbacks)  --push-->  native StreamPool ring buffers
  dispatch thread:  gather ready frames -> masked batched engine step
                    -> route enhanced frames into native output rings
  consumers (playback callbacks)  <--pull--  native output ring buffers

The engine advances ALL pool slots in lockstep (uniform compute) but
commits state only for streams that contributed a real frame (masked
commit), so mixed-rate producers stay bit-correct. Push/pull never touch
the device; the dispatch thread owns all device traffic. Both directions
of the host data plane are single native calls per batch (kt_pool_push_rows
/ kt_pool_gather_chunk / kt_pool_push_rows_f32) — the whole pool's audio
moves per hop, never per-stream Python loops (the reference's worker
message pump marshals whole frames in one hop the same way,
koala_worker_handler.ts:123-155).

Scale-out: ``devices=N`` (or "all") shards the slot pool across N local
accelerator devices — per-device sub-pools with independent params/state,
no cross-device collectives (each stream is a data-parallel unit; SURVEY §2
parallelism table "batching across streams" as new capability). Dispatch
issues all N device steps back-to-back (async) each round, so the devices
run concurrently.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Dict, List, Optional, Union

import numpy as np

import jax

from .constants import DELAY_SAMPLE, FRAME_LENGTH, SAMPLE_RATE
from .device import parse_device, resolve_jax_device
from .engine.batch import masked_reset
from .engine.core import make_engine
from .engine.stream import validate_access_key
from .errors import (
    ERROR_STACK,
    KoalaActivationLimitError,
    KoalaActivationThrottledError,
    KoalaInvalidArgumentError,
    raise_with_stack,
)
from .sdk import max_streams_quota
from .hostlib import StreamPool
from .models import params_io


class _Shard:
    """One device's slice of the stream pool: [lo, hi) slots."""

    def __init__(self, device, lo: int, hi: int, params, state):
        self.device = device
        self.lo = lo
        self.hi = hi
        self.params = params
        self.state = state


class StreamingServer:
    """Batched streaming enhancement service over ``num_streams`` slots."""

    def __init__(
            self,
            access_key: str,
            num_streams: int,
            model_path: Optional[str] = None,
            device: Optional[str] = None,
            devices: Union[int, str, None] = None,
            capacity_frames: int = 256,
            out_capacity_frames: Optional[int] = None,
            poll_interval_s: float = 0.002,
            chunk_frames: int = 32,
            pipeline_depth: int = 3):
        validate_access_key(access_key)
        quota = max_streams_quota()
        if quota and num_streams > quota:
            # The in-process analog of the reference's license usage limit
            # (pv_status ACTIVATION_LIMIT_REACHED, picovoice.h:51).
            ERROR_STACK.push("requested %d stream slots, AccessKey quota is %d"
                             % (num_streams, quota))
            raise_with_stack(KoalaActivationLimitError, "Initialization failed")
        model_path = model_path or params_io.default_model_path()
        if not os.path.exists(model_path):
            ERROR_STACK.push("could not find model file at `%s`" % model_path)
            raise_with_stack(KoalaInvalidArgumentError, "Initialization failed")

        self.num_streams = num_streams
        dev0 = resolve_jax_device(parse_device(device or "best"))
        dev_list = self._resolve_device_list(dev0, devices, num_streams)
        params, config = params_io.load_params(model_path)
        self._engine = make_engine(config.get("kind", "mask_gru"), config)

        # Contiguous slot ranges per device (sizes differ by at most one).
        bounds = np.linspace(0, num_streams, len(dev_list) + 1).astype(int)
        self._shards: List[_Shard] = []
        for d, lo, hi in zip(dev_list, bounds[:-1], bounds[1:]):
            p = jax.device_put(params, d)
            with jax.default_device(d):
                st = self._engine.init_state((int(hi - lo),))
            self._shards.append(_Shard(d, int(lo), int(hi), p, st))

        self._pool = StreamPool(num_streams, FRAME_LENGTH, capacity_frames)
        # Output rings: must absorb the client's pull cadence; overflow
        # drops (counted) rather than blocking the dispatch thread.
        out_cap = out_capacity_frames or max(4 * capacity_frames,
                                             4 * chunk_frames)
        self._out_pool = StreamPool(num_streams, FRAME_LENGTH, out_cap)
        self._chunk_frames = max(1, min(chunk_frames, capacity_frames))
        self._free_slots = list(range(num_streams))
        self._slot_lock = threading.Lock()
        self._out_lock = threading.Lock()
        self._reset_pending = np.zeros((num_streams,), bool)
        # Per-stream reset generation: routing drops in-flight output from
        # before a reset (the deferred one-iteration routing would otherwise
        # deliver up to chunk_frames of stale pre-reset audio to a ring the
        # slot's NEXT client may already own).
        self._reset_gen = np.zeros((num_streams,), np.int64)
        self._reset_lock = threading.Lock()
        self._poll = poll_interval_s
        self._frames_processed = 0
        self._steps = 0

        eng = self._engine

        def _reset_fn(state, mask):
            return masked_reset(state, eng.init_state((mask.shape[0],)), mask)

        self._reset_jit = jax.jit(_reset_fn, donate_argnums=(0,))

        # Serving-facing step variants with int16 at BOTH device boundaries:
        # uploads ship the gathered int16 frames as-is and the output is
        # quantized to int16 on device — 2 bytes/sample each way instead of
        # 4, and zero host-side conversion work. The int16->f32 scale and
        # the round-half-even + saturate quantization are identical to the
        # host-path conversions, so results are bit-equal.
        from .engine.core import float_to_pcm, pcm_to_float

        def _step_i16(params, state, hop_i16, active):
            st, out = eng.step_masked(params, state, pcm_to_float(hop_i16),
                                      active)
            return st, float_to_pcm(out)

        def _chunk_i16(params, state, hops_i16, counts):
            st, out = eng.chunk_masked(params, state, pcm_to_float(hops_i16),
                                       counts)
            return st, float_to_pcm(out)

        # Full-chunk fast path: when every active stream has a FULL chunk
        # of backlog (the steady throughput state), the whole chunk runs
        # through the hoisted SEQUENCE engine (batched feature/encoder/
        # decoder matmuls + the fused Pallas GRU kernel) instead of the
        # per-frame chunk_masked lax.scan — several times less device time
        # per frame. Streams with no frames keep their state via a masked
        # commit (identical to k masked steps with all-or-nothing counts:
        # sequence ≡ folded steps is the engine's core invariant).
        import jax.numpy as _jnp

        def _seq_i16(params, state, hops_i16, active):
            new_state, out = eng.sequence(params, state,
                                          pcm_to_float(hops_i16))

            def sel(new, old):
                m = active.reshape(active.shape +
                                   (1,) * (new.ndim - active.ndim))
                return _jnp.where(m, new, old)

            committed = jax.tree_util.tree_map(sel, new_state, state)
            return committed, float_to_pcm(out)

        self._step_i16_jit = jax.jit(_step_i16, donate_argnums=(1,))
        self._chunk_i16_jit = jax.jit(_chunk_i16, donate_argnums=(1,))
        self._seq_i16_jit = jax.jit(_seq_i16, donate_argnums=(1,))

        # Dispatch/route pipeline: the dispatch thread issues device steps
        # asynchronously and hands (out, counts, gen) to the router thread,
        # which blocks on the device fetch and routes into the output rings.
        # A bounded queue caps the number of in-flight device steps, so
        # throughput is device/compute-limited instead of being serialized
        # on one dispatch round-trip per routed batch (the RTT to a
        # tunneled/remote device would otherwise be the ceiling).
        import queue as _queue

        self._route_q: "_queue.Queue" = _queue.Queue(
            maxsize=max(1, pipeline_depth))
        self._running = True
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._router = threading.Thread(target=self._route_loop, daemon=True)
        self._thread.start()
        self._router.start()

    @staticmethod
    def _resolve_device_list(dev0, devices, num_streams):
        if devices in (None, 1):
            return [dev0]
        same = [d for d in jax.devices() if d.platform == dev0.platform]
        n = len(same) if devices == "all" else int(devices)
        if n < 1 or n > len(same):
            ERROR_STACK.push("requested %s devices, %d available on platform "
                             "`%s`" % (devices, len(same), dev0.platform))
            raise_with_stack(KoalaInvalidArgumentError,
                             "Invalid devices argument")
        if num_streams < n:
            ERROR_STACK.push("num_streams=%d < devices=%d" % (num_streams, n))
            raise_with_stack(KoalaInvalidArgumentError,
                             "Invalid devices argument")
        return same[:n]

    # -- producer API (any thread) ----------------------------------------

    def acquire_slot(self) -> int:
        """Claim a free stream slot; raises KoalaActivationThrottledError
        when every slot is busy (the reference's ACTIVATION_THROTTLED state,
        picovoice.h:52 — request rate exceeds what the license/capacity
        admits). Pair with release_slot()."""
        with self._slot_lock:
            if not self._free_slots:
                ERROR_STACK.push("all %d stream slots are busy" % self.num_streams)
                raise_with_stack(KoalaActivationThrottledError,
                                 "Stream admission throttled")
            return self._free_slots.pop()

    def release_slot(self, stream: int) -> None:
        """Reset and return a slot claimed with acquire_slot()."""
        self.reset(stream)
        with self._slot_lock:
            if stream not in self._free_slots:
                self._free_slots.append(stream)

    def push(self, stream: int, samples: np.ndarray) -> bool:
        """Append int16 samples to a stream. False on ring overflow."""
        return self._pool.push(stream, samples)

    def push_block(self, rows: np.ndarray, counts: np.ndarray,
                   first_stream: int = 0) -> int:
        """Batched producer hop: append counts[i] frames from rows[i]
        ([n, k, 256] int16) to streams first_stream+i in ONE native call.
        Returns total frames accepted (overflowing rings drop)."""
        return self._pool.push_rows(rows, counts, first_stream)

    def pull(self, stream: int, max_frames: Optional[int] = None) -> np.ndarray:
        """Fetch enhanced int16 samples queued for a stream (may be empty)."""
        with self._out_lock:
            ready = self._out_pool.frames_ready(stream)
            take = ready if max_frames is None else min(ready, max_frames)
            if take <= 0:
                return np.zeros((0,), np.int16)
            return self._out_pool.pull(stream, take * FRAME_LENGTH)

    def pull_block(self, max_frames: int):
        """Batched consumer hop: pop up to ``max_frames`` enhanced frames
        from EVERY stream in one native call. Returns (rows [B, k, 256]
        int16, counts [B]) — rows beyond counts[i] are zero. The returned
        buffers are reused by the next call; copy to retain."""
        with self._out_lock:
            rows, counts, _ = self._out_pool.gather_chunk(max_frames)
        return rows, counts

    def reset(self, stream: int) -> None:
        """Schedule a stream reset (applied before its next frame)."""
        self._pool.reset_stream(stream)
        with self._reset_lock:
            self._reset_pending[stream] = True
            self._reset_gen[stream] += 1
        # Ordering matters: the generation bump above happens BEFORE the
        # output-ring clear, so routing (which re-checks generations under
        # _out_lock) either sees the bump and skips, or appends before this
        # clear runs — never stale-after-clear.
        with self._out_lock:
            self._out_pool.reset_stream(stream)

    # -- dispatch thread ---------------------------------------------------

    def _route_loop(self) -> None:
        """Router thread: blocks on each in-flight device step's output and
        routes it into the native output rings (one batched f32 push per
        shard). Runs concurrently with the dispatch thread, which keeps
        issuing device steps — so fetch latency (tunnel/PCIe RTT) overlaps
        compute instead of serializing the pipeline."""
        while True:
            item = self._route_q.get()
            if item is None:                       # close() sentinel
                return
            self._route(*item)

    def _route(self, outs_dev, counts, gen) -> None:
        # np.asarray blocks until each shard's device step has finished;
        # the device already quantized to int16 (half the fetch bytes).
        outs_np = [np.asarray(o) for o in outs_dev]
        n = 0
        with self._out_lock:
            # Re-check generations INSIDE _out_lock: a concurrent reset()
            # bumps the generation before clearing the ring, so either we
            # see the bump here (skip), or our append completes before its
            # clear runs (stale frames removed).
            with self._reset_lock:
                cur_gen = self._reset_gen.copy()
            valid = counts.copy()
            valid[cur_gen != gen] = 0
            for shard, out_np in zip(self._shards, outs_np):
                n += self._out_pool.push_rows(
                    out_np, valid[shard.lo:shard.hi],
                    first_stream=shard.lo)
        self._frames_processed += n
        self._steps += 1

    def _dispatch_loop(self) -> None:
        """Device dispatch with backlog amortization + a routed pipeline.

        Two compiled paths share the streaming state:
        - no backlog (every stream has <= 1 ready frame): single-frame
          masked step, minimum latency;
        - backlog: gather up to ``chunk_frames`` frames per stream and run
          ONE chunked device step per shard (a lax.scan of the same masked
          step, so results are bit-identical to k single steps) — one
          dispatch round-trip covers k frames per stream instead of one.

        Dispatches are handed to the router thread through a bounded queue
        (``pipeline_depth`` in-flight device steps): the put() blocks only
        when the device is genuinely behind, and the state-dependency chain
        (donated state N feeds step N+1) keeps results exact regardless of
        depth. With multiple shards, each round's device steps are issued
        back-to-back — the devices run concurrently.
        """
        while self._running:
            with self._reset_lock:
                pending = self._reset_pending.copy()
                self._reset_pending[:] = False
            if pending.any():
                for shard in self._shards:
                    m = pending[shard.lo:shard.hi]
                    if m.any():
                        shard.state = self._reset_jit(shard.state, m)

            batch, counts, total = self._pool.gather_chunk(self._chunk_frames)
            # The pool's gather buffers are REUSED on the next call, but jax
            # zero-copies aligned numpy arrays into async dispatches — every
            # array handed to a jit below must be a private copy (the
            # .astype() calls copy `batch`; `counts` needs an explicit one).
            counts = counts.copy()
            # Snapshot generations AFTER the gather, and void the frames of
            # any stream whose reset() landed between the pending snapshot
            # above and the gather (ADVICE r4: those frames are pre-reset
            # audio already popped from the ring — processing them would
            # advance the freshly-reset state with flushed audio; zeroing
            # their count makes the masked step skip the state commit, and
            # reset() semantics already promise buffered audio is dropped).
            with self._reset_lock:
                gen_snapshot = self._reset_gen.copy()
                late = self._reset_pending.copy()
            if late.any():
                counts[late] = 0
                total = int(counts.sum())
            if total == 0:
                time.sleep(self._poll)
                continue

            outs = []
            if counts.max() <= 1:
                hop_all = batch[:, 0, :].copy()       # private int16 upload
                for shard in self._shards:
                    active = counts[shard.lo:shard.hi].astype(bool)
                    shard.state, out = self._step_i16_jit(
                        shard.params, shard.state,
                        hop_all[shard.lo:shard.hi], active)
                    outs.append(out)
            else:
                hops_all = batch.copy()               # private int16 upload
                # all-or-nothing full chunks -> hoisted sequence fast path
                # (k is pinned to chunk_frames so there is ONE compiled
                # shape; partial-count rounds take the masked scan)
                full_seq = (counts.max() == self._chunk_frames
                            and bool(np.all((counts == 0) |
                                            (counts == self._chunk_frames))))
                for shard in self._shards:
                    c = counts[shard.lo:shard.hi]
                    if full_seq:
                        shard.state, out = self._seq_i16_jit(
                            shard.params, shard.state,
                            hops_all[shard.lo:shard.hi], c.astype(bool))
                    else:
                        shard.state, out = self._chunk_i16_jit(
                            shard.params, shard.state,
                            hops_all[shard.lo:shard.hi], c)
                    outs.append(out)
            self._route_q.put((outs, counts, gen_snapshot))

    # -- lifecycle ---------------------------------------------------------

    @property
    def stats(self) -> Dict[str, float]:
        return {
            "frames_processed": self._frames_processed,
            "device_steps": self._steps,
            "audio_seconds": self._frames_processed * FRAME_LENGTH / SAMPLE_RATE,
            "dropped_samples": self._pool.dropped_samples,
            "dropped_output_samples": self._out_pool.dropped_samples,
            "devices": len(self._shards),
        }

    @property
    def delay_sample(self) -> int:
        return DELAY_SAMPLE

    @property
    def frame_length(self) -> int:
        return FRAME_LENGTH

    def close(self) -> None:
        self._running = False
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)
        # Drain: the router routes every queued in-flight step, then stops
        # at the sentinel — close() never drops enhanced audio.
        self._route_q.put(None)
        if self._router.is_alive():
            self._router.join(timeout=10.0)
        self._pool.close()
        # The output pool stays alive: clients may still pull enhanced audio
        # that close() just drained from the final in-flight step (it is
        # freed with the server object via StreamPool.__del__).


__all__ = ["StreamingServer"]
