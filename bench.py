"""Benchmark: batched streaming enhancement throughput on one chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N,
   "unit": "audio-s/s/chip", "vs_baseline": N/32.0, ...}

Baseline convention: the reference's best measured single-stream number is
~32x real-time (iOS perf gate, BASELINE.md); vs_baseline is our aggregate
real-time factor per chip divided by that. The north-star target is >=1000x
(BASELINE.json).

Methodology mirrors the reference perf gates (multiple timed iterations
after a discarded warmup; binding/python/test_koala_perf.py:45-52), scaled
to the batched-streams setting: B concurrent streams, chunked scan steps,
state resident on device between calls, input resident on device (the
serving path streams int16 asynchronously; this measures engine throughput).
"""

import json
import os
import sys
import time

import numpy as np


def serving_bench(model_path: str) -> dict:
    """Honest system number: int16 frames pushed from the host through the
    StreamingServer (native ring buffers -> masked batched device step ->
    host pull), the path production audio actually takes. Reports sustained
    audio-s/s/chip plus p50/p99 per-frame round-trip latency (push -> pull).
    Reference analog: the C demo's real-time factor includes I/O
    (reference demo/c/koala_demo_file.c:500-527)."""
    from koala_tpu.constants import FRAME_LENGTH, SAMPLE_RATE
    from koala_tpu.serve import StreamingServer

    batch = int(os.environ.get("KOALA_BENCH_SERVE_STREAMS", "128"))
    secs = float(os.environ.get("KOALA_BENCH_SERVE_SECS", "6.0"))
    server = StreamingServer(
        access_key="benchbench==", num_streams=batch,
        model_path=model_path if os.path.exists(model_path) else None,
        capacity_frames=64, poll_interval_s=0.0005)
    try:
        rng = np.random.default_rng(0)
        frame = (rng.standard_normal((batch, FRAME_LENGTH)) * 1500).astype(np.int16)

        # Warmup: one full push->pull round to compile the masked step.
        for i in range(batch):
            server.push(i, frame[i])
        deadline = time.perf_counter() + 10.0
        got = 0
        while got < batch and time.perf_counter() < deadline:
            got += sum(1 for i in range(batch) if len(server.pull(i)))

        # Throughput phase: keep every ring ~half full, pull continuously.
        pushed = np.zeros(batch, np.int64)
        pulled = 0
        t0 = time.perf_counter()
        while True:
            now = time.perf_counter() - t0
            if now >= secs:
                break
            for i in range(batch):
                if server.push(i, frame[i]):
                    pushed[i] += 1
            for i in range(batch):
                pulled += len(server.pull(i)) // FRAME_LENGTH
        # Drain what's still in flight (it was processed inside the window
        # or right after; exclude drain time from the denominator).
        t_end = time.perf_counter()
        drain_deadline = t_end + 5.0
        while pulled < pushed.sum() and time.perf_counter() < drain_deadline:
            for i in range(batch):
                pulled += len(server.pull(i)) // FRAME_LENGTH
        elapsed = t_end - t0
        audio_s = pulled * FRAME_LENGTH / SAMPLE_RATE

        # Latency phase: lockstep push of ONE frame to every stream, wait
        # for all outputs; per-round round-trip = worst stream's latency.
        lat_ms = []
        for _ in range(60):
            t1 = time.perf_counter()
            for i in range(batch):
                server.push(i, frame[i])
            remaining = set(range(batch))
            while remaining and time.perf_counter() - t1 < 2.0:
                done = [i for i in remaining if len(server.pull(i))]
                remaining.difference_update(done)
            lat_ms.append((time.perf_counter() - t1) * 1000.0)
        lat = np.asarray(lat_ms)
        return {
            "serving_streams": batch,
            "serving_audio_s_per_s_per_chip": round(audio_s / elapsed, 1),
            "serving_vs_baseline": round(audio_s / elapsed / 32.0, 2),
            "serving_p50_ms": round(float(np.percentile(lat, 50)), 3),
            "serving_p99_ms": round(float(np.percentile(lat, 99)), 3),
        }
    finally:
        server.close()


def single_stream_latency(engine, params) -> dict:
    """The reference's core real-time contract: one stream's per-frame
    `process` must finish well under the 16 ms frame budget (SURVEY §3.5;
    RTF gates in reference .github/workflows/python-perf.yml:44-56).

    Two numbers:
    - step_p50/p99_ms: host-observed B=1 step_jit round-trip. On this rig
      the device sits behind a network tunnel, so this is dominated by
      tunnel RTT — it upper-bounds what a co-located host would see.
    - step_device_amortized_ms: per-frame time of a 64-frame sequence call
      (dispatch cost amortized away), the device-side compute floor.
    """
    import jax

    from koala_tpu.constants import FRAME_LENGTH

    device = jax.devices()[0]
    state = jax.device_put(engine.init_state(()), device)
    rng = np.random.default_rng(3)
    hop = (rng.standard_normal((FRAME_LENGTH,)) * 0.05).astype(np.float32)

    state, out = engine.step_jit(params, state, hop)   # compile
    np.asarray(out)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        state, out = engine.step_jit(params, state, hop)
        np.asarray(out)                                # full round-trip
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat = np.asarray(lat)

    k = 64
    hops = (rng.standard_normal((k, FRAME_LENGTH)) * 0.05).astype(np.float32)
    state2 = jax.device_put(engine.init_state(()), device)
    state2, out = engine.sequence_jit(params, state2, hops)   # compile
    np.asarray(out)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        state2, out = engine.sequence_jit(params, state2, hops)
    np.asarray(out)
    per_frame_ms = (time.perf_counter() - t0) / (iters * k) * 1000.0
    return {
        "step_p50_ms": round(float(np.percentile(lat, 50)), 3),
        "step_p99_ms": round(float(np.percentile(lat, 99)), 3),
        "step_device_amortized_ms": round(per_frame_ms, 4),
        "step_budget_ms": 16.0,
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from koala_tpu.constants import FRAME_LENGTH, SAMPLE_RATE
    from koala_tpu.engine.core import make_engine
    from koala_tpu.models import mask_gru, params_io

    model_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "models", "koala_params_tpu.pv")
    if os.path.exists(model_path):
        params, config = params_io.load_params(model_path)
    else:
        params, config = (mask_gru.init_params(jax.random.PRNGKey(0),
                                            mask_gru.TRAIN_CONFIG),
                          mask_gru.TRAIN_CONFIG)
    engine = make_engine(config.get("kind", "mask_gru"), config)

    batch = int(os.environ.get("KOALA_BENCH_BATCH", "512"))
    frames = int(os.environ.get("KOALA_BENCH_FRAMES", "376"))
    iters = int(os.environ.get("KOALA_BENCH_ITERS", "30"))

    device = jax.devices()[0]
    params = jax.device_put(params, device)
    state = jax.device_put(engine.init_state((batch,)), device)

    # Generate the input ON DEVICE: host->device bandwidth through the
    # dev-tunnel is not what we are measuring (production feeds int16 via
    # the async host pipeline), and block_until_ready is unreliable over
    # the tunnel, so all synchronization below is via scalar fetches.
    @jax.jit
    def gen(key):
        return 0.1 * jax.random.normal(key, (batch, frames, FRAME_LENGTH), jnp.float32)

    @jax.jit
    def checksum(x):
        return jnp.sum(x[..., -1])

    hops = gen(jax.random.PRNGKey(0))
    float(checksum(hops))  # force input materialization

    # Warmup / compile (discarded, reference methodology:
    # test_koala_perf.py:45-52).
    state, out = engine.sequence_jit(params, state, hops)
    float(checksum(out))

    start = time.perf_counter()
    for _ in range(iters):
        state, out = engine.sequence_jit(params, state, hops)
    # The scalar fetch forces the whole donated-state dependency chain.
    float(checksum(out))
    elapsed = time.perf_counter() - start

    audio_seconds = batch * frames * FRAME_LENGTH / SAMPLE_RATE * iters
    value = audio_seconds / elapsed

    record = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 32.0, 2),
        "batch": batch,
        "chunk_frames": frames,
        "iters": iters,
        "wall_s": round(elapsed, 4),
        "model": config.get("kind", "mask_gru"),
        "device": str(device),
    }
    # The serving-path system number (host int16 in/out via the native ring
    # buffers) rides along in the same single JSON line. Skippable for quick
    # engine-only runs via KOALA_BENCH_SERVE=0.
    if os.environ.get("KOALA_BENCH_SERVE", "1") != "0":
        try:
            record.update(serving_bench(model_path))
        except Exception as e:  # serving bench must never sink the engine number
            record["serving_error"] = repr(e)[:200]
    if os.environ.get("KOALA_BENCH_LATENCY", "1") != "0":
        try:
            record.update(single_stream_latency(engine, params))
        except Exception as e:
            record["latency_error"] = repr(e)[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
