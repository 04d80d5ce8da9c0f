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
        params, config = (mask_gru.init_params(jax.random.PRNGKey(0)),
                          mask_gru.DEFAULT_CONFIG)
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

    print(json.dumps({
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
    }))


if __name__ == "__main__":
    main()
