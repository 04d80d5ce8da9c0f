"""StreamingServer tests: async pipeline correctness vs the direct engine."""

import time

import numpy as np
import pytest

from koala_tpu.constants import FRAME_LENGTH
from koala_tpu.serve import StreamingServer


def _drain(server, stream, expected_samples, timeout=30.0):
    out = []
    total = 0
    deadline = time.time() + timeout
    while total < expected_samples and time.time() < deadline:
        chunk = server.pull(stream)
        if len(chunk):
            out.append(chunk)
            total += len(chunk)
        else:
            time.sleep(0.005)
    return np.concatenate(out) if out else np.zeros((0,), np.int16)


def test_server_matches_direct_stream(access_key, serve_model, rng):
    """Frames served through the async pipeline must equal the synchronous
    single-stream engine output bit-for-bit."""
    import koala_tpu

    t = 12
    pcm = (rng.standard_normal(t * FRAME_LENGTH) * 6000).astype(np.int16)

    k = koala_tpu.create(access_key, model_path=serve_model, device="cpu")
    direct = []
    for s in range(0, len(pcm), FRAME_LENGTH):
        direct.append(np.asarray(k.process(pcm[s:s + FRAME_LENGTH].tolist()), np.int16))
    direct = np.concatenate(direct)
    k.delete()

    server = StreamingServer(access_key, num_streams=4, model_path=serve_model,
                             device="cpu")
    try:
        server.push(2, pcm)
        served = _drain(server, 2, len(pcm))
        # batched pool (B=4) vs single stream compile to different XLA
        # programs; int16 outputs may differ by a couple of LSBs at
        # rounding edges (different matmul tiling/accumulation order; the
        # float-level agreement is ~1e-5, test_engine). Within-path
        # determinism stays bitwise (test_server_reset_determinism).
        np.testing.assert_allclose(served, direct, atol=2)
    finally:
        server.close()


def test_server_interleaved_streams(access_key, serve_model, rng):
    """Two streams with different push cadences both produce correct audio."""
    t = 8
    pcm0 = (rng.standard_normal(t * FRAME_LENGTH) * 5000).astype(np.int16)
    pcm1 = (rng.standard_normal(t * FRAME_LENGTH) * 5000).astype(np.int16)

    server = StreamingServer(access_key, num_streams=2, model_path=serve_model,
                             device="cpu")
    try:
        # stream 0 gets everything at once; stream 1 dribbles frame by frame
        server.push(0, pcm0)
        for s in range(0, len(pcm1), FRAME_LENGTH):
            server.push(1, pcm1[s:s + FRAME_LENGTH])
            time.sleep(0.002)
        out0 = _drain(server, 0, len(pcm0))
        out1 = _drain(server, 1, len(pcm1))
    finally:
        server.close()

    import koala_tpu
    for pcm, out in ((pcm0, out0), (pcm1, out1)):
        k = koala_tpu.create(access_key, model_path=serve_model, device="cpu")
        direct = np.concatenate([
            np.asarray(k.process(pcm[s:s + FRAME_LENGTH].tolist()), np.int16)
            for s in range(0, len(pcm), FRAME_LENGTH)])
        k.delete()
        # cross-program rounding tolerance: see test_server_roundtrip
        np.testing.assert_allclose(out, direct, atol=2)


def test_close_drains_inflight_output(access_key, serve_model, rng):
    """close() must route the final in-flight device step instead of
    dropping it (ADVICE r3: deferred routing silently lost the last
    dispatch's output on close)."""
    t = 40     # enough to trigger the chunked backlog path
    pcm = (rng.standard_normal(t * FRAME_LENGTH) * 5000).astype(np.int16)
    server = StreamingServer(access_key, num_streams=2, model_path=serve_model,
                             device="cpu", chunk_frames=16)
    try:
        server.push(0, pcm)
        # wait until every frame has been PROCESSED (stats count), without
        # pulling — output may still sit in the deferred in-flight slot
        deadline = time.time() + 30
        while server.stats["frames_processed"] < t and time.time() < deadline:
            time.sleep(0.005)
    finally:
        server.close()
    out = server.pull(0)
    assert len(out) == t * FRAME_LENGTH, len(out)


def test_reset_drops_inflight_output(access_key, serve_model, rng):
    """After reset(stream), no pre-reset audio may surface, even audio that
    was in flight in the dispatch pipeline when the reset landed (ADVICE
    r3: the deferred-routing window is a full chunk cycle)."""
    t = 64
    pcm = (rng.standard_normal(t * FRAME_LENGTH) * 5000).astype(np.int16)
    server = StreamingServer(access_key, num_streams=2, model_path=serve_model,
                             device="cpu", chunk_frames=32)
    try:
        for trial in range(5):
            server.push(0, pcm)
            time.sleep(0.01)        # let a chunked dispatch get in flight
            server.reset(0)
            time.sleep(0.1)         # give stale routing a chance to land
            stale = server.pull(0)
            # a sliver that raced the reset call itself is acceptable; a
            # full in-flight chunk (32 frames) surfacing is the bug
            assert len(stale) <= 8 * FRAME_LENGTH, (trial, len(stale))
            server.reset(0)
    finally:
        server.close()


def test_server_reset_stream(access_key, serve_model, rng):
    t = 6
    pcm = (rng.standard_normal(t * FRAME_LENGTH) * 5000).astype(np.int16)
    server = StreamingServer(access_key, num_streams=2, model_path=serve_model,
                             device="cpu")
    try:
        server.push(0, pcm)
        first = _drain(server, 0, len(pcm))
        server.reset(0)
        server.push(0, pcm)
        second = _drain(server, 0, len(pcm))
        np.testing.assert_array_equal(first, second)
        assert server.stats["frames_processed"] >= 2 * t
    finally:
        server.close()


def test_server_multi_device_shards(access_key, serve_model, rng):
    """devices=4 shards the slot pool across 4 of the 8 virtual CPU devices
    (per-device sub-pools + sub-states, no collectives — SURVEY §2
    parallelism: batching across streams as new capability). Every shard's
    output must match the single-device server bit-for-bit."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    t = 10
    streams = 8
    pcm = [(rng.standard_normal(t * FRAME_LENGTH) * 5000).astype(np.int16)
           for _ in range(streams)]

    ref_server = StreamingServer(access_key, num_streams=streams,
                                 model_path=serve_model, device="cpu")
    try:
        for i in range(streams):
            ref_server.push(i, pcm[i])
        ref = [_drain(ref_server, i, len(pcm[i])) for i in range(streams)]
    finally:
        ref_server.close()

    server = StreamingServer(access_key, num_streams=streams,
                             model_path=serve_model, device="cpu", devices=4)
    try:
        assert server.stats["devices"] == 4
        for i in range(streams):
            server.push(i, pcm[i])
        for i in range(streams):
            out = _drain(server, i, len(pcm[i]))
            # shard batch B=2 vs pool batch B=8 compile to different XLA
            # programs; int16 may differ by 1 LSB at rounding edges
            np.testing.assert_allclose(out, ref[i], atol=1, err_msg=str(i))
    finally:
        server.close()


def test_server_batched_push_pull(access_key, serve_model, rng):
    """push_block/pull_block move the whole pool's audio in one native hop
    each and must agree with the per-stream push/pull path."""
    t = 12
    streams = 4
    rows = (rng.standard_normal((streams, t, FRAME_LENGTH)) * 5000
            ).astype(np.int16)
    counts = np.full((streams,), t, np.int32)

    ref_server = StreamingServer(access_key, num_streams=streams,
                                 model_path=serve_model, device="cpu")
    try:
        for i in range(streams):
            ref_server.push(i, rows[i].reshape(-1))
        ref = [_drain(ref_server, i, t * FRAME_LENGTH) for i in range(streams)]
    finally:
        ref_server.close()

    server = StreamingServer(access_key, num_streams=streams,
                             model_path=serve_model, device="cpu")
    try:
        accepted = server.push_block(rows, counts)
        assert accepted == streams * t
        got = [[] for _ in range(streams)]
        need = streams * t
        deadline = time.time() + 30
        while need > 0 and time.time() < deadline:
            out_rows, out_counts = server.pull_block(max_frames=t)
            for i in range(streams):
                c = int(out_counts[i])
                if c:
                    got[i].append(out_rows[i, :c].copy().reshape(-1))
                    need -= c
            if need > 0:
                time.sleep(0.005)
        for i in range(streams):
            out = np.concatenate(got[i]) if got[i] else np.zeros(0, np.int16)
            np.testing.assert_array_equal(out, ref[i], err_msg=str(i))
    finally:
        server.close()
