"""Native host-library tests (ring buffers, gather, PCM conversion)."""

import threading

import numpy as np
import pytest

from koala_tpu import hostlib


@pytest.fixture(scope="module")
def lib():
    return hostlib.load_hostlib()


def test_version(lib):
    assert lib.kt_host_version().decode().startswith("3.0.0")


def test_pcm_roundtrip(lib, rng):
    pcm = (rng.standard_normal(10000) * 12000).astype(np.int16)
    f = hostlib.pcm_to_f32(pcm)
    np.testing.assert_allclose(f, pcm.astype(np.float32) / 32768.0, atol=1e-7)
    back = hostlib.f32_to_pcm(f)
    np.testing.assert_array_equal(back, pcm)


def test_rms_matches_reference_convention(lib, rng):
    pcm = (rng.standard_normal(5000) * 8000).astype(np.int16)
    expect = np.sqrt(np.mean((pcm.astype(np.float64) / 32768.0) ** 2))
    assert abs(hostlib.rms(pcm) - expect) < 1e-5


def test_pool_basic_gather(rng):
    pool = hostlib.StreamPool(num_streams=4, frame_length=256, capacity_frames=8)
    data = (rng.standard_normal((4, 256)) * 1000).astype(np.int16)
    # streams 0 and 2 get a full frame; stream 1 partial; stream 3 nothing
    assert pool.push(0, data[0])
    assert pool.push(1, data[1][:100])
    assert pool.push(2, data[2])
    batch, active, n = pool.gather()
    assert n == 2
    assert list(active) == [True, False, True, False]
    np.testing.assert_array_equal(batch[0], data[0])
    np.testing.assert_array_equal(batch[2], data[2])
    np.testing.assert_array_equal(batch[1], 0)
    # complete stream 1's frame
    assert pool.push(1, data[1][100:])
    batch, active, n = pool.gather()
    assert n == 1 and active[1]
    np.testing.assert_array_equal(batch[1], data[1])
    pool.close()


def test_pool_overflow_accounting(rng):
    pool = hostlib.StreamPool(num_streams=1, frame_length=256, capacity_frames=2)
    big = np.zeros(256 * 64, np.int16)
    ok = pool.push(0, big)
    assert not ok
    assert pool.dropped_samples > 0
    pool.close()


def test_pool_reset_stream(rng):
    pool = hostlib.StreamPool(num_streams=2, frame_length=256, capacity_frames=8)
    pool.push(0, np.ones(512, np.int16))
    pool.push(1, np.ones(512, np.int16))
    pool.reset_stream(0)
    assert pool.frames_ready(0) == 0
    assert pool.frames_ready(1) == 2
    pool.close()


def test_pool_concurrent_producer(rng):
    """SPSC ring: producer thread pushes while consumer gathers."""
    frames = 200
    pool = hostlib.StreamPool(num_streams=1, frame_length=256, capacity_frames=16)
    src = (rng.standard_normal(frames * 256) * 5000).astype(np.int16)

    def producer():
        for i in range(frames):
            while pool.frames_ready(0) >= 15:
                pass
            pool.push(0, src[i * 256:(i + 1) * 256])

    t = threading.Thread(target=producer)
    t.start()
    got = []
    while len(got) < frames:
        batch, active, n = pool.gather()
        if n:
            got.append(batch[0].copy())
    t.join()
    np.testing.assert_array_equal(np.concatenate(got), src)
    assert pool.dropped_samples == 0
    pool.close()
