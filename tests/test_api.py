"""Public API contract tests, ported from the reference's behavioral suite
(reference: binding/python/test_koala.py — error stacks, reset determinism,
properties, device listing) plus KoalaBatch surface checks."""

import numpy as np
import pytest

import koala_tpu
from koala_tpu import (
    Koala,
    KoalaActivationError,
    KoalaBatch,
    KoalaError,
    KoalaInvalidArgumentError,
    KoalaInvalidStateError,
)
from koala_tpu.constants import FRAME_LENGTH


def _make(access_key, model, **kw):
    return koala_tpu.create(access_key=access_key, model_path=model, **kw)


def test_properties(access_key, untrained_model):
    k = _make(access_key, untrained_model)
    assert k.sample_rate == 16000
    assert k.frame_length == 256
    assert k.delay_sample >= 0
    assert isinstance(k.version, str) and len(k.version) > 0
    k.delete()


def test_invalid_access_key_message_stack(untrained_model):
    """Invalid key -> KoalaError with a 1..8-deep stack, identical across
    repeated failures (reference test_message_stack,
    binding/python/test_koala.py:136-162)."""
    first = None
    with pytest.raises(KoalaActivationError) as e1:
        _make("invalid", untrained_model)
    first = e1.value.message_stack
    assert 0 < len(first) < 8

    with pytest.raises(KoalaActivationError) as e2:
        _make("invalid", untrained_model)
    assert list(first) == list(e2.value.message_stack)


def test_empty_access_key(untrained_model):
    with pytest.raises(KoalaInvalidArgumentError):
        _make("", untrained_model)


def test_missing_model_file(access_key):
    with pytest.raises(KoalaError):
        _make(access_key, "/nonexistent/model.pv")


def test_bad_device_string(access_key, untrained_model):
    with pytest.raises(KoalaInvalidArgumentError):
        _make(access_key, untrained_model, device="quantum:0")


def test_process_wrong_frame_length(access_key, untrained_model):
    k = _make(access_key, untrained_model)
    with pytest.raises(KoalaInvalidArgumentError):
        k.process([0] * (FRAME_LENGTH - 1))
    k.delete()


def test_process_message_stack_on_nulled_handle(access_key, untrained_model):
    """Nulling the handle makes process raise with a populated stack
    (reference test_process_message_stack, test_koala.py:164-185)."""
    k = _make(access_key, untrained_model)
    address = k._handle
    k._handle = None
    with pytest.raises(KoalaError) as e:
        k.process([0] * FRAME_LENGTH)
    assert 0 < len(e.value.message_stack) < 8
    k._handle = address
    k.delete()


def test_deleted_object_raises(access_key, untrained_model):
    k = _make(access_key, untrained_model)
    k.delete()
    with pytest.raises(KoalaInvalidStateError):
        k.process([0] * FRAME_LENGTH)


def test_available_devices():
    devices = koala_tpu.available_devices()
    assert len(devices) > 0
    for d in devices:
        assert isinstance(d, str) and len(d) > 0


def test_device_grammar_accepted(access_key, untrained_model):
    for device in ("best", "cpu", "cpu:1", "cpu:4"):
        k = _make(access_key, untrained_model, device=device)
        k.process([0] * FRAME_LENGTH)
        k.delete()


def test_reset_determinism(access_key, mmse_model, rng):
    """Process, reset, process again -> bit-identical int16 output
    (reference test_reset, binding/python/test_koala.py:116-129)."""
    k = _make(access_key, mmse_model)
    pcm = (rng.standard_normal(20 * FRAME_LENGTH) * 3000).astype(np.int16)

    frames1 = []
    for start in range(0, len(pcm), FRAME_LENGTH):
        frames1.append(k.process(pcm[start:start + FRAME_LENGTH].tolist()))

    k.reset()
    for i, start in enumerate(range(0, len(pcm), FRAME_LENGTH)):
        out = k.process(pcm[start:start + FRAME_LENGTH].tolist())
        assert out == frames1[i]
    k.delete()


def test_enhance_length_and_alignment(access_key, identity_model, rng):
    """enhance() output aligns 1:1 with input; with the identity model it
    reproduces the input exactly (modulo int16 rounding)."""
    k = _make(access_key, identity_model)
    pcm = (rng.standard_normal(5000) * 8000).astype(np.int16)
    out = k.enhance(pcm)
    assert out.shape == pcm.shape
    np.testing.assert_allclose(out, pcm, atol=2)
    k.delete()


class TestBatch:
    def test_batch_matches_single(self, access_key, mmse_model, rng):
        b, t = 3, 6
        pcm = (rng.standard_normal((b, t * FRAME_LENGTH)) * 5000).astype(np.int16)
        kb = koala_tpu.create_batch(access_key, batch_size=b, model_path=mmse_model)
        batch_out = kb.process_chunk(pcm)
        kb.delete()

        for i in range(b):
            k = _make(access_key, mmse_model)
            outs = []
            for start in range(0, t * FRAME_LENGTH, FRAME_LENGTH):
                outs.append(k.process(pcm[i, start:start + FRAME_LENGTH].tolist()))
            k.delete()
            # chunked (sequence) vs per-frame (step) paths compile to
            # different XLA programs; int16 outputs may differ by 1 LSB
            # at rounding boundaries.
            np.testing.assert_allclose(
                batch_out[i],
                np.concatenate([np.asarray(o, np.int16) for o in outs]),
                atol=1)

    def test_per_stream_reset(self, access_key, mmse_model, rng):
        b, t = 2, 5
        kb = koala_tpu.create_batch(access_key, batch_size=b, model_path=mmse_model)
        pcm = (rng.standard_normal((b, t * FRAME_LENGTH)) * 5000).astype(np.int16)
        first = kb.process_chunk(pcm)
        kb.reset([0])
        second = kb.process_chunk(pcm)
        kb.reset()
        fresh = kb.process_chunk(pcm)
        np.testing.assert_array_equal(second[0], fresh[0])
        assert not np.array_equal(second[1], fresh[1])
        kb.delete()

    def test_batch_shape_validation(self, access_key, mmse_model):
        kb = koala_tpu.create_batch(access_key, batch_size=2, model_path=mmse_model)
        with pytest.raises(KoalaInvalidArgumentError):
            kb.process(np.zeros((3, FRAME_LENGTH), np.int16))
        with pytest.raises(KoalaInvalidArgumentError):
            kb.process_chunk(np.zeros((2, FRAME_LENGTH + 1), np.int16))
        kb.delete()


def test_sdk_tagging():
    """set_sdk/get_sdk, the analog of pv_set_sdk/pv_get_sdk
    (reference binding/python/_koala.py:156-160)."""
    assert koala_tpu.get_sdk() == "python"    # factory tags at import
    koala_tpu.set_sdk("unit-test")
    try:
        assert koala_tpu.get_sdk() == "unit-test"
        koala_tpu.set_sdk("")                 # ignored: empty is invalid
        assert koala_tpu.get_sdk() == "unit-test"
    finally:
        koala_tpu.set_sdk("python")


def test_revoked_access_key(monkeypatch, untrained_model):
    """A locally-revoked key raises ACTIVATION_REFUSED with a stack."""
    from koala_tpu import KoalaActivationRefusedError

    key = "REVOKED0" * 2
    monkeypatch.setenv("KOALA_TPU_REVOKED_KEYS", "otherkey, %s" % key)
    with pytest.raises(KoalaActivationRefusedError) as e:
        _make(key, untrained_model)
    assert 0 < len(e.value.message_stack) < 8
    # non-revoked keys still pass
    _make("TESTKEY0" * 2, untrained_model).delete()


def test_stream_quota_activation_limit(monkeypatch, untrained_model, access_key):
    """Server slots beyond the local quota raise ACTIVATION_LIMIT_REACHED."""
    from koala_tpu import KoalaActivationLimitError
    from koala_tpu.serve import StreamingServer

    monkeypatch.setenv("KOALA_TPU_MAX_STREAMS", "4")
    with pytest.raises(KoalaActivationLimitError):
        StreamingServer(access_key, num_streams=8, model_path=untrained_model)


def test_slot_exhaustion_throttles(access_key, untrained_model):
    """acquire_slot beyond capacity raises ACTIVATION_THROTTLED; release
    makes the slot reusable."""
    from koala_tpu import KoalaActivationThrottledError
    from koala_tpu.serve import StreamingServer

    server = StreamingServer(access_key, num_streams=2,
                             model_path=untrained_model)
    try:
        a = server.acquire_slot()
        b = server.acquire_slot()
        assert {a, b} == {0, 1}
        with pytest.raises(KoalaActivationThrottledError) as e:
            server.acquire_slot()
        assert len(e.value.message_stack) > 0
        server.release_slot(a)
        assert server.acquire_slot() == a
    finally:
        server.close()


def test_available_devices_documents_cpu_threads():
    devices = koala_tpu.available_devices()
    assert any(d.startswith("cpu:[0-") for d in devices), devices
