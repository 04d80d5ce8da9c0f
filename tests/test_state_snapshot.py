"""Checkpoint/resume tests: save_state/load_state resume bit-exactly."""

import numpy as np
import pytest

import koala_tpu
from koala_tpu import KoalaInvalidArgumentError
from koala_tpu.constants import FRAME_LENGTH


def test_stream_snapshot_resume(access_key, mmse_model, rng):
    pcm = (rng.standard_normal(12 * FRAME_LENGTH) * 5000).astype(np.int16)
    half = len(pcm) // 2

    k = koala_tpu.create(access_key, model_path=mmse_model)
    full = []
    for s in range(0, len(pcm), FRAME_LENGTH):
        full.append(k.process(pcm[s:s + FRAME_LENGTH].tolist()))
    k.delete()

    # process first half, snapshot, resume in a NEW object
    k1 = koala_tpu.create(access_key, model_path=mmse_model)
    first = []
    for s in range(0, half, FRAME_LENGTH):
        first.append(k1.process(pcm[s:s + FRAME_LENGTH].tolist()))
    snap = k1.save_state()
    k1.delete()

    k2 = koala_tpu.create(access_key, model_path=mmse_model)
    k2.load_state(snap)
    second = []
    for s in range(half, len(pcm), FRAME_LENGTH):
        second.append(k2.process(pcm[s:s + FRAME_LENGTH].tolist()))
    k2.delete()

    assert first + second == full


def test_snapshot_validation(access_key, mmse_model):
    k = koala_tpu.create(access_key, model_path=mmse_model)
    snap = k.save_state()
    bad = dict(snap)
    bad.pop(sorted(bad.keys())[0])
    with pytest.raises(KoalaInvalidArgumentError):
        k.load_state(bad)
    k.delete()


def test_batch_snapshot_resume(access_key, mmse_model, rng):
    b, t = 3, 8
    pcm = (rng.standard_normal((b, t * FRAME_LENGTH)) * 5000).astype(np.int16)
    half = t // 2 * FRAME_LENGTH

    kb = koala_tpu.create_batch(access_key, batch_size=b, model_path=mmse_model)
    full = kb.process_chunk(pcm)
    kb.delete()

    kb1 = koala_tpu.create_batch(access_key, batch_size=b, model_path=mmse_model)
    first = kb1.process_chunk(pcm[:, :half])
    snap = kb1.save_state()
    kb1.delete()

    kb2 = koala_tpu.create_batch(access_key, batch_size=b, model_path=mmse_model)
    kb2.load_state(snap)
    second = kb2.process_chunk(pcm[:, half:])
    kb2.delete()

    np.testing.assert_array_equal(np.concatenate([first, second], axis=1), full)
