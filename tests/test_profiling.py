"""Observability subsystem tests."""

import logging

import numpy as np

from koala_tpu import profiling


def test_log_toggle(capsys):
    profiling.log_enable()
    profiling.logger.info("hello from koala")
    profiling.log_disable()
    profiling.logger.info("you should not see this")
    err = capsys.readouterr().err
    assert "hello from koala" in err
    assert "should not see this" not in err


def test_throughput_meter():
    m = profiling.ThroughputMeter()
    m.add_frames(256)
    m.add_frames(256)
    r = m.report
    assert r["frames"] == 512
    assert r["device_steps"] == 2
    assert abs(r["audio_seconds"] - 512 * 256 / 16000) < 1e-9
    assert r["audio_seconds_per_second"] > 0


def test_machine_state():
    state = profiling.machine_state()
    assert "time" in state
    assert state.get("cpu_count", 1) >= 1
