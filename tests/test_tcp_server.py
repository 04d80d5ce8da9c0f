"""End-to-end TCP serving test: serve_tcp.py subprocess + C client demo.

The analog of the reference's C-demo subprocess test (demo/c/test/
test_koala_c.py:56-70: run the binary, assert exit 0 and a
"Real time factor" line).
"""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server_proc(serve_model):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["KOALA_TPU_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve_tcp.py"),
         "--port", str(port), "--streams", "4",
         "--model_path", serve_model, "--device", "cpu"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for readiness
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=1)
            s.close()
            break
        except OSError:
            if proc.poll() is not None:
                raise RuntimeError("server died: " + proc.stdout.read())
            time.sleep(0.25)
    else:
        proc.kill()
        raise RuntimeError("server did not start")
    yield port
    proc.terminate()
    proc.wait(timeout=10)


def _stream_through_socket(port, pcm: np.ndarray) -> np.ndarray:
    s = socket.create_connection(("127.0.0.1", port), timeout=60)
    s.sendall(pcm.astype("<i2").tobytes())
    s.shutdown(socket.SHUT_WR)
    chunks = []
    while True:
        data = s.recv(65536)
        if not data:
            break
        chunks.append(data)
    s.close()
    return np.frombuffer(b"".join(chunks), dtype="<i2")


def _speech_like(n, rng):
    """Loud AM harmonic tone: content every model under test (incl. the
    bundled trained suppressor, which rightly silences pure noise) passes
    through with nonzero energy."""
    t = np.arange(n) / 16000.0
    x = sum(0.3 / k * np.sin(2 * np.pi * 150.0 * k * t + rng.uniform(0, 6))
            for k in range(1, 9))
    x *= 0.55 + 0.45 * np.sin(2 * np.pi * 3.0 * t) ** 2
    return np.clip(x * 12000, -32768, 32767).astype(np.int16)


def test_python_client_roundtrip(server_proc, rng):
    pcm = _speech_like(5000, rng)
    out = _stream_through_socket(server_proc, pcm)
    assert out.shape == pcm.shape  # aligned 1:1, delay compensated
    assert np.any(out != 0)


def test_concurrent_clients(server_proc, rng):
    import threading

    pcms = [(rng.standard_normal(4000) * 5000).astype(np.int16) for _ in range(3)]
    outs = [None] * 3

    def run(i):
        outs[i] = _stream_through_socket(server_proc, pcms[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i in range(3):
        assert outs[i] is not None and outs[i].shape == pcms[i].shape


def test_c_client_demo(server_proc, tmp_path, rng):
    """Build and run the C client against the live server (reference C-demo
    test pattern: exit 0 + RTF line in stdout)."""
    build = subprocess.run(["make", "-C", os.path.join(REPO, "demo", "c")],
                           capture_output=True, text=True)
    assert build.returncode == 0, build.stderr

    from koala_tpu.io import write_wav

    pcm = (rng.standard_normal(8000) * 6000).astype(np.int16)
    in_wav = str(tmp_path / "in.wav")
    out_wav = str(tmp_path / "out.wav")
    write_wav(in_wav, pcm)

    run = subprocess.run(
        [os.path.join(REPO, "demo", "c", "koala_client_demo"),
         in_wav, out_wav, "127.0.0.1", str(server_proc)],
        capture_output=True, text=True, timeout=120)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "Real time factor" in run.stdout
    assert run.stderr == ""

    from koala_tpu.io import read_wav
    out = read_wav(out_wav)
    assert out.shape == pcm.shape
