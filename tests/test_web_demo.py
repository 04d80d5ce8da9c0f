"""Web-demo transport tests: the WebSocket PCM bridge (scripts/serve_web.py)
and the stdlib WS codec (koala_tpu/websocket.py).

The analog of the reference's web binding tests (binding/web/test/
koala.test.ts): stream a fixture through the browser-facing surface and
check the enhanced result matches the direct engine output.
"""

import base64
import hashlib
import os
import socket
import struct
import subprocess
import sys
import time

import numpy as np
import pytest

from koala_tpu.constants import FRAME_LENGTH

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ws_connect(host, port, timeout=10.0):
    """Tiny RFC6455 client: handshake + (send, recv) helpers."""
    conn = socket.create_connection((host, port), timeout=timeout)
    key = base64.b64encode(os.urandom(16)).decode()
    conn.sendall((
        "GET / HTTP/1.1\r\nHost: %s:%d\r\nUpgrade: websocket\r\n"
        "Connection: Upgrade\r\nSec-WebSocket-Key: %s\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n" % (host, port, key)).encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = conn.recv(4096)
        assert chunk, "server closed during handshake"
        resp += chunk
    assert b"101" in resp.split(b"\r\n", 1)[0], resp
    accept = base64.b64encode(hashlib.sha1(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest())
    assert accept in resp
    return conn


def _ws_send(conn, payload: bytes, opcode=2):
    mask = os.urandom(4)
    n = len(payload)
    if n < 126:
        head = struct.pack(">BB", 0x80 | opcode, 0x80 | n)
    elif n < 65536:
        head = struct.pack(">BBH", 0x80 | opcode, 0x80 | 126, n)
    else:
        head = struct.pack(">BBQ", 0x80 | opcode, 0x80 | 127, n)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    conn.sendall(head + mask + masked)


def _recv_exact(conn, n):
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _ws_recv(conn):
    hdr = _recv_exact(conn, 2)
    if hdr is None:
        return None, b""
    opcode = hdr[0] & 0x0F
    length = hdr[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", _recv_exact(conn, 2))[0]
    elif length == 127:
        length = struct.unpack(">Q", _recv_exact(conn, 8))[0]
    payload = _recv_exact(conn, length) if length else b""
    return opcode, payload or b""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def web_server(serve_model):
    port = _free_port()
    env = dict(os.environ, KOALA_TPU_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve_web.py"),
         "--port", str(port), "--streams", "4", "--model_path", serve_model],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO)
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            s = socket.create_connection(("127.0.0.1", port + 1), timeout=1)
            s.close()
            break
        except OSError:
            if proc.poll() is not None:
                raise RuntimeError(proc.stdout.read())
            time.sleep(0.2)
    else:
        proc.kill()
        raise RuntimeError("web server did not come up")
    yield ("127.0.0.1", port)
    proc.terminate()
    proc.wait(timeout=10)


def _stream_through_ws(host, ws_port, pcm: np.ndarray) -> np.ndarray:
    conn = _ws_connect(host, ws_port)
    step = FRAME_LENGTH * 16
    for i in range(0, len(pcm), step):
        _ws_send(conn, pcm[i:i + step].astype("<i2").tobytes())
    _ws_send(conn, b"eof", opcode=1)
    out = b""
    while True:
        opcode, payload = _ws_recv(conn)
        assert opcode is not None, "connection dropped"
        if opcode == 1 and payload == b"done":
            break
        if opcode == 2:
            out += payload
        if opcode == 8:
            break
    conn.close()
    return np.frombuffer(out, dtype="<i2")


def test_ws_roundtrip_matches_direct_engine(web_server, serve_model, rng):
    """Enhanced audio over the browser transport == direct engine output
    with delay compensation (the serve-side head-trim/tail-flush)."""
    import jax.numpy as jnp

    from koala_tpu.constants import DELAY_SAMPLE
    from koala_tpu.engine.core import make_engine
    from koala_tpu.engine.stream import _float_to_pcm_np
    from koala_tpu.models import mmse, params_io

    host, port = web_server
    n = FRAME_LENGTH * 40
    pcm = (rng.standard_normal(n) * 3000).astype(np.int16)

    got = _stream_through_ws(host, port + 1, pcm)
    assert len(got) == n

    params, config = params_io.load_params(serve_model)
    engine = make_engine(config.get("kind", "mmse"), config)
    hops = jnp.asarray(pcm.astype(np.float32) / 32768.0).reshape(-1, FRAME_LENGTH)
    pad = jnp.zeros((2, FRAME_LENGTH))
    _, out = engine.sequence(params, engine.init_state(()),
                             jnp.concatenate([hops, pad]))
    ref = _float_to_pcm_np(np.asarray(out)).reshape(-1)[DELAY_SAMPLE:DELAY_SAMPLE + n]
    # The server steps a B=4 pool; XLA's batched reduction order differs
    # from the single-stream reference by float ULPs, which after int16
    # rounding reaches 2 LSB on a handful of samples with the 321-input
    # trained model (transport itself is bit-exact; see tests/test_serve.py
    # for the same-batch bit parity). Alignment errors would shift whole
    # frames — bounded out by the 2-LSB cap and the mismatch-fraction cap.
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()
    assert np.count_nonzero(diff > 1) <= max(2, n // 1000), \
        np.count_nonzero(diff > 1)


def test_ws_concurrent_clients(web_server, rng):
    host, port = web_server
    n = FRAME_LENGTH * 10
    pcms = [(rng.standard_normal(n) * 2000).astype(np.int16) for _ in range(3)]
    outs = [_stream_through_ws(host, port + 1, p) for p in pcms]
    for o in outs:
        assert len(o) == n


def test_http_serves_demo_page(web_server):
    import urllib.request

    host, port = web_server
    with urllib.request.urlopen("http://%s:%d/" % (host, port), timeout=10) as r:
        body = r.read().decode()
    assert "koala_tpu" in body and "WebSocket" in body
