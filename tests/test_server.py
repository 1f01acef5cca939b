"""Serving daemon test: concurrent TCP clients, per-stream segments, slot
reuse after disconnect. Runs the real model on the CPU mesh."""

import socket
import threading

import numpy as np
import pytest

from vadc_tpu import native
from vadc_tpu.io.pcm import f32_to_s16le


def _speechlike(duration_s, f0=120.0, sr=16000):
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.zeros_like(t)
    for k in range(1, 25):
        f = k * f0
        w = np.exp(-(((f - 500) / 400) ** 2)) + 0.7 * np.exp(-(((f - 1500) / 500) ** 2))
        sig += w * np.sin(2 * np.pi * f * t + k)
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


@pytest.fixture(scope="module")
def server(testdata):
    if not native.available():
        pytest.skip("native library unavailable")
    from vadc_tpu.server import VadServer

    srv = VadServer(
        port=0, max_streams=2, model=str(testdata / "silero_v31_16k.testtensor")
    )
    sock = socket.create_server(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    srv.pool.start()
    threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
    threading.Thread(target=srv._engine_loop, daemon=True).start()
    yield port, srv
    srv._stop.set()
    sock.close()


def _run_client(port: int, pcm: bytes) -> list[tuple[float, float]]:
    c = socket.create_connection(("127.0.0.1", port))
    c.sendall(pcm)
    c.shutdown(socket.SHUT_WR)
    c.settimeout(60)
    data = b""
    try:
        while True:
            chunk = c.recv(4096)
            if not chunk:
                break
            data += chunk
    except socket.timeout:
        pass
    c.close()
    return [
        tuple(float(x) for x in line.split(","))
        for line in data.decode().strip().splitlines()
        if line and not line.startswith("error")
    ]


@pytest.fixture(scope="module")
def audio():
    sil = (np.random.default_rng(0).normal(size=16000) * 0.001).astype(np.float32)
    a = np.concatenate([sil, _speechlike(2.0), sil])
    return f32_to_s16le(a)


def test_concurrent_clients(server, audio):
    port, _srv = server
    results = {}

    def go(name):
        results[name] = _run_client(port, audio)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for name, segs in results.items():
        assert len(segs) == 1, (name, segs)
        start, end = segs[0]
        assert 0.5 < start < 1.6 and 2.5 < end < 3.6, (name, segs)


def test_slot_reuse_and_overflow(server, audio):
    import time

    port, srv = server

    def wait_free(n, timeout=15.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            with srv._lock:
                if len(srv._free) >= n:
                    return
            time.sleep(0.01)
        raise AssertionError(f"slots not freed: {srv._free}")

    # both slots were used by the previous test; wait for reclamation, reuse
    wait_free(2)
    segs = _run_client(port, audio)
    assert len(segs) == 1

    # occupy both slots with never-ending clients, third gets "server full"
    wait_free(2)
    hold = [socket.create_connection(("127.0.0.1", port)) for _ in range(2)]
    deadline = time.time() + 10
    while time.time() < deadline:
        with srv._lock:
            if not srv._free:
                break
        time.sleep(0.01)
    c3 = socket.create_connection(("127.0.0.1", port))
    c3.settimeout(10)
    assert b"server full" in c3.recv(100)
    c3.close()
    for h in hold:
        h.close()