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


def test_warmup_holds_state_and_serving_still_exact(testdata, audio):
    """warmup() compiles the tick via an all-idle pass; per-stream state
    must come through bit-identical (active and reset are all-False, so
    the masked merge provably holds), and a client served AFTER warmup
    must get the same segments as ever."""
    if not native.available():
        pytest.skip("native library unavailable")
    import jax.numpy as jnp

    from vadc_tpu.server import VadServer

    srv = VadServer(
        port=0, max_streams=2, model=str(testdata / "silero_v31_16k.testtensor")
    )
    # make the held state distinguishable from zeros
    srv.state.h.block_until_ready()
    h0 = np.asarray(srv.state.h) + 0.25
    c0 = np.asarray(srv.state.c) - 0.125
    from vadc_tpu.engine.runner import StreamState

    srv.state = StreamState(jnp.asarray(h0), jnp.asarray(c0), srv.state.context)
    srv.warmup()
    np.testing.assert_array_equal(np.asarray(srv.state.h), h0)
    np.testing.assert_array_equal(np.asarray(srv.state.c), c0)
    # fresh-slot reset still zeroes state for a real client post-warmup
    sock = socket.create_server(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    srv.pool.start()
    threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
    threading.Thread(target=srv._engine_loop, daemon=True).start()
    try:
        segs = _run_client(port, audio)
        assert len(segs) == 1, segs
        start, end = segs[0]
        assert 0.5 < start < 1.6 and 2.5 < end < 3.6, segs
    finally:
        srv._stop.set()
        sock.close()


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

def test_sharded_server_matches_unsharded(testdata, audio):
    """Slot axis sharded over the 8 virtual devices (pure stream-DP, the
    batch CLI's mesh applied to serving): same segments as the unsharded
    engine for concurrent clients."""
    import jax

    if not native.available():
        pytest.skip("native library unavailable")
    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    from vadc_tpu.server import VadServer

    srv = VadServer(
        port=0,
        max_streams=len(jax.devices()),
        model=str(testdata / "silero_v31_16k.testtensor"),
        shard=True,
    )
    assert srv.mesh is not None and srv.mesh.size == len(jax.devices())
    sock = socket.create_server(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    srv.pool.start()
    threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
    threading.Thread(target=srv._engine_loop, daemon=True).start()
    try:
        results = {}

        def go(name):
            results[name] = _run_client(port, audio)

        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for name, segs in results.items():
            assert len(segs) == 1, (name, segs)
            start, end = segs[0]
            # same expectations as test_concurrent_clients on the unsharded
            # engine: the sharded tick must produce the same segmentation
            assert 0.5 < start < 1.6 and 2.5 < end < 3.6, (name, segs)
    finally:
        srv._stop.set()
        sock.close()


def test_server_checkpoint_resume(testdata):
    """Drain → save → restart → bit-identical continuation, including a
    segment that closed before the save and is held as the pending merge
    candidate (SURVEY §5.4; VERDICT r1 weak #5)."""
    import time

    if not native.available():
        pytest.skip("native library unavailable")
    from vadc_tpu.server import VadServer

    sil = (np.random.default_rng(1).normal(size=24000) * 0.001).astype(np.float32)
    burst = _speechlike(2.0)
    full = np.concatenate([sil[:16000], burst, sil, burst, sil[:16000]])
    pcm = f32_to_s16le(full)
    chunk_bytes = 1536 * 2
    # split mid-silence AFTER segment 1 closed, on a chunk boundary
    cut = (len(pcm) // 2 // chunk_bytes) * chunk_bytes
    part1, part2 = pcm[:cut], pcm[cut:]

    def start_server():
        srv = VadServer(
            port=0, max_streams=1,
            model=str(testdata / "silero_v31_16k.testtensor"),
        )
        sock = socket.create_server(("127.0.0.1", 0))
        srv.pool.start()
        threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
        threading.Thread(target=srv._engine_loop, daemon=True).start()
        return srv, sock, sock.getsockname()[1]

    # reference: uninterrupted run
    srv_ref, sock_ref, port_ref = start_server()
    expected = _run_client(port_ref, pcm)
    srv_ref._stop.set()
    sock_ref.close()
    assert len(expected) == 2, expected

    # part 1: keep the connection open, wait for drain + held pending
    srv1, sock1, port1 = start_server()
    a = socket.create_connection(("127.0.0.1", port1))
    a.sendall(part1)
    n_chunks_part1 = cut // chunk_bytes
    deadline = time.time() + 60
    while time.time() < deadline:
        s = srv1.slots[0]
        if (
            int(srv1.fsm.chunk_index[0]) >= n_chunks_part1
            and s is not None
            and s.pending is not None
        ):
            break
        time.sleep(0.02)
    assert srv1.slots[0] is not None and srv1.slots[0].pending is not None, (
        "segment 1 must be closed and held pending at the save point"
    )
    import tempfile, os
    ckpt_path = os.path.join(tempfile.mkdtemp(), "server.ckpt")
    srv1.save_checkpoint(ckpt_path)
    srv1._stop.set()
    a.close()
    sock1.close()

    # restart + restore: the reconnecting client continues the stream
    srv2, sock2, port2 = start_server()
    srv2.restore_checkpoint(ckpt_path)
    got = _run_client(port2, part2)
    srv2._stop.set()
    sock2.close()
    assert got == expected


def test_restore_redelivers_unsent_output(testdata, tmp_path):
    """Lines that were rendered but still backpressured at checkpoint time
    are re-delivered to the reconnecting client after a restore — the
    serving analogue of not losing the held pending segment."""
    if not native.available():
        pytest.skip("native library unavailable")
    from vadc_tpu.engine.checkpoint import EngineCheckpoint
    from vadc_tpu.server import VadServer

    def start_server():
        srv = VadServer(
            port=0, max_streams=1,
            model=str(testdata / "silero_v31_16k.testtensor"),
        )
        sock = socket.create_server(("127.0.0.1", 0))
        srv.pool.start()
        threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
        threading.Thread(target=srv._engine_loop, daemon=True).start()
        return srv, sock, sock.getsockname()[1]

    # craft a checkpoint whose slot 0 holds unsent output bytes: save a
    # fresh server's state, then inject the outbox content
    srv0, sock0, _ = start_server()
    path = tmp_path / "server.ckpt"
    srv0.save_checkpoint(path)
    srv0._stop.set()
    sock0.close()
    ckpt = EngineCheckpoint.load(path)
    ckpt.sendbuf = [b"0.50,1.00\n"]
    ckpt.save(path)

    srv, sock, port = start_server()
    srv.restore_checkpoint(path)
    sil = f32_to_s16le(
        (np.random.default_rng(3).normal(size=16000) * 0.001).astype(np.float32)
    )
    got = _run_client(port, sil)  # silence: the only output is re-delivery
    srv._stop.set()
    sock.close()
    assert got == [(0.50, 1.00)]


def _bare_outbox_server():
    """A VadServer shell exposing just the outbox machinery (no native
    pool, no model): _queue_segment/_pump_outbox only touch cfg, slots,
    and the observability counters."""
    from collections import deque

    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.server import VadServer

    srv = VadServer.__new__(VadServer)
    srv.cfg = SegmenterConfig.from_ms(chunk_samples=1536)
    srv.slots = [None]
    srv.segments_dropped = 0
    srv.delivery_latencies = deque(maxlen=20000)
    return srv


@pytest.mark.parametrize("blocking", [False, True])
def test_outbox_never_blocks_and_preserves_line_integrity(blocking):
    """A client that stops reading must not stall emits (the engine tick
    runs them under the state lock): queueing N segments to a
    backpressured socket completes in bounded time, the outbox cap drops
    oldest whole lines only, and whatever IS delivered is intact, ordered
    segment lines — never a torn line. Covers BOTH socket modes: raw
    clients' sockets are O_NONBLOCK (shared with the ingest pool), wav
    clients' sockets stay BLOCKING (the intake decoder reads them), so
    the pump's writability probe is what prevents a wedge."""
    import time

    from vadc_tpu.server import _Slot

    srv = _bare_outbox_server()
    a, b = socket.socketpair()
    a.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 4096)
    a.setblocking(blocking)
    slot = _Slot(a)
    srv.slots[0] = slot

    n = 5000
    t0 = time.perf_counter()
    for i in range(n):
        srv._queue_segment(0, 10 * i + 2, 10 * i + 6)
    elapsed = time.perf_counter() - t0
    # the old code waited up to 5 s per blocked line; queueing must be
    # orders of magnitude cheaper than even ONE such wait
    assert elapsed < 2.0, f"queueing blocked: {elapsed:.1f}s for {n} segments"
    assert len(slot.outbox) <= srv._OUTBOX_CAP_LINES + 1
    assert srv.segments_dropped > 0  # cap actually engaged

    # drain: the peer starts reading; pump until empty
    b.setblocking(False)
    received = bytearray()
    deadline = time.monotonic() + 30
    while (slot.outbox or slot.head_off) and time.monotonic() < deadline:
        srv._pump_outbox(slot)
        try:
            while True:
                got = b.recv(65536)
                if not got:
                    break
                received += got
        except BlockingIOError:
            pass
    try:
        while True:
            got = b.recv(65536)
            if not got:
                break
            received += got
    except BlockingIOError:
        pass
    assert not slot.outbox
    lines = received.decode().splitlines()
    assert received.endswith(b"\n"), "torn trailing line"
    starts = [float(l.split(",")[0]) for l in lines]
    # every delivered line is intact and strictly ordered (drops leave
    # gaps, never reordering or corruption)
    assert starts == sorted(starts) and len(set(starts)) == len(starts)
    # delivered + dropped accounts for every queued segment
    assert len(lines) + srv.segments_dropped == n
    a.close()
    b.close()


def test_churn_no_dropped_or_duplicated_segments(testdata):
    """Connect/disconnect storms: waves of short-lived clients over a small
    slot pool, every client must receive EXACTLY its own segments (no drops,
    no duplicates, no cross-slot leakage of another stream's state). Uses
    the serve_bench harness so the sustained-benchmark path is CI-covered."""
    if not native.available():
        pytest.skip("native library unavailable")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from serve_bench import run_serving_bench

    result = run_serving_bench(
        n_clients=4,
        seconds=4.0,
        rtf=8.0,
        precision="fast",
        model=str(testdata / "silero_v31_16k.testtensor"),
        churn=True,
    )
    assert result["client_errors"] == 0, result
    assert result["churn_errors"] == 0, result
    # every steady client got exactly the expected segment count
    assert result["delivery_exact"] == result["clients"], result
    assert result["delivered_min"] == result["expected_segments_per_client"], result
    assert result["delivered_max"] == result["expected_segments_per_client"], result
    assert result["churn_clients"] > 0, "churn never ran"


def test_wav_client_and_raw_client_agree(server, audio):
    """A client streaming a 44.1 kHz wav container gets the same segments
    as one streaming raw model-rate s16le of the same material — the
    per-connection RIFF sniff + native decode path."""
    import struct

    port, _srv = server

    sil441 = (
        np.random.default_rng(0).normal(size=44100) * 0.001
    ).astype(np.float32)
    a441 = np.concatenate([sil441, _speechlike(2.0, sr=44100), sil441])
    pcm441 = np.clip(a441 * 32768, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 2, 2, 16)
    wav_blob = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm441)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm441)) + pcm441
    )

    raw_segs = _run_client(port, audio)
    wav_segs = _run_client(port, wav_blob)
    assert len(raw_segs) == len(wav_segs) == 1, (raw_segs, wav_segs)
    (rs, re), (ws, we) = raw_segs[0], wav_segs[0]
    # independently-sampled material: allow two 96 ms chunks per edge
    # (the onset sits near a chunk boundary by construction)
    assert abs(rs - ws) <= 0.2 and abs(re - we) <= 0.2


def test_wav_client_slot_recycles(server, audio):
    """After a wav client disconnects, its slot (and decode pipe) is
    recycled and serves a raw client again."""
    import struct
    import time

    port, srv = server
    pcm = audio  # raw 16 kHz payload doubles as a wav data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    segs = _run_client(port, blob)
    assert len(segs) == 1
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and len(srv._free) < 2:
        time.sleep(0.05)
    assert len(srv._free) == 2
    assert all(s is None or s.pipe_fd is None for s in srv.slots)
    # the recycled slot serves a raw client
    assert len(_run_client(port, pcm)) == 1


def test_wav_client_malformed_header_gets_error_and_recycles(server):
    """A client whose RIFF header is malformed (sr=0) gets a one-line
    error and its slot recycles — untrusted bytes must not leak slots."""
    import struct
    import time

    port, srv = server
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)  # sample rate 0
    blob = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    c = socket.create_connection(("127.0.0.1", port))
    c.sendall(blob)
    c.shutdown(socket.SHUT_WR)
    c.settimeout(30)
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
    assert b"error:" in data and b"zero sample rate" in data
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline and len(srv._free) < 2:
        time.sleep(0.05)
    assert len(srv._free) == 2, "slot leaked after malformed wav header"


@pytest.mark.parametrize("family", ["v3", "v5"])
def test_tick2_parity_with_sequential_ticks(testdata, tmp_path, family):
    """The catch-up tick (two chunks per stream in one device call) must be
    numerically equivalent to two sequential plain ticks — including reset
    applied before sub-step 0 only, per-sub-step active masks (a stream
    active only in the SECOND sub-chunk models a chunk that arrived between
    the engine's two gathers), and idle-hold merging. The v5 case is the
    one where state.context is not None, so tick2's per-sub-step context
    zero/hold/merge actually executes (v3 leaves that branch dead)."""
    if not native.available():
        pytest.skip("native library unavailable")
    import jax.numpy as jnp

    from vadc_tpu.engine.runner import StreamState
    from vadc_tpu.server import VadServer

    if family == "v3":
        model = str(testdata / "silero_v31_16k.testtensor")
    else:
        from vadc_tpu.io.testtensor import save_testtensor
        from vadc_tpu.models.synthetic import random_v5_archive

        model = str(tmp_path / "v5.testtensor")
        save_testtensor(model, random_v5_archive())
    srv = VadServer(port=0, max_streams=4, model=model)
    if family == "v5":
        assert srv.state.context is not None, "v5 must carry context state"
    rng = np.random.default_rng(3)
    n, c = srv.n, srv.chunk
    ba = (rng.normal(size=(n, c)) * 3000).astype(np.int16)
    bb = (rng.normal(size=(n, c)) * 3000).astype(np.int16)
    aa = np.array([True, True, False, True])
    ab = np.array([True, False, True, False])
    reset = np.array([False, True, False, False])
    none = np.zeros(n, bool)

    h0 = np.asarray(srv.state.h) + 0.1  # nonzero so reset/hold are visible
    c0 = np.asarray(srv.state.c) - 0.05
    ctx0 = None if srv.state.context is None else np.asarray(srv.state.context)

    def fresh_state():
        # ticks DONATE their state argument — every call needs its own copy
        return StreamState(
            jnp.asarray(h0),
            jnp.asarray(c0),
            None if ctx0 is None else jnp.asarray(ctx0),
        )

    p_a, s1 = srv._tick(
        srv._params, jnp.asarray(ba), fresh_state(), jnp.asarray(aa),
        jnp.asarray(reset),
    )
    p_b, s2 = srv._tick(
        srv._params, jnp.asarray(bb), s1, jnp.asarray(ab), jnp.asarray(none)
    )
    q2, t2 = srv._tick2(
        srv._params, jnp.asarray(ba), jnp.asarray(bb), fresh_state(),
        jnp.asarray(aa), jnp.asarray(ab), jnp.asarray(reset),
    )
    q2 = np.asarray(q2)  # [N, 2] stacked: one D2H materialization
    # tick and tick2 are different XLA programs, so fusion may reassociate
    # float ops — allow noise at the fp32 ulp scale, nothing model-visible
    np.testing.assert_allclose(q2[:, 0], np.asarray(p_a), atol=2e-6, rtol=0)
    np.testing.assert_allclose(q2[:, 1], np.asarray(p_b), atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(t2.h), np.asarray(s2.h), atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(t2.c), np.asarray(s2.c), atol=2e-6, rtol=0)
    if ctx0 is not None:
        np.testing.assert_allclose(
            np.asarray(t2.context), np.asarray(s2.context), atol=2e-6, rtol=0
        )


@pytest.mark.parametrize("shard", [False, True])
def test_catchup_tick_drains_backlog_exactly(testdata, audio, shard):
    """A deliberately slowed tick forces the rings to back up; the engine
    must fall into the catch-up path (catchup_ticks > 0) and STILL deliver
    the exact segments — same numbers the plain path produces. Runs both
    the single-device tick2 and the mesh-sharded one (slot axis over all
    virtual devices), so the sharded catch-up jit is exercised
    deterministically, not just when an unpaced client happens to race."""
    if not native.available():
        pytest.skip("native library unavailable")
    import time

    import jax

    if shard and len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    from vadc_tpu.server import VadServer

    srv = VadServer(
        port=0,
        max_streams=len(jax.devices()) if shard else 2,
        model=str(testdata / "silero_v31_16k.testtensor"),
        shard=shard,
    )
    orig_tick, orig_tick2 = srv._tick, srv._tick2

    def slow_tick(*a):
        time.sleep(0.05)
        return orig_tick(*a)

    def slow_tick2(*a):
        time.sleep(0.05)
        return orig_tick2(*a)

    srv._tick, srv._tick2 = slow_tick, slow_tick2
    sock = socket.create_server(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    srv.pool.start()
    threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
    threading.Thread(target=srv._engine_loop, daemon=True).start()
    try:
        segs = _run_client(port, audio)  # unpaced: much faster than realtime
        assert len(segs) == 1, segs
        start, end = segs[0]
        assert 0.5 < start < 1.6 and 2.5 < end < 3.6, segs
        assert srv.catchup_ticks > 0, "backlog never hit the catch-up path"
    finally:
        srv._stop.set()
        sock.close()


def test_server_checkpoint_saves_v5_context(tmp_path):
    """Server-level save/restore must carry the v5 context column: the
    context branch of VadServer.save_checkpoint is dead code under v3
    (state.context is None), so only a v5-family server exercises it.
    Random synthetic weights are fine — the assertion is state fidelity,
    not segmentation."""
    if not native.available():
        pytest.skip("native library unavailable")
    import jax.numpy as jnp

    from vadc_tpu.engine.runner import StreamState
    from vadc_tpu.io.testtensor import save_testtensor
    from vadc_tpu.models.synthetic import random_v5_archive
    from vadc_tpu.server import VadServer

    model = str(tmp_path / "v5.testtensor")
    save_testtensor(model, random_v5_archive())
    srv = VadServer(port=0, max_streams=2, model=model)
    assert srv.state.context is not None
    rng = np.random.default_rng(5)
    h = rng.normal(size=np.asarray(srv.state.h).shape).astype(np.float32)
    c = rng.normal(size=np.asarray(srv.state.c).shape).astype(np.float32)
    ctx = rng.normal(size=np.asarray(srv.state.context).shape).astype(
        np.float32
    )
    srv.state = StreamState(jnp.asarray(h), jnp.asarray(c), jnp.asarray(ctx))
    srv.fsm.chunk_index[:] = [3, 7]
    path = str(tmp_path / "srv.ckpt")
    srv.save_checkpoint(path)

    srv2 = VadServer(port=0, max_streams=2, model=model)
    srv2.restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(srv2.state.h), h)
    np.testing.assert_array_equal(np.asarray(srv2.state.c), c)
    np.testing.assert_array_equal(np.asarray(srv2.state.context), ctx)
    assert list(srv2.fsm.chunk_index[:2]) == [3, 7]
