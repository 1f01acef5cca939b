"""Multi-client VAD serving daemon.

TCP line protocol: a client connects, streams raw 16 kHz mono s16le PCM —
or a wav container at any rate/bits/channels, sniffed by its RIFF magic and
decoded natively per connection (`cat file.wav | nc host port` works) — and
receives speech-segment events as `start,end\\n` (seconds, padded/merged —
the CLI's output contract) while the stream is live. Half-closing the write
side (or disconnecting) ends the stream; the server applies the EOF snap,
flushes the final segment, and reuses the slot.

Architecture (the full serving composition):
  * client sockets are drained GIL-free by the native StreamPool into
    per-stream chunk rings (wav clients route through a per-connection
    decoder thread feeding the pool via a pipe; raw clients stay
    zero-copy on the native path);
  * one engine loop advances ALL active slots per tick in a single batched
    device call (LSTM state device-resident, masked so idle slots hold);
  * the segmentation FSM runs in the native C++ kernel with per-stream chunk
    counters; pad/merge and the EOF snap run on host per event.

    python -m vadc_tpu.server --port 7355 --max_streams 64 [--fast]
    # then: cat audio.s16le | nc -q1 localhost 7355
"""

from __future__ import annotations

import argparse
import select
import socket
import sys
import threading
import time

import numpy as np


class _Slot:
    __slots__ = ("conn", "pending", "done_sent", "pipe_fd", "outbox", "head_off")

    def __init__(self, conn: socket.socket):
        self.conn = conn
        self.pending: tuple[int, int] | None = None  # merged segment (chunks)
        self.done_sent = False
        # wav clients: read end of the decode pipe the pool drains (the
        # pool never closes fds; _finish_slot must)
        self.pipe_fd: int | None = None
        # rendered-but-unsent segment lines (client backpressure): emits
        # only QUEUE here — the engine loop pumps the bytes out with
        # non-blocking sends, so a slow client can never stall the tick
        self.outbox: list[bytes] = []
        self.head_off = 0  # bytes of outbox[0] already sent (partial write)


class VadServer:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 7355,
        *,
        max_streams: int = 64,
        model: str | None = None,
        fast: bool = False,
        precision: str | None = None,
        sequence_count: int = 1536,
        shard: bool | None = None,
    ):
        import jax
        import jax.numpy as jnp

        from vadc_tpu import native
        from vadc_tpu.cli.main import resolve_weights_path, clamp_sequence_count
        from vadc_tpu.cli.segmenter import SegmenterConfig
        from vadc_tpu.engine.runner import StreamRunner, StreamState, _step
        from vadc_tpu.models.weights import load_params
        from vadc_tpu.runtime import enable_persistent_compilation_cache

        if not native.available():
            raise RuntimeError("native library required (make -C native)")
        enable_persistent_compilation_cache()
        self._jnp = jnp
        self.family, params = load_params(resolve_weights_path(model))
        self.chunk = clamp_sequence_count(self.family, sequence_count)
        self.n = max_streams
        if precision is None:
            precision = "fast" if fast else "faithful"
        self.runner = StreamRunner(self.family, params, precision=precision)
        self.state = self.runner.init_state(self.n)
        # Multi-device serving: shard the SLOT axis over all local devices
        # (pure stream-DP, like ShardedStreamRunner — streams never
        # communicate). Auto-enabled when >1 device is present and
        # max_streams divides evenly; slots are device-resident, the host
        # only moves each tick's [n, chunk] audio and [n] probabilities.
        devices = jax.devices()
        if shard is None:
            shard = len(devices) > 1 and self.n % len(devices) == 0
        self.mesh = None
        if shard:
            if self.n % len(devices):
                raise ValueError(
                    f"max_streams {self.n} must divide evenly over "
                    f"{len(devices)} devices to shard"
                )
            from vadc_tpu.engine.shard import make_stream_mesh

            self.mesh = make_stream_mesh()
        self.cfg = SegmenterConfig.from_ms(chunk_samples=self.chunk)
        self.fsm = native.NativeFsm(
            self.n,
            threshold=self.cfg.threshold,
            neg_threshold=self.cfg.neg_threshold,
            min_silence_chunks=self.cfg.min_silence_chunks,
            min_speech_chunks=self.cfg.min_speech_chunks,
        )
        self.pool = native.StreamPool(self.n, self.chunk, ring_chunks=64)
        self.slots: list[_Slot | None] = [None] * self.n
        self._free = list(range(self.n))
        # pool attachment gate: a slot's pool stream keeps the PREVIOUS
        # client's drained/EOF state until add_fd resets it, and intake may
        # delay add_fd by the sniff window — the engine must not finish a
        # slot whose fd isn't attached yet
        self._attached = np.zeros(self.n, bool)
        self._lock = threading.Lock()
        # serializes the engine tick (which DONATES self.state to the jit
        # call) against checkpoint snapshots: without it, save_checkpoint
        # under load can materialize an already-donated array ("Array has
        # been deleted") — found by the serving fault-injection wave
        self._state_lock = threading.Lock()
        self._reset_requests: list[int] = []
        # slots restored from a checkpoint: the next client accepted on such
        # a slot continues the saved stream (no state reset; inherits the
        # held pending segment) instead of starting fresh
        self._resume_slots: dict[int, tuple[int, int] | None] = {}
        # rendered-but-unsent bytes restored from a checkpoint, re-queued
        # when the slot's client reconnects (at-least-once delivery)
        self._resume_sendbuf: dict[int, bytes] = {}
        # segment lines dropped to unresponsive clients (outbox cap / EOF
        # flush timeout) — observability, mirrors the old 5 s-drop behavior
        self.segments_dropped = 0
        self.host, self.port = host, port
        self._stop = threading.Event()
        # serving observability (bounded; ~30 min of 96 ms ticks): per-tick
        # wall time for ticks that processed audio, and event->socket-write
        # emission latency per segment line. Read by tools/serve_bench.py;
        # the reference's analogue is the stats line (vadc.c:1037-1081),
        # generalized to N streams.
        from collections import deque

        self.tick_times: deque = deque(maxlen=20000)
        # ticks that drained TWO queued chunks per stream (engine behind)
        self.catchup_ticks = 0
        # emit_latencies: FSM event -> line rendered+queued+first send
        # attempt (the engine-side emit cost). delivery_latencies: line
        # queued -> fully handed to the kernel, INCLUDING time parked in
        # the outbox under client backpressure (what the client observes).
        self.emit_latencies: deque = deque(maxlen=20000)
        self.delivery_latencies: deque = deque(maxlen=20000)

        # one jitted tick: batched step + masked merge (idle slots hold) +
        # masked reset (fresh slots restart from zeros)
        import functools

        step = functools.partial(_step, self.runner.module, self.family)

        def _map_state(state, fn):
            return StreamState(
                fn(state.h),
                fn(state.c),
                None if state.context is None else fn(state.context),
            )

        def _masked_zero(state, mask):
            # Reset recycled slots BEFORE the step: a slot whose first audio
            # chunk arrives in the same tick as its reset request must be
            # computed from zeroed state, not the previous client's leftovers.
            def z(x):
                m = mask[None, :, None] if x.ndim == 3 else mask[:, None]
                return jnp.where(m, jnp.zeros_like(x), x)

            return _map_state(state, z)

        def _masked_merge(new, old, mask):
            # idle slots hold their (possibly just-reset) state
            def pick(n, o):
                m = mask[None, :, None] if n.ndim == 3 else mask[:, None]
                return jnp.where(m, n, o)

            return StreamState(
                pick(new.h, old.h),
                pick(new.c, old.c),
                None
                if old.context is None
                else pick(new.context, old.context),
            )

        def _dequant(batch):
            # batch arrives as RAW s16 (the pool's rings are s16: half the
            # host->device bytes per tick, the binding cost at 1k streams).
            # /32768 is a power-of-two scale — bit-identical to converting
            # on host (io/pcm.py), and XLA fuses it into the first op.
            return batch.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)

        def _run_step(params, batch, state):
            if precision != "faithful":
                from vadc_tpu.nn import functional as F

                with F.precision_mode(precision):
                    return step(params, batch, state)
            return step(params, batch, state)

        def tick(params, batch, state, active, reset):
            state = _masked_zero(state, reset)
            probs, new_state = _run_step(params, _dequant(batch), state)
            return probs, _masked_merge(new_state, state, active)

        def tick2(params, batch_a, batch_b, state, active_a, active_b, reset):
            """Catch-up tick: the two OLDEST queued chunks per stream in one
            device call. When the engine falls behind the chunk cadence
            (slow tick, tunnel hiccup, faster-than-realtime clients) rings
            back up while each plain tick drains only one chunk per stream
            — this drains two, so the engine recovers at up to 2x the
            shortfall instead of never. Numerically identical to two
            sequential ticks (parity-tested): reset applies before sub-step
            0 only; each sub-step merges under its own active mask (a chunk
            that arrived between the two gathers rides in sub-step 1 with
            active_a false)."""
            state = _masked_zero(state, reset)
            probs_a, s1 = _run_step(params, _dequant(batch_a), state)
            state = _masked_merge(s1, state, active_a)
            probs_b, s2 = _run_step(params, _dequant(batch_b), state)
            # ONE stacked [N, 2] output, not two [N] arrays: each separate
            # host materialization pays a tunnel RTT, and the second RTT
            # made tick2 cost ~73 ms vs ~59 ms for two plain ticks —
            # slower than the problem it exists to solve (measured, 64
            # streams). Stacked: one D2H, tick2 ~= one tick + compute.
            return (
                jnp.stack([probs_a, probs_b], axis=1),
                _masked_merge(s2, state, active_b),
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from vadc_tpu.engine.shard import STREAM_AXIS

            replicated = NamedSharding(self.mesh, P())
            b0 = NamedSharding(self.mesh, P(STREAM_AXIS))
            b1 = NamedSharding(self.mesh, P(None, STREAM_AXIS))  # h/c [L,B,H]
            state_sh = StreamState(
                b1, b1, b0 if self.state.context is not None else None
            )
            self._tick = jax.jit(
                tick,
                donate_argnums=(2,),
                in_shardings=(replicated, b0, state_sh, b0, b0),
                out_shardings=(b0, state_sh),
            )
            self._tick2 = jax.jit(
                tick2,
                donate_argnums=(3,),
                in_shardings=(replicated, b0, b0, state_sh, b0, b0, b0),
                out_shardings=(b0, state_sh),
            )
            self._params = jax.device_put(self.runner.params, replicated)
        else:
            self._tick = jax.jit(tick, donate_argnums=(2,))
            self._tick2 = jax.jit(tick2, donate_argnums=(3,))
            self._params = self.runner.params

    def warmup(self) -> None:
        """Compile the engine tick before the first client connects.

        The first tick otherwise pays the jit compile inside the engine
        loop while connected clients wait — on a cold backend (or a busy
        single-core host) that can exceed a client's read timeout, so every
        early stream appears to stall. One all-idle tick (active and reset
        both all-False: state provably holds) compiles the exact
        production HLO. Cheap when the persistent compile cache hits."""
        jnp = self._jnp
        zeros = np.zeros((self.n, self.chunk), np.int16)
        off = np.zeros(self.n, bool)
        with self._state_lock:
            probs, self.state = self._tick(
                self._params,
                jnp.asarray(zeros),
                self.state,
                jnp.asarray(off),
                jnp.asarray(off),
            )
            np.asarray(probs)  # block until the compile + tick complete
            # the catch-up tick compiles here too: its first production use
            # is BY DEFINITION a moment the engine is already behind — the
            # worst possible time to pay a jit compile
            probs2, self.state = self._tick2(
                self._params,
                jnp.asarray(zeros),
                jnp.asarray(zeros),
                self.state,
                jnp.asarray(off),
                jnp.asarray(off),
                jnp.asarray(off),
            )
            np.asarray(probs2)

    # ---- client lifecycle -------------------------------------------------

    def _accept_loop(self, server_sock: socket.socket) -> None:
        while not self._stop.is_set():
            try:
                conn, _addr = server_sock.accept()
            except OSError:
                return
            with self._lock:
                if not self._free:
                    conn.sendall(b"error: server full\n")
                    conn.close()
                    continue
                slot = self._free.pop()
                # gate BEFORE publishing the slot: the engine's finish
                # check is lock-free, so if it saw the fresh _Slot with
                # attached still True it would finish the new connection
                # against the previous client's drained pool state
                self._attached[slot] = False
                self.slots[slot] = _Slot(conn)
                if slot in self._resume_slots:
                    # checkpoint continuation: keep LSTM/FSM state, re-attach
                    # the held pending segment and any rendered-but-unsent
                    # bytes from the snapshot, skip the reset
                    self.slots[slot].pending = self._resume_slots.pop(slot)
                    buf = self._resume_sendbuf.pop(slot, b"")
                    if buf:
                        # re-queue as individual lines, not one blob: the
                        # outbox cap counts entries, and drop accounting
                        # must count real lines. The blob may START with a
                        # partial-line suffix (checkpoint taken mid-send);
                        # it always ENDS on a line boundary.
                        now = time.perf_counter()
                        parts = buf.split(b"\n")
                        tail = parts.pop()  # b"" on a boundary
                        entries = [(p + b"\n", now) for p in parts]
                        if tail:
                            entries.append((tail, now))
                        self.slots[slot].outbox.extend(entries)
                else:
                    self._reset_requests.append(slot)
            # intake runs off-thread: it may block up to the sniff timeout
            # peeking for a wav magic, and for wav clients it becomes the
            # long-lived decoder; raw clients get their socket fd handed to
            # the GIL-free pool untouched (the peek consumes nothing)
            threading.Thread(
                target=self._intake, args=(slot, conn), daemon=True
            ).start()

    def _intake(self, slot: int, conn: socket.socket) -> None:
        """Sniff the client's first bytes: raw s16le goes straight to the
        native pool; a RIFF/WAVE header routes through the native decoder
        (any rate/bits/channels -> model-rate mono s16le) into a pipe the
        pool drains — `cat file.wav | nc host port` just works."""
        import os

        from vadc_tpu.io.wav import WavFormatError, WavSource, is_riff_wave

        head = b""
        deadline = time.monotonic() + 2.0
        # MSG_PEEK never drains, so recv can't return b'' to signal a
        # half-close while <12 bytes sit buffered; poll for RDHUP instead
        rdhup = getattr(select, "POLLRDHUP", 0x2000)
        poller = select.poll()
        poller.register(conn, select.POLLIN | rdhup)
        try:
            conn.settimeout(0.25)
            while len(head) < 12 and time.monotonic() < deadline:
                try:
                    got = conn.recv(12, socket.MSG_PEEK)
                except TimeoutError:
                    continue
                if not got:
                    break  # connection closed before any bytes
                if len(got) == len(head):
                    # live but no new bytes; a peer FIN means no more
                    # will come — stop waiting and treat as raw
                    # (poll(0): POLLIN is always set with bytes buffered,
                    # so only a non-blocking RDHUP check is meaningful)
                    if any(
                        ev & rdhup for _fd, ev in poller.poll(0)
                    ):
                        break
                    time.sleep(0.02)
                head = got
        except OSError:
            pass
        try:
            conn.settimeout(None)
        except OSError:
            pass  # fd still drains below; the pool will observe its EOF
        if not is_riff_wave(head):
            self.pool.add_fd(slot, conn.fileno())
            self._attached[slot] = True
            return
        r, w = os.pipe()
        with self._lock:
            s = self.slots[slot]
            if s is None or s.conn is not conn:  # recycled mid-sniff
                os.close(r)
                os.close(w)
                return
            s.pipe_fd = r
        self.pool.add_fd(slot, r)
        self._attached[slot] = True
        target = getattr(self.runner.module, "SAMPLE_RATE", 16000)
        try:
            with WavSource(conn.makefile("rb"), target_rate=target) as src:
                while True:
                    data = src.read(1 << 16)
                    if not data:
                        break
                    os.write(w, data)
        except (WavFormatError, ValueError) as e:
            # ValueError defensively: untrusted header fields must never
            # kill the intake thread (a dead thread would leak the slot)
            try:
                conn.sendall(f"error: {e}\n".encode())
            except OSError:
                pass
        except OSError:
            pass  # client or pipe went away mid-stream
        finally:
            os.close(w)  # pool sees EOF -> drain tail -> slot recycles

    def _emit(self, slot: int, start_c: int, end_c: int, *, flush: bool = False) -> None:
        """Pad/merge like the CLI (vadc.c:262-299) and send to the client."""
        s = self.slots[slot]
        if s is None:
            return
        spc, pad = self.cfg.seconds_per_chunk, self.cfg.speech_pad_s
        if s.pending is not None:
            pend_end_padded = s.pending[1] * spc + pad
            new_start_padded = max(start_c * spc - pad, 0.0)
            if pend_end_padded >= new_start_padded:
                s.pending = (s.pending[0], end_c)
            else:
                self._queue_segment(slot, *s.pending)
                s.pending = (start_c, end_c)
        else:
            s.pending = (start_c, end_c)
        if flush and s.pending is not None:
            self._queue_segment(slot, *s.pending)
            s.pending = None

    # an unresponsive client's outbox is capped; beyond it the oldest
    # unsent whole lines are dropped (the reference's analogue drops a
    # line after 5 s of backpressure rather than wedge, vadc.c's stdout
    # never blocks this way). ~16 KB of segment lines per slot.
    _OUTBOX_CAP_LINES = 1024

    def _queue_segment(self, slot: int, start_c: int, end_c: int) -> None:
        """Render the segment line and queue it. Deliberately CHEAP: emits
        run under _state_lock (tick/checkpoint coherence), so the socket
        write happens in _pump_outbox — a client that stops reading must
        never stall the engine tick, every other stream, or a checkpoint."""
        s = self.slots[slot]
        if s is None:
            return
        spc, pad = self.cfg.seconds_per_chunk, self.cfg.speech_pad_s
        start = max(start_c * spc - pad, 0.0)
        end = end_c * spc + pad
        s.outbox.append((f"{start:.2f},{end:.2f}\n".encode(), time.perf_counter()))
        if len(s.outbox) > self._OUTBOX_CAP_LINES:
            # never drop the partially-sent head — splitting a line would
            # corrupt the client's stream; drop the oldest whole lines
            keep = 1 if s.head_off else 0
            excess = len(s.outbox) - self._OUTBOX_CAP_LINES
            del s.outbox[keep : keep + excess]
            self.segments_dropped += excess
        self._pump_outbox(s)

    @staticmethod
    def _conn_writable(conn, timeout_s: float):
        """POLLOUT probe: True = writable, False = would block, None = fd
        gone. poll(), NEVER select(): past ~1024 concurrent clients,
        server-side fds exceed FD_SETSIZE and select() raises ValueError
        for every high-fd client — which the old except-clause misread as
        'client gone' and silently discarded the outbox. The 1024-socket
        bench exposed it as a deterministic all-or-nothing zero-delivery
        for exactly the slots whose fd landed above 1023."""
        try:
            p = select.poll()
            p.register(conn, select.POLLOUT)
            events = p.poll(max(timeout_s, 0.0) * 1000)
        except (OSError, ValueError):  # fd closed under us
            return None
        if not events:
            return False
        if events[0][1] & select.POLLOUT:
            return True  # send() will surface any pending error itself
        return None  # POLLERR/POLLHUP/POLLNVAL only: peer gone

    def _pump_outbox(self, s: _Slot) -> bool:
        """Drain a slot's queued segment lines without EVER blocking.
        Returns True when the outbox is empty (or the client is gone),
        False when the socket can't take more bytes right now.

        A writability probe guards every send: wav clients' sockets stay
        in BLOCKING mode (the intake decoder reads them with blocking
        reads) and during the RIFF sniff the socket is in timeout mode, so
        a bare send() could wedge or raise TimeoutError. Bookkeeping is
        never torn: callers either hold _state_lock (engine loop,
        checkpoint-coherent) or solely own the detached slot (closer
        thread after _finish_slot)."""
        while s.outbox:
            writable = self._conn_writable(s.conn, 0.0)
            if writable is None:  # fd closed under us
                s.outbox.clear()
                s.head_off = 0
                return True
            if not writable:
                return False
            line, t_queued = s.outbox[0]
            try:
                n = s.conn.send(line[s.head_off :] if s.head_off else line)
            except (BlockingIOError, TimeoutError):
                return False
            except OSError:
                s.outbox.clear()
                s.head_off = 0
                return True
            s.head_off += n
            if s.head_off >= len(line):
                s.outbox.pop(0)
                s.head_off = 0
                # true delivery latency: rendered -> fully handed to the
                # kernel, INCLUDING time parked under backpressure
                self.delivery_latencies.append(time.perf_counter() - t_queued)
        return True

    def _flush_outbox_blocking(self, s: _Slot, timeout: float = 5.0) -> None:
        """EOF flush: give a backpressured client up to `timeout` to drain
        its remaining lines, then drop. Runs on the closer thread (never
        the engine loop — a 5 s wait there would freeze every stream's
        tick); each pump runs under _state_lock so a concurrent checkpoint
        never captures torn partial-write bookkeeping, while the WAIT
        itself happens outside the lock."""
        deadline = time.monotonic() + timeout
        while True:
            with self._state_lock:
                if self._pump_outbox(s):
                    return
            remaining = deadline - time.monotonic()
            writable = self._conn_writable(s.conn, max(remaining, 0.0))
            if remaining <= 0 or not writable:
                with self._state_lock:
                    self.segments_dropped += len(s.outbox)
                    s.outbox.clear()
                    s.head_off = 0
                return

    def _finish_slot(self, slot: int) -> None:
        """EOF snap (vadc.c:1005-1027), flush, close, recycle.

        The emit/flush and the four FSM-array resets happen under
        _state_lock so a concurrent save_checkpoint can never capture a
        half-reset slot (e.g. triggered already 0 but chunk_index still
        old, which restore would misread as a live stream to resume)."""
        fsm = self.fsm
        with self._state_lock:
            last_chunk = int(fsm.chunk_index[slot]) - 1
            if fsm.triggered[slot]:
                start = int(fsm.speech_start[slot])
                if last_chunk - start > self.cfg.min_speech_chunks:
                    self._emit(slot, start, last_chunk)
            s = self.slots[slot]
            if s is not None and s.pending is not None:
                self._queue_segment(slot, *s.pending)
                s.pending = None
            # reset FSM state for reuse
            fsm.triggered[slot] = 0
            fsm.speech_start[slot] = 0
            fsm.temp_end[slot] = 0
            fsm.chunk_index[slot] = 0
        if s is None:
            with self._lock:
                self.slots[slot] = None
                self._free.append(slot)
            return
        # detach the slot from the engine's view BEFORE any flush wait:
        # from here the closer below is the _Slot's sole owner (no
        # concurrent pumps; a checkpoint sees the slot as free — correct,
        # the stream is finished and has nothing to resume)
        with self._lock:
            self.slots[slot] = None

        def closer():
            self._flush_outbox_blocking(s)
            try:
                s.conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            s.conn.close()
            if s.pipe_fd is not None:
                import os

                try:
                    os.close(s.pipe_fd)  # wav decode pipe read end
                except OSError:
                    pass
            with self._lock:
                self._free.append(slot)

        if s.outbox:
            # backpressured client at EOF: the flush may wait up to 5 s —
            # never on the engine thread (it would freeze every stream)
            threading.Thread(target=closer, daemon=True).start()
        else:
            closer()

    # ---- checkpoint / resume ----------------------------------------------

    def save_checkpoint(self, path) -> None:
        """Snapshot the complete per-slot resumable state (SURVEY §5.4):
        LSTM h/c (+ v5 context), FSM fields, per-slot chunk counters, and
        each slot's held pending segment. Client sockets do not survive a
        restart; `restore_checkpoint` marks saved slots for continuation so
        reconnecting clients resume their streams bit-identically."""
        import jax.numpy as jnp
        from vadc_tpu.engine.checkpoint import EngineCheckpoint
        from vadc_tpu.engine.vectorized_segmenter import FsmState

        from vadc_tpu.engine.runner import StreamState

        fsm = self.fsm
        # snapshot under the state lock: the engine tick donates
        # self.state's buffers, so an unsynchronized read under load can
        # materialize an already-deleted array; fsm arrays, each slot's
        # pending segment, AND the resume-held pendings are captured in the
        # same critical section (emits and slot finishing also run under
        # _state_lock) so the snapshot is exactly one tick's view — pending
        # taken outside it could be a tick newer than the FSM arrays, and a
        # checkpoint taken before a restored client reconnects must not
        # drop the pending still held in _resume_slots. Lock order when
        # nested: _state_lock, then _lock.
        #
        # Only CHEAP work happens under the lock: the device state is
        # snapshotted by dispatching async on-device copies (the runtime
        # orders them before the next tick's donation), and the slow host
        # materialization — ~30-40 ms per array through the remote-device
        # tunnel — runs after release. Materializing under the lock stalled
        # the engine tick ~100 ms per checkpoint (serving tick p99 spike,
        # caught by bench.py's round-over-round diff).
        with self._state_lock:
            with self._lock:
                pending = []
                sendbuf = []
                for slot in range(self.n):
                    s = self.slots[slot]
                    p = s.pending if s is not None else None
                    if p is None:
                        p = self._resume_slots.get(slot)
                    pending.append(p)
                    # rendered-but-unsent lines: saved so a restore can
                    # re-deliver them (the partially-sent head line keeps
                    # only its unsent suffix — resending sent bytes would
                    # corrupt the reconnecting client's stream)
                    buf = b""
                    if s is not None and s.outbox:
                        buf = b"".join(ln for ln, _t in s.outbox)[s.head_off :]
                    if not buf:
                        buf = self._resume_sendbuf.get(slot, b"")
                    sendbuf.append(buf)
            h_dev = jnp.array(self.state.h, copy=True)
            c_dev = jnp.array(self.state.c, copy=True)
            ctx_dev = (
                None
                if self.state.context is None
                else jnp.array(self.state.context, copy=True)
            )
            fsm_state = FsmState(
                triggered=jnp.asarray(fsm.triggered.astype(bool)),
                speech_start=jnp.asarray(fsm.speech_start.astype(np.int32)),
                temp_end=jnp.asarray(fsm.temp_end.astype(np.int32)),
                chunk_index=jnp.int32(int(fsm.chunk_index.max(initial=0))),
            )
            chunk_indices = fsm.chunk_index.astype(np.int32).copy()
        state = StreamState(
            np.asarray(h_dev),
            np.asarray(c_dev),
            None if ctx_dev is None else np.asarray(ctx_dev),
        )
        EngineCheckpoint(
            family=self.family,
            model_state=state,
            fsm_state=fsm_state,
            chunk_index=int(chunk_indices.max(initial=0)),
            pending=pending,
            chunk_indices=chunk_indices,
            sendbuf=sendbuf,
        ).save(path)

    def restore_checkpoint(self, path) -> None:
        """Load a snapshot into a fresh server: device state, FSM arrays,
        and per-slot continuation markers. Call before serve_forever()."""
        from vadc_tpu.engine.checkpoint import EngineCheckpoint

        ckpt = EngineCheckpoint.load(path)
        if ckpt.family != self.family:
            raise ValueError(
                f"checkpoint family {ckpt.family!r} != server {self.family!r}"
            )
        self.state = ckpt.model_state
        fsm = self.fsm
        fsm.triggered[:] = np.asarray(ckpt.fsm_state.triggered).astype(
            fsm.triggered.dtype
        )
        fsm.speech_start[:] = np.asarray(ckpt.fsm_state.speech_start)
        fsm.temp_end[:] = np.asarray(ckpt.fsm_state.temp_end)
        fsm.chunk_index[:] = (
            ckpt.chunk_indices
            if ckpt.chunk_indices is not None
            else ckpt.chunk_index
        )
        pending = ckpt.pending or [None] * self.n
        sendbuf = ckpt.sendbuf or [b""] * self.n
        with self._lock:
            for slot in range(self.n):
                had_state = (
                    pending[slot] is not None
                    or bool(sendbuf[slot])
                    or fsm.chunk_index[slot] > 0
                    or fsm.triggered[slot]
                )
                if had_state:
                    self._resume_slots[slot] = pending[slot]
                    if sendbuf[slot]:
                        self._resume_sendbuf[slot] = sendbuf[slot]

    # ---- engine loop ------------------------------------------------------

    def _engine_loop(self) -> None:
        jnp = self._jnp
        reset = np.zeros(self.n, bool)
        while not self._stop.is_set():
            batch, ready, count, backlog = self.pool.gather()
            active = ready > 0
            # catch-up: when the engine is behind the chunk cadence (slow
            # tick, tunnel hiccup, faster-than-realtime clients) the rings
            # hold >1 chunk per stream and one-chunk ticks can never
            # recover — a second gather drains the backlog at up to 2x.
            # Gated on the drain-time backlog count, NOT on a blind second
            # gather: at 1024 realtime streams a chunk completes somewhere
            # every ~0.1 ms, so a probe issued ~1 ms after the drain finds
            # "new" chunks on essentially every tick even when perfectly on
            # cadence — arrival jitter, not backlog — and every steady-state
            # tick would become a double-compute catch-up tick.
            batch_b = active_b = None
            if backlog:
                b2, r2, c2, _ = self.pool.gather()
                if c2:
                    batch_b, active_b = b2, r2 > 0
            # capture resets AFTER the gathers, never before: a recycle's
            # reset request is appended (accept loop) BEFORE its add_fd
            # makes the new client's chunks gatherable, so any chunk either
            # gather returned is guaranteed to have its reset visible HERE —
            # captured before the gather, a first chunk framed in the
            # capture->gather window would be computed on the previous
            # client's LSTM state with its zeroing still pending
            with self._lock:
                pending_resets = self._reset_requests
                self._reset_requests = []
            reset[:] = False
            reset[pending_resets] = True
            if count or reset.any():
                t0 = time.perf_counter()
                with self._state_lock:
                    probs2 = None
                    if batch_b is not None:
                        probs2, self.state = self._tick2(
                            self._params,
                            jnp.asarray(batch),
                            jnp.asarray(batch_b),
                            self.state,
                            jnp.asarray(active),
                            jnp.asarray(active_b),
                            jnp.asarray(reset),
                        )
                        self.catchup_ticks += 1
                    else:
                        probs, self.state = self._tick(
                            self._params,
                            jnp.asarray(batch),
                            self.state,
                            jnp.asarray(active),
                            jnp.asarray(reset),
                        )
                    # FSM feed AND the emits that consume its events stay
                    # inside the lock so a checkpoint always sees model
                    # state, FSM arrays, and per-slot pending segments from
                    # the same tick (an emit outside the lock could apply
                    # some of a tick's events to `pending` and not others
                    # at snapshot time — those events are already consumed
                    # from the FSM arrays, so a restore would lose them)
                    if batch_b is not None:
                        # ONE [N, 2] materialization (one tunnel RTT), two
                        # FSM feeds because the active masks differ per
                        # sub-chunk
                        p2 = np.asarray(probs2)
                        events = self.fsm.feed(p2[:, :1], active=active)
                        events += self.fsm.feed(p2[:, 1:], active=active_b)
                    else:
                        events = (
                            self.fsm.feed(
                                np.asarray(probs)[:, None], active=active
                            )
                            if count
                            else []
                        )
                    if count:
                        # latency is measured from the feed() that produced
                        # the events, NOT reset per emit: all of a tick's
                        # events become visible at t_ev, so the k-th event's
                        # recorded latency deliberately includes head-of-line
                        # blocking behind slower emits in the same tick —
                        # that is what a client actually observes
                        t_ev = time.perf_counter()
                        for slot, start_c, end_c in events:
                            self._emit(slot, start_c, end_c)
                            self.emit_latencies.append(
                                time.perf_counter() - t_ev
                            )
                        self.tick_times.append(time.perf_counter() - t0)
                    # retry backpressured outboxes (non-blocking sends, so
                    # safe under the lock; keeps outbox mutation confined
                    # to _state_lock for checkpoint coherence)
                    for s in self.slots:
                        if s is not None and s.outbox:
                            self._pump_outbox(s)
            # finish streams whose sockets have drained (attached gate:
            # an un-attached slot's pool state is the previous client's)
            for slot in range(self.n):
                if (
                    self.slots[slot] is not None
                    and self._attached[slot]
                    and self.pool.stream_done(slot)
                ):
                    self._finish_slot(slot)
            if not count:
                # idle ticks still retry backpressured outboxes — a client
                # may pause its audio while unread segment lines remain
                if any(s is not None and s.outbox for s in self.slots):
                    with self._state_lock:
                        for s in self.slots:
                            if s is not None and s.outbox:
                                self._pump_outbox(s)
                time.sleep(0.002)

    def serve_forever(self) -> None:
        server_sock = socket.create_server((self.host, self.port))
        self.pool.start()
        self.warmup()  # first client must never pay the tick compile
        acceptor = threading.Thread(
            target=self._accept_loop, args=(server_sock,), daemon=True
        )
        acceptor.start()
        print(
            f"vadc server on {self.host}:{self.port} "
            f"({self.family}, chunk {self.chunk}, {self.n} slots)",
            file=sys.stderr,
        )
        try:
            self._engine_loop()
        finally:
            self._stop.set()
            server_sock.close()
            self.pool.close()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vadc-server", description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7355)
    p.add_argument("--max_streams", type=int, default=64)
    p.add_argument("--model", default=None)
    p.add_argument("--fast", action="store_true",
                   help="shorthand for --precision fast")
    p.add_argument("--precision", choices=("faithful", "balanced", "fast", "turbo"),
                   default=None)
    p.add_argument("--sequence_count", type=int, default=1536)
    p.add_argument("--shard", action=argparse.BooleanOptionalAction, default=None,
                   help="shard slots over all local devices (default: auto — "
                        "on when >1 device and max_streams divides evenly)")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="restore a server checkpoint; saved slots continue "
                        "their streams when clients reconnect")
    args = p.parse_args(argv)
    server = VadServer(
        args.host,
        args.port,
        max_streams=args.max_streams,
        model=args.model,
        fast=args.fast,
        precision=args.precision,
        sequence_count=args.sequence_count,
        shard=args.shard,
    )
    if args.resume:
        server.restore_checkpoint(args.resume)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
