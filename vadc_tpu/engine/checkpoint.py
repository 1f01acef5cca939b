"""Checkpoint / resume of streaming inference state.

The reference has no checkpointing; its resumable state is implicit in
process memory. SURVEY §5.4 inventories it exactly: LSTM h/c, the v5
64-sample audio context, the segmentation FSM fields {triggered,
current_speech_start, temp_end} (vadc.h:110-115), the **buffered pending
segment** (vadc.c:831), and the global chunk index (vadc.c:829). Here that
state is an explicit, serializable struct so a multi-stream engine can stop
and resume streams across processes/hosts — including a stop BETWEEN a
segment close and its pad/merge, which must neither drop nor double-emit
the held segment.

Serialization reuses the .testtensor container (the framework's one binary
format), with integer state stored as float32 (all values are small counters
and flags, exactly representable)."""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from vadc_tpu.io.testtensor import load_testtensor_bytes, save_testtensor_bytes
from vadc_tpu.engine.runner import StreamState
from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter, FsmState


def _host(arr) -> np.ndarray:
    """Materialize state to host, refusing non-addressable global arrays
    with a pointed diagnosis instead of XLA's (np.asarray on a
    multi-process-sharded array raises an opaque RuntimeError)."""
    if not getattr(arr, "is_fully_addressable", True):
        raise ValueError(
            "model state is sharded across processes; checkpoint each "
            "process's own slice: engine.local_state(state) -> "
            "EngineCheckpoint, or use checkpoint.save_sharded/load_sharded"
        )
    return np.asarray(arr)


@dataclass
class EngineCheckpoint:
    """Complete resumable state of a batch of streams.

    raw_segments: per-stream closed segments awaiting pad/merge at finish
    (BatchSegmenter accumulation — the batched analogue of the reference's
    buffered segment). pending: per-stream held merge candidate (the host
    Segmenter / server slot `pending`, vadc.c:831). chunk_indices: per-stream
    chunk counters when streams advance independently (native FSM)."""

    family: str
    model_state: StreamState
    fsm_state: FsmState | None = None
    chunk_index: int = 0
    raw_segments: list[list[tuple[int, int]]] | None = None
    pending: list[tuple[int, int] | None] | None = None
    chunk_indices: np.ndarray | None = None
    # per-stream rendered-but-unsent output bytes (serving-daemon outbox
    # under client backpressure) — saved so a restore re-delivers them to
    # the reconnecting client (at-least-once) instead of dropping them
    sendbuf: list[bytes] | None = None

    def to_bytes(self) -> bytes:
        tensors: dict[str, np.ndarray] = {
            # header carries family id (ascii codes) and chunk index
            "meta.family": np.frombuffer(
                self.family.encode("ascii"), dtype=np.uint8
            ).astype(np.float32),
            "meta.chunk_index": np.asarray([self.chunk_index], np.float32),
            "model.h": _host(self.model_state.h),
            "model.c": _host(self.model_state.c),
        }
        if self.model_state.context is not None:
            tensors["model.context"] = _host(self.model_state.context)
        if self.fsm_state is not None:
            tensors["fsm.triggered"] = np.asarray(self.fsm_state.triggered, np.float32)
            tensors["fsm.speech_start"] = np.asarray(
                self.fsm_state.speech_start, np.float32
            )
            tensors["fsm.temp_end"] = np.asarray(self.fsm_state.temp_end, np.float32)
        if self.chunk_indices is not None:
            tensors["fsm.chunk_indices"] = np.asarray(self.chunk_indices, np.float32)
        if self.raw_segments is not None:
            rows = [
                (i, s, e)
                for i, segs in enumerate(self.raw_segments)
                for (s, e) in segs
            ]
            tensors["seg.raw"] = np.asarray(rows, np.float32).reshape(-1, 3)
            tensors["seg.n_streams"] = np.asarray(
                [len(self.raw_segments)], np.float32
            )
        if self.pending is not None:
            rows = [
                (0.0, 0.0, 0.0) if p is None else (1.0, p[0], p[1])
                for p in self.pending
            ]
            tensors["seg.pending"] = np.asarray(rows, np.float32).reshape(-1, 3)
        if self.sendbuf is not None:
            tensors["seg.sendbuf_lens"] = np.asarray(
                [len(b) for b in self.sendbuf], np.float32
            )
            tensors["seg.sendbuf_data"] = np.frombuffer(
                b"".join(self.sendbuf), np.uint8
            ).astype(np.float32)
        # The container stores integer state as float32, exact only below
        # 2^24. A stream that has run ~18.6 days of 96 ms chunks crosses
        # that on its chunk counter — fail LOUDLY here rather than silently
        # rounding a counter and corrupting the resumed stream's timeline.
        for k, arr in tensors.items():
            if k == "model.h" or k == "model.c" or k == "model.context":
                continue  # genuine float payloads
            if arr.size and float(np.abs(arr).max()) >= 2**24:
                raise ValueError(
                    f"checkpoint field {k!r} holds a value >= 2^24, beyond "
                    "float32's exact-integer range — the stream has outrun "
                    "the serializable counter bound; restart its timeline "
                    "before checkpointing"
                )
        return save_testtensor_bytes(tensors)

    @classmethod
    def from_bytes(cls, data: bytes) -> "EngineCheckpoint":
        t = load_testtensor_bytes(data)
        family = bytes(t["meta.family"].astype(np.uint8)).decode("ascii")
        context = (
            jnp.asarray(t["model.context"]) if "model.context" in t else None
        )
        model_state = StreamState(
            jnp.asarray(t["model.h"]), jnp.asarray(t["model.c"]), context
        )
        fsm = None
        if "fsm.triggered" in t:
            fsm = FsmState(
                triggered=jnp.asarray(t["fsm.triggered"].astype(bool)),
                speech_start=jnp.asarray(t["fsm.speech_start"].astype(np.int32)),
                temp_end=jnp.asarray(t["fsm.temp_end"].astype(np.int32)),
                chunk_index=jnp.int32(int(t["meta.chunk_index"][0])),
            )
        chunk_indices = (
            t["fsm.chunk_indices"].astype(np.int32)
            if "fsm.chunk_indices" in t
            else None
        )
        raw_segments = None
        if "seg.raw" in t:
            n = int(t["seg.n_streams"][0])
            raw_segments = [[] for _ in range(n)]
            for i, s, e in t["seg.raw"].reshape(-1, 3):
                raw_segments[int(i)].append((int(s), int(e)))
        pending = None
        if "seg.pending" in t:
            pending = [
                (int(s), int(e)) if has else None
                for has, s, e in t["seg.pending"].reshape(-1, 3)
            ]
        sendbuf = None
        if "seg.sendbuf_lens" in t:
            data = bytes(t["seg.sendbuf_data"].astype(np.uint8))
            sendbuf, off = [], 0
            for ln in t["seg.sendbuf_lens"].astype(np.int64):
                sendbuf.append(data[off : off + ln])
                off += ln
        return cls(
            family=family,
            model_state=model_state,
            fsm_state=fsm,
            chunk_index=int(t["meta.chunk_index"][0]),
            raw_segments=raw_segments,
            pending=pending,
            chunk_indices=chunk_indices,
            sendbuf=sendbuf,
        )

    # -- BatchSegmenter capture/restore ----------------------------------

    @classmethod
    def capture(
        cls,
        family: str,
        model_state: StreamState,
        segmenter: BatchSegmenter,
        *,
        pending: list[tuple[int, int] | None] | None = None,
    ) -> "EngineCheckpoint":
        """Snapshot engine + segmentation state, INCLUDING the accumulated
        raw segments awaiting pad/merge (and per-slot pending segments when
        the caller holds them, e.g. the serving daemon)."""
        if segmenter._native is not None:
            n = segmenter._native
            fsm = FsmState(
                triggered=jnp.asarray(n.triggered.astype(bool)),
                speech_start=jnp.asarray(n.speech_start.astype(np.int32)),
                temp_end=jnp.asarray(n.temp_end.astype(np.int32)),
                chunk_index=jnp.int32(int(n.chunk_index.max(initial=0))),
            )
            chunk_indices = n.chunk_index.astype(np.int32).copy()
            chunk_index = int(chunk_indices.max(initial=0))
        else:
            fsm = segmenter.state
            chunk_index = int(fsm.chunk_index)
            chunk_indices = None
        return cls(
            family=family,
            model_state=model_state,
            fsm_state=fsm,
            chunk_index=chunk_index,
            raw_segments=[list(r) for r in segmenter._raw],
            pending=pending,
            chunk_indices=chunk_indices,
        )

    def restore_segmenter(self, segmenter: BatchSegmenter) -> None:
        """Load FSM fields and accumulated raw segments into a fresh
        BatchSegmenter (native or device backend)."""
        if self.fsm_state is None:
            raise ValueError("checkpoint has no segmentation state")
        fsm = self.fsm_state
        if segmenter._native is not None:
            n = segmenter._native
            n.triggered[:] = np.asarray(fsm.triggered).astype(n.triggered.dtype)
            n.speech_start[:] = np.asarray(fsm.speech_start)
            n.temp_end[:] = np.asarray(fsm.temp_end)
            if self.chunk_indices is not None:
                n.chunk_index[:] = self.chunk_indices
            else:
                n.chunk_index[:] = self.chunk_index
        else:
            segmenter.state = FsmState(
                triggered=jnp.asarray(np.asarray(fsm.triggered).astype(bool)),
                speech_start=jnp.asarray(np.asarray(fsm.speech_start), jnp.int32),
                temp_end=jnp.asarray(np.asarray(fsm.temp_end), jnp.int32),
                chunk_index=jnp.int32(self.chunk_index),
            )
        if self.raw_segments is not None:
            segmenter._raw = [list(r) for r in self.raw_segments]

    def save(self, path: str | Path) -> None:
        Path(path).write_bytes(self.to_bytes())

    @classmethod
    def load(cls, path: str | Path) -> "EngineCheckpoint":
        return cls.from_bytes(Path(path).read_bytes())


# -- multi-process sharded checkpointing ---------------------------------
#
# A MultiHostStreamEngine's state is globally sharded: no process can
# materialize it whole (np.asarray on it is refused above). Instead each
# process saves ITS OWN stream slice — addressable shards only, no
# collective, no cross-host traffic — to `<prefix>.proc<i>of<n>.testtensor`.
# Restore is symmetric: each process loads its own file and the engine
# reassembles the globally-sharded device state from the local slices
# (jax.make_array_from_process_local_data). Host-side segmentation state
# (BatchSegmenter raw segments, pending merges) is per-process by
# construction — each process segments only the streams it feeds — so it
# rides in the same per-process file.


def shard_path(prefix: str | Path, process_id: int, n_processes: int) -> Path:
    return Path(f"{prefix}.proc{process_id}of{n_processes}.testtensor")


def save_sharded(
    engine,
    state: StreamState,
    prefix: str | Path,
    *,
    segmenter: BatchSegmenter | None = None,
    pending: list[tuple[int, int] | None] | None = None,
) -> Path:
    """Checkpoint this process's slice of a MultiHostStreamEngine.

    Every process must call this (with its own engine/segmenter); the
    result is one file per process under the shared `prefix`."""
    local = engine.local_state(state)
    family = engine.runner.family
    if segmenter is not None:
        ckpt = EngineCheckpoint.capture(family, local, segmenter, pending=pending)
    else:
        ckpt = EngineCheckpoint(family, local, pending=pending)
    path = shard_path(prefix, engine.process_id, engine.n_processes)
    ckpt.save(path)
    return path


def load_sharded(
    engine, prefix: str | Path
) -> tuple[StreamState, EngineCheckpoint]:
    """Load this process's slice and rebuild globally-sharded device state.

    Returns (state, checkpoint); the checkpoint carries the segmentation
    fields for `restore_segmenter` on this process's BatchSegmenter. The
    saved process count must match the running cluster (a resharding
    restore would silently misassign streams to processes)."""
    path = shard_path(prefix, engine.process_id, engine.n_processes)
    if not path.exists():
        existing = sorted(Path(path).parent.glob(f"{Path(prefix).name}.proc*"))
        raise FileNotFoundError(
            f"{path} not found — saved layout differs from the running "
            f"cluster ({engine.n_processes} processes); on disk: "
            f"{[p.name for p in existing] or 'nothing'}"
        )
    ckpt = EngineCheckpoint.load(path)
    return engine.state_from_local(ckpt.model_state), ckpt
