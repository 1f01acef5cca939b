"""Vectorized hysteresis FSM: segment thousands of streams on-device.

Same transition semantics as the host Segmenter (and the reference's
feed_probability, vadc.c:165-221), but expressed as a lax.scan over the chunk
axis with int32/bool state arrays per stream — jnp.where replaces the
branches, so the whole batch advances in a handful of VPU ops per chunk.

Used by the offline multi-stream engine: probabilities [B, T] in, per-chunk
"segment closed here" events out; pad/merge and emission stay on host (they
touch only the few closed segments, not every chunk).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vadc_tpu.cli.segmenter import SegmenterConfig


class FsmState(NamedTuple):
    triggered: jax.Array  # bool [B]
    speech_start: jax.Array  # int32 [B]
    temp_end: jax.Array  # int32 [B]
    chunk_index: jax.Array  # int32 scalar


def init_fsm_state(n_streams: int) -> FsmState:
    return FsmState(
        triggered=jnp.zeros(n_streams, bool),
        speech_start=jnp.zeros(n_streams, jnp.int32),
        temp_end=jnp.zeros(n_streams, jnp.int32),
        chunk_index=jnp.int32(0),
    )


def fsm_step(
    state: FsmState,
    prob: jax.Array,
    *,
    threshold: float,
    neg_threshold: float,
    min_silence_chunks: int,
    min_speech_chunks: int,
    active: jax.Array | None = None,
) -> tuple[FsmState, tuple[jax.Array, jax.Array, jax.Array]]:
    """Advance every stream's FSM one chunk.

    prob: [B]. active (optional bool [B]): streams marked False keep their
    state untouched and emit nothing — zero-padded grid chunks must be
    invisible to the FSM (a pad chunk advancing it can close a segment the
    scalar segmenter, fed only the real prefix, would EOF-snap instead).
    Returns (new state, (closed [B] bool, seg_start [B], seg_end [B])).
    """
    idx = state.chunk_index
    above = prob >= threshold
    below_neg = prob < neg_threshold

    # prob >= threshold cancels a tentative end
    temp_end = jnp.where(above, 0, state.temp_end)

    # not triggered and above -> trigger
    newly_triggered = ~state.triggered & above
    speech_start = jnp.where(newly_triggered, idx, state.speech_start)
    triggered = state.triggered | newly_triggered

    # triggered and below neg_threshold -> tentative end, maybe close
    tentative = state.triggered & below_neg
    temp_end = jnp.where(tentative & (temp_end == 0), idx, temp_end)
    closing = tentative & (idx - temp_end >= min_silence_chunks)
    long_enough = temp_end - speech_start >= min_speech_chunks
    closed = closing & long_enough
    seg_start = speech_start
    seg_end = temp_end

    # reset on close (valid or discarded)
    triggered = jnp.where(closing, False, triggered)
    speech_start = jnp.where(closing, 0, speech_start)
    temp_end = jnp.where(closing, 0, temp_end)

    if active is not None:
        triggered = jnp.where(active, triggered, state.triggered)
        speech_start = jnp.where(active, speech_start, state.speech_start)
        temp_end = jnp.where(active, temp_end, state.temp_end)
        closed = closed & active

    return (
        FsmState(triggered, speech_start, temp_end, idx + 1),
        (closed, seg_start, seg_end),
    )


def segment_batch(
    probs: jax.Array,
    *,
    threshold: float,
    neg_threshold: float,
    min_silence_chunks: int,
    min_speech_chunks: int,
    state: FsmState | None = None,
    valid_chunks: jax.Array | None = None,
) -> tuple[FsmState, tuple[jax.Array, jax.Array, jax.Array]]:
    """Run the FSM over probs [B, T].

    valid_chunks (optional int32 [B]): each stream's real chunk count in a
    zero-padded grid — chunks at global index >= valid are masked out of
    the FSM (state freezes at the stream's true EOF, exactly what
    BatchSegmenter.finish's EOF snap needs).
    Returns (final state, (closed [T, B], seg_start [T, B], seg_end [T, B])).
    """
    if state is None:
        state = init_fsm_state(probs.shape[0])

    def body(st, p_t):
        return fsm_step(
            st,
            p_t,
            threshold=threshold,
            neg_threshold=neg_threshold,
            min_silence_chunks=min_silence_chunks,
            min_speech_chunks=min_speech_chunks,
            active=None if valid_chunks is None else st.chunk_index < valid_chunks,
        )

    return lax.scan(body, state, probs.T)


class BatchSegmenter:
    """Incremental multi-stream segmentation over probability slabs.

    Feed probabilities in [B, T_slab] slabs (any slab sizes); the per-chunk
    FSM runs in the native C++ kernel when available (probabilities come to
    host in one transfer; the FSM is microseconds there), falling back to
    the on-device vectorized FSM; `finish` applies the EOF snap for
    still-open segments and the pad/merge pass. Semantics match the scalar
    CLI Segmenter."""

    def __init__(
        self,
        config: SegmenterConfig,
        n_streams: int,
        *,
        backend: str = "auto",
        pending_depth: int = 0,
        valid_chunks=None,
    ):
        from collections import deque

        import numpy as np

        from vadc_tpu import native

        self.config = config
        self.n_streams = n_streams
        # per-stream real chunk counts for zero-padded grids: chunks at
        # grid index >= valid are masked OUT of the FSM (state freezes at
        # each stream's true EOF). Without this a pad chunk can confirm a
        # tentative close that the scalar segmenter — fed only the real
        # prefix — would instead resolve with the reference's EOF snap.
        self._valid = (
            None if valid_chunks is None else np.asarray(valid_chunks, np.int64)
        )
        self._fed_chunks = 0  # global grid offset of the next slab
        self._raw: list[list[tuple[int, int]]] = [[] for _ in range(n_streams)]
        # pending_depth > 0 defers the device->host event readback by that
        # many feed() calls: feed only *dispatches* (async under JAX), and
        # the sync that forces slab k's results happens while slab k+depth
        # is already computing — the copy/compute overlap the offline corpus
        # loop needs (a strictly-sequential readback was measured to halve
        # its e2e throughput through a remote-device tunnel).
        self.pending_depth = pending_depth
        self._pending: deque = deque()
        use_native = backend == "native" or (backend == "auto" and native.available())
        if backend not in ("auto", "native", "device"):
            raise ValueError(f"unknown backend {backend!r}")
        if use_native:
            self._native = native.NativeFsm(
                n_streams,
                threshold=config.threshold,
                neg_threshold=config.neg_threshold,
                min_silence_chunks=config.min_silence_chunks,
                min_speech_chunks=config.min_speech_chunks,
            )
            self.state = None
        else:
            self._native = None
            self.state = init_fsm_state(n_streams)
            self._step = jax.jit(
                segment_batch,
                static_argnames=(
                    "threshold",
                    "neg_threshold",
                    "min_silence_chunks",
                    "min_speech_chunks",
                ),
            )

    def feed(self, probs) -> None:
        if self._native is not None:
            # defer only the device->host probability pull; the C++ FSM
            # must still see slabs in order, so draining is FIFO
            self._pending.append((probs, self._fed_chunks))
            self._fed_chunks += probs.shape[1]
        else:
            cfg = self.config
            self.state, events = self._step(
                jnp.asarray(probs, jnp.float32),
                threshold=cfg.threshold,
                neg_threshold=cfg.neg_threshold,
                min_silence_chunks=cfg.min_silence_chunks,
                min_speech_chunks=cfg.min_speech_chunks,
                state=self.state,
                valid_chunks=(
                    None if self._valid is None else jnp.asarray(self._valid)
                ),
            )
            self._fed_chunks += probs.shape[1]
            self._pending.append(events)  # device arrays, no sync yet
        while len(self._pending) > self.pending_depth:
            self._drain_one()

    def _drain_one(self) -> None:
        import numpy as np

        entry = self._pending.popleft()
        if self._native is not None:
            probs, offset = entry
            probs = np.asarray(probs, np.float32)
            t = probs.shape[1]
            if self._valid is None:
                subslabs = [(0, t, None)]
            else:
                # the native active mask is per-stream per-FEED: split the
                # slab at every stream EOF it contains, so within each
                # sub-slab every stream is uniformly active or frozen.
                # Total extra feeds across a whole run are bounded by the
                # number of distinct stream lengths.
                cuts = np.unique(np.clip(self._valid - offset, 0, t))
                cuts = [int(c) for c in cuts if 0 < c < t]
                bounds = [0, *cuts, t]
                subslabs = [
                    (a, b, (self._valid > offset + a).astype(np.uint8))
                    for a, b in zip(bounds[:-1], bounds[1:])
                ]
            for a, b, active in subslabs:
                for i, start, end in self._native.feed(
                    probs[:, a:b], active=active
                ):
                    self._raw[i].append((start, end))
            return
        closed, seg_start, seg_end = entry
        closed = np.asarray(closed)  # [T, B] — the sync point
        if not closed.any():
            return
        seg_start = np.asarray(seg_start)
        seg_end = np.asarray(seg_end)
        times, streams = np.nonzero(closed)
        for t, i in zip(times, streams):
            self._raw[i].append((int(seg_start[t, i]), int(seg_end[t, i])))

    def finish(self, valid_chunks=None) -> list[list[tuple[float, float]]]:
        """valid_chunks: per-stream real chunk counts (for zero-padded batch
        grids); segments are clamped to each stream's real extent and the
        reference's EOF snap applies at it (vadc.c:1005-1027)."""
        import numpy as np

        while self._pending:
            self._drain_one()
        cfg = self.config
        if self._native is not None:
            triggered = self._native.triggered.astype(bool)
            open_start = self._native.speech_start
            total_chunks = int(self._native.chunk_index.max()) if self.n_streams else 0
        else:
            triggered = np.asarray(self.state.triggered)
            open_start = np.asarray(self.state.speech_start)
            total_chunks = int(self.state.chunk_index)
        if valid_chunks is None:
            valid_chunks = (
                self._valid
                if self._valid is not None
                else [total_chunks] * self.n_streams
            )

        if valid_chunks is not None and self._valid is not None:
            mismatched = [
                (i, int(v), int(w))
                for i, (v, w) in enumerate(zip(valid_chunks, self._valid))
                if int(v) != int(w)
            ]
            if mismatched:
                raise ValueError(
                    "finish(valid_chunks=...) disagrees with the "
                    f"constructor's valid_chunks at streams {mismatched[:4]}"
                )
        out: list[list[tuple[float, float]]] = []
        spc = cfg.seconds_per_chunk
        pad = cfg.speech_pad_s
        for i in range(self.n_streams):
            valid = int(valid_chunks[i])
            last_chunk = valid - 1
            # with constructor valid_chunks the FSM never saw pad chunks,
            # so raw events already lie within real data; the filter/clamp
            # stays as a guard for legacy callers that pad without masking
            raw = [
                (s, min(e, last_chunk))
                for s, e in self._raw[i]
                if s < valid
            ]
            if triggered[i] and int(open_start[i]) < valid:
                if last_chunk - int(open_start[i]) > cfg.min_speech_chunks:
                    raw.append((int(open_start[i]), last_chunk))
            merged: list[tuple[float, float]] = []
            for start_c, end_c in raw:
                start_s = max(start_c * spc - pad, 0.0)
                end_s = end_c * spc + pad
                if merged and merged[-1][1] >= start_s:
                    merged[-1] = (merged[-1][0], end_s)
                else:
                    merged.append((start_s, end_s))
            out.append(merged)
        return out


def collect_segments(
    probs,
    config: SegmenterConfig,
) -> list[list[tuple[float, float]]]:
    """One-shot offline segmentation: probabilities [B, T] -> padded and
    merged (start_s, end_s) segments per stream."""
    probs = jnp.asarray(probs, jnp.float32)
    seg = BatchSegmenter(config, probs.shape[0])
    seg.feed(probs)
    return seg.finish()
