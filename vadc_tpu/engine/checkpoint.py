"""Checkpoint / resume of streaming inference state.

The reference has no checkpointing; its resumable state is implicit in
process memory (LSTM h/c, v5 audio context, segmentation FSM, chunk index —
SURVEY.md §5.4). Here that state is an explicit, serializable struct so a
multi-stream engine can stop and resume streams across processes/hosts.

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
from vadc_tpu.engine.vectorized_segmenter import FsmState


@dataclass
class EngineCheckpoint:
    """Complete resumable state of a batch of streams."""

    family: str
    model_state: StreamState
    fsm_state: FsmState | None = None
    chunk_index: int = 0

    def to_bytes(self) -> bytes:
        tensors: dict[str, np.ndarray] = {
            # header carries family id (ascii codes) and chunk index
            "meta.family": np.frombuffer(
                self.family.encode("ascii"), dtype=np.uint8
            ).astype(np.float32),
            "meta.chunk_index": np.asarray([self.chunk_index], np.float32),
            "model.h": np.asarray(self.model_state.h),
            "model.c": np.asarray(self.model_state.c),
        }
        if self.model_state.context is not None:
            tensors["model.context"] = np.asarray(self.model_state.context)
        if self.fsm_state is not None:
            tensors["fsm.triggered"] = np.asarray(self.fsm_state.triggered, np.float32)
            tensors["fsm.speech_start"] = np.asarray(
                self.fsm_state.speech_start, np.float32
            )
            tensors["fsm.temp_end"] = np.asarray(self.fsm_state.temp_end, np.float32)
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
        return cls(
            family=family,
            model_state=model_state,
            fsm_state=fsm,
            chunk_index=int(t["meta.chunk_index"][0]),
        )

    def save(self, path: str | Path) -> None:
        Path(path).write_bytes(self.to_bytes())

    @classmethod
    def load(cls, path: str | Path) -> "EngineCheckpoint":
        return cls.from_bytes(Path(path).read_bytes())
