"""Multi-host scale-out: jax.distributed wiring + per-process stream feeding.

SURVEY §2.9/§5.8: the model's only parallel axis is the stream batch (pure
data parallelism — streams never communicate, so the jitted step contains
ZERO collectives and scaling is linear over ICI within a pod slice). DCN is
used only for coordination/dispatch: each host process ingests its own
streams (sockets/files/pipes), builds the GLOBAL batch from per-process
local shards, and runs the same jitted step over the global mesh. The
reference has nothing in this category (single process, single thread,
onnx_helpers.c:146-151 even pins batch to 1 for state-carrying models).

Launch (one process per host, same binary):

    VADC_COORDINATOR=host0:7654 VADC_NUM_PROCESSES=4 VADC_PROCESS_ID=$i \
        python my_serving_app.py

    # in the app:
    from vadc_tpu.engine import distributed
    distributed.initialize()            # reads the env (or pass explicitly)
    engine = distributed.MultiHostStreamEngine("v3", params, fast_math=True)
    state = engine.init_state(total_streams)
    probs_local = engine.step(local_chunks, state)  # feeds B/n_processes here

Verified end-to-end by tools/multihost_dryrun.py (2 simulated processes x 4
virtual CPU devices), which the driver-facing dryrun also exercises.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Wire this process into the cluster (jax.distributed.initialize).

    Arguments default to the VADC_COORDINATOR / VADC_NUM_PROCESSES /
    VADC_PROCESS_ID environment variables; on cloud TPU pods with none set,
    jax auto-discovers and this is a plain `jax.distributed.initialize()`.
    Call BEFORE any other jax API touches the backend."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("VADC_COORDINATOR")
    if num_processes is None and "VADC_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VADC_NUM_PROCESSES"])
    if process_id is None and "VADC_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VADC_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


class MultiHostStreamEngine:
    """ShardedStreamRunner over the GLOBAL mesh with per-process feeding.

    Each process passes only its local streams' chunks to `step`/`scan`
    (shape [B_total/num_processes, ...], stream order = process order) and
    receives only its local streams' probabilities back. State lives
    device-resident, globally sharded, and is never gathered to any host.
    """

    def __init__(
        self,
        family: str,
        params: dict,
        *,
        fast_math: bool = False,
        precision: str | None = None,
    ):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vadc_tpu.engine.shard import ShardedStreamRunner, make_stream_mesh

        self.mesh = make_stream_mesh(jax.devices())  # all devices, all hosts
        self.runner = ShardedStreamRunner(
            family, params, self.mesh, fast_math=fast_math, precision=precision
        )
        self._chunk_sharding = NamedSharding(self.mesh, P("streams"))
        self._chunk_sharding_t = NamedSharding(self.mesh, P("streams", None, None))
        self.n_processes = jax.process_count()
        self.process_id = jax.process_index()

    def init_state(self, total_streams: int):
        """Globally-sharded zero state, created ON DEVICE (no host-global
        array exists anywhere — required for multi-process)."""
        import jax

        mod = self.runner.module
        shardings = self.runner._state_shardings
        from vadc_tpu.engine.runner import StreamState

        def make():
            h, c = mod.init_state(total_streams)
            ctx = (
                mod.init_context(total_streams)
                if hasattr(mod, "init_context")
                else None
            )
            return StreamState(h, c, ctx)

        return jax.jit(make, out_shardings=shardings)()

    def _global(self, local: np.ndarray, sharding):
        import jax

        global_shape = (local.shape[0] * self.n_processes,) + local.shape[1:]
        if self.n_processes == 1:
            return jax.device_put(local, sharding)
        return jax.make_array_from_process_local_data(sharding, local, global_shape)

    def _local(self, global_probs) -> np.ndarray:
        """This process's streams' probabilities, in feed order."""
        return _addressable_local(global_probs, 0)

    # -- checkpointing (per-process addressable shards) -------------------

    def local_state(self, state) -> "StreamState":
        """This process's stream slice of the model state, as host numpy
        arrays — addressable shards only, NO cross-host gather or
        collective. Feed the result to EngineCheckpoint: each process
        checkpoints its own slice (see checkpoint.save_sharded)."""
        from vadc_tpu.engine.runner import StreamState

        return StreamState(
            _addressable_local(state.h, 1),
            _addressable_local(state.c, 1),
            None
            if state.context is None
            else _addressable_local(state.context, 0),
        )

    def state_from_local(self, local) -> "StreamState":
        """Rebuild globally-sharded device state from this process's local
        slice (inverse of local_state). Every process must call this with
        its own slice; the result carries the engine's state shardings and
        is directly usable by step/scan."""
        import jax

        from vadc_tpu.engine.runner import StreamState

        shardings = self.runner._state_shardings

        def put(arr, sharding, batch_axis):
            arr = np.asarray(arr)
            if self.n_processes == 1:
                return jax.device_put(arr, sharding)
            global_shape = list(arr.shape)
            global_shape[batch_axis] *= self.n_processes
            return jax.make_array_from_process_local_data(
                sharding, arr, tuple(global_shape)
            )

        return StreamState(
            put(local.h, shardings.h, 1),
            put(local.c, shardings.c, 1),
            None
            if local.context is None
            else put(local.context, shardings.context, 0),
        )
    def step(self, local_chunks: np.ndarray, state):
        """local_chunks [B_local, chunk] -> (local probs [B_local], state)."""
        chunks = self._global(np.asarray(local_chunks), self._chunk_sharding)
        probs, state = self.runner.step(chunks, state)
        return self._local(probs), state

    def scan(self, local_chunks: np.ndarray, state):
        """local_chunks [B_local, T, chunk] -> (local probs [B_local, T], state)."""
        chunks = self._global(np.asarray(local_chunks), self._chunk_sharding_t)
        probs, state = self.runner.scan(chunks, state)
        return self._local(probs), state


def _addressable_local(arr, batch_axis: int) -> np.ndarray:
    """Concatenate this process's addressable shards along the batch axis,
    ordered by global position."""
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[batch_axis].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=batch_axis)
