"""Multi-chip scale-out: shard the stream batch over a device mesh.

The model is ~200 KB so it is fully replicated; the only sharded axis is the
stream batch (pure data parallelism — streams never communicate, so no
collectives appear in the step function at all and scaling is linear over
ICI). This replaces the role a NCCL/MPI backend plays in GPU frameworks; the
reference has no distributed layer to mirror (SURVEY.md §2.9), so this is the
capability the TPU build adds.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vadc_tpu.engine.runner import StreamState, get_family_module, _step, _scan

STREAM_AXIS = "streams"


def make_stream_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis 'streams'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (STREAM_AXIS,))


class ShardedStreamRunner:
    """StreamRunner with the batch dim sharded across a mesh.

    Params are replicated; chunks/probs/state are sharded on their batch
    axis. n_streams must be a multiple of the mesh size.
    """

    def __init__(
        self,
        family: str,
        params: dict,
        mesh: Mesh,
        *,
        fast_math: bool = False,
        precision: str | None = None,
    ):
        if precision is None:
            precision = "fast" if fast_math else "faithful"
        self.family = family
        self.mesh = mesh
        self.precision = precision
        self.module = get_family_module(family)
        replicated = NamedSharding(mesh, P())
        self.params = jax.device_put(params, replicated)

        step_fn = functools.partial(_step, self.module, family)
        scan_fn = functools.partial(_scan, self.module, family)
        if precision != "faithful":
            from vadc_tpu.nn import functional as F

            def wrap(fn):
                @functools.wraps(fn)
                def inner(*args):
                    with F.precision_mode(precision):
                        return fn(*args)

                return inner

            step_fn, scan_fn = wrap(step_fn), wrap(scan_fn)

        batch0 = NamedSharding(mesh, P(STREAM_AXIS))  # leading batch dim
        batch1 = NamedSharding(mesh, P(None, STREAM_AXIS))  # h/c: [L, B, H]
        has_context = hasattr(self.module, "init_context")
        state_shardings = StreamState(
            batch1, batch1, batch0 if has_context else None
        )
        self._step = jax.jit(
            step_fn,
            in_shardings=(replicated, batch0, state_shardings),
            out_shardings=(batch0, state_shardings),
            donate_argnums=(2,),  # state aliased in place, per shard
        )
        chunks_scan = NamedSharding(mesh, P(STREAM_AXIS, None, None))
        probs_scan = NamedSharding(mesh, P(STREAM_AXIS, None))
        self._scan = jax.jit(
            scan_fn,
            in_shardings=(replicated, chunks_scan, state_shardings),
            out_shardings=(probs_scan, state_shardings),
            donate_argnums=(2,),
        )
        self._state_shardings = state_shardings

    def init_state(self, n_streams: int) -> StreamState:
        # ValueError, not assert: user-input validation must survive
        # python -O (a bad count otherwise fails deep in XLA sharding)
        if n_streams % self.mesh.size:
            raise ValueError(
                f"n_streams {n_streams} must divide over {self.mesh.size} devices"
            )
        mod = self.module
        h, c = mod.init_state(n_streams)
        ctx = (
            mod.init_context(n_streams)
            if hasattr(mod, "init_context")
            else None
        )
        return jax.device_put(StreamState(h, c, ctx), self._state_shardings)

    def step(self, chunks, state):
        """chunks [B, chunk] -> (probs [B], new state); B sharded over mesh."""
        return self._step(self.params, chunks, state)

    def scan(self, chunks, state):
        """chunks [B, T, chunk] -> (probs [B, T], final state)."""
        return self._scan(self.params, chunks, state)
