"""Multi-PROCESS dryrun: 2 simulated host processes x 4 virtual CPU devices.

Exercises the real multi-host code path — jax.distributed.initialize over a
local coordinator, a global 8-device mesh spanning both processes, and
per-process stream feeding through MultiHostStreamEngine — without TPU pod
hardware. Each process feeds its own half of the stream batch and checks
its local probabilities against a single-process reference.

    python tools/multihost_dryrun.py          # parent: spawns 2 children
    (exit 0 + "MULTIHOST DRYRUN OK" on success)
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

N_PROCESSES = 2
DEVICES_PER_PROCESS = 4
N_STREAMS = 16  # 8 per process
CHUNK = 1536


def _child(coordinator: str, process_id: int) -> int:
    import jax

    # the environment's sitecustomize force-registers a TPU plugin and
    # overrides jax_platforms; force CPU after import (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vadc_tpu.engine import distributed
    from __graft_entry__ import _load_v31_params

    distributed.initialize(
        coordinator_address=coordinator,
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROCESSES
    assert len(jax.devices()) == N_PROCESSES * DEVICES_PER_PROCESS

    params = _load_v31_params()
    engine = distributed.MultiHostStreamEngine("v3", params)
    state = engine.init_state(N_STREAMS)

    rng = np.random.default_rng(0)  # same seed: both processes see the
    all_chunks = (rng.normal(size=(N_STREAMS, CHUNK)) * 0.1).astype(np.float32)
    local = N_STREAMS // N_PROCESSES
    mine = all_chunks[process_id * local : (process_id + 1) * local]

    probs_local, state = engine.step(mine, state)
    assert probs_local.shape == (local,), probs_local.shape

    # scan path: 2 chunks per stream
    seq = (rng.normal(size=(N_STREAMS, 2, CHUNK)) * 0.1).astype(np.float32)
    probs_t, state = engine.scan(
        seq[process_id * local : (process_id + 1) * local], state
    )
    assert probs_t.shape == (local, 2), probs_t.shape

    # single-process reference for THIS process's streams
    from vadc_tpu.models import silero_v31

    h, c = silero_v31.init_state(N_STREAMS)
    ref, hn, cn = silero_v31.forward(params, all_chunks, h, c)
    ref_mine = np.asarray(ref)[process_id * local : (process_id + 1) * local]
    dev = float(np.abs(probs_local - ref_mine).max())
    assert dev < 1e-5, f"process {process_id}: local probs deviate {dev}"

    # sharded checkpoint: each process saves ITS slice of the global state,
    # restores it, and the continuation must be bit-identical to running on
    # with the live state (engine/checkpoint.py save_sharded/load_sharded)
    import tempfile

    from vadc_tpu.engine import checkpoint as ckpt_mod

    prefix = os.path.join(tempfile.gettempdir(), "vadc_dryrun_ckpt")
    ckpt_mod.save_sharded(engine, state, prefix)
    tail = (rng.normal(size=(N_STREAMS, 2, CHUNK)) * 0.1).astype(np.float32)
    mine_tail = tail[process_id * local : (process_id + 1) * local]
    live_probs, _ = engine.scan(mine_tail, state)  # donates `state`

    restored, ckpt = ckpt_mod.load_sharded(engine, prefix)
    assert ckpt.family == "v3"
    resumed_probs, _ = engine.scan(mine_tail, restored)
    np.testing.assert_array_equal(resumed_probs, live_probs)
    print(
        f"process {process_id}: ok (dev {dev:.2e}; sharded checkpoint "
        "resume bit-identical)",
        flush=True,
    )
    return 0


def main() -> int:
    if "--child" in sys.argv:
        idx = sys.argv.index("--child")
        return _child(sys.argv[idx + 1], int(sys.argv[idx + 2]))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coordinator = f"127.0.0.1:{s.getsockname()[1]}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    ).strip()
    env.pop("JAX_PLATFORMS", None)  # children force CPU via jax.config

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", coordinator, str(i)],
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(N_PROCESSES)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"MULTIHOST DRYRUN FAILED: exit codes {rcs}", file=sys.stderr)
        return 1
    print("MULTIHOST DRYRUN OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
