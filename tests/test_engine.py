"""Engine tests: scan/step equivalence, sharded-vs-single-device equality on
the 8-device virtual CPU mesh, and reference-parity of the minibatch driver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.models.weights import silero_v31_params
from vadc_tpu.engine.runner import MinibatchRunner, StreamRunner
from vadc_tpu.engine.shard import ShardedStreamRunner, make_stream_mesh


@pytest.fixture(scope="module")
def v31_params(testdata):
    return silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))


def _random_chunks(shape, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_scan_equals_step_loop(v31_params):
    runner = StreamRunner("v3", v31_params)
    chunks = _random_chunks((4, 3, 1536))
    state = runner.init_state(4)
    probs_scan, state_scan = runner.scan(chunks, state)

    state_loop = runner.init_state(4)
    probs_steps = []
    for t in range(3):
        p, state_loop = runner.step(chunks[:, t], state_loop)
        probs_steps.append(p)
    probs_loop = jnp.stack(probs_steps, axis=1)

    assert_close(probs_scan, probs_loop, 1e-6, "scan vs step probs")
    assert_close(state_scan.h, state_loop.h, 1e-6, "scan vs step h")
    assert_close(state_scan.c, state_loop.c, 1e-6, "scan vs step c")


def test_sharded_matches_unsharded(v31_params):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_stream_mesh(jax.devices()[:8])
    sharded = ShardedStreamRunner("v3", v31_params, mesh)
    plain = StreamRunner("v3", v31_params)

    chunks = _random_chunks((16, 1536), seed=1)
    s_state = sharded.init_state(16)
    p_state = plain.init_state(16)

    probs_s, s_state = sharded.step(chunks, s_state)
    probs_p, p_state = plain.step(chunks, p_state)
    assert_close(probs_s, probs_p, 1e-4, "sharded step probs")
    assert_close(s_state.h, p_state.h, 1e-4, "sharded step h")

    seq = _random_chunks((16, 2, 1536), seed=2)
    probs_s2, s_state = sharded.scan(seq, s_state)
    probs_p2, p_state = plain.scan(seq, p_state)
    assert_close(probs_s2, probs_p2, 1e-4, "sharded scan probs")
    assert_close(s_state.c, p_state.c, 1e-3, "sharded scan c")


def test_minibatch_runner_matches_forward(v31_params):
    """The windowed driver must equal one straight minibatched forward when
    window == batch (reference process_chunks with batch 96, vadc.c:56-103)."""
    from vadc_tpu.models import silero_v31

    runner = MinibatchRunner("v3", v31_params, batch_size=4, chunk_samples=1536)
    samples = np.asarray(_random_chunks((4 * 1536,), seed=3))
    probs = runner.process_window(samples)

    h = jnp.zeros((2, 1, 64))
    c = jnp.zeros((2, 1, 64))
    ref_probs, hn, cn = silero_v31.forward_minibatched(
        v31_params, jnp.asarray(samples).reshape(4, 1536), h, c
    )
    assert_close(np.asarray(probs), np.asarray(ref_probs), 1e-5, "window probs")
    assert_close(runner.h, hn, 1e-5, "window hn")


def test_minibatch_runner_state_threads_across_windows(v31_params):
    """Two windows through the runner == one window of all chunks."""
    from vadc_tpu.models import silero_v31

    samples = np.asarray(_random_chunks((8 * 1536,), seed=4))
    r2 = MinibatchRunner("v3", v31_params, batch_size=4, chunk_samples=1536)
    probs2 = r2.process_window(samples[: 4 * 1536]) + r2.process_window(
        samples[4 * 1536 :]
    )

    h = jnp.zeros((2, 1, 64))
    c = jnp.zeros((2, 1, 64))
    ref_probs, _, _ = silero_v31.forward_minibatched(
        v31_params, jnp.asarray(samples).reshape(8, 1536), h, c
    )
    assert_close(np.asarray(probs2), np.asarray(ref_probs), 1e-5, "two windows")


def test_stream_state_pytree_roundtrip(v31_params):
    from vadc_tpu.engine.runner import StreamState, init_stream_state

    state = init_stream_state("v3", 3)
    leaves, treedef = jax.tree.flatten(state)
    back = jax.tree.unflatten(treedef, leaves)
    assert isinstance(back, StreamState)
    assert back.h.shape == (2, 3, 64)


def test_minibatch_runner_floor_emit(v31_params):
    """process_window must return exactly one probability per chunk in the
    window even when batch_size does not divide the chunk count (round-1
    advisor finding: --batch 40 emitted ~25% spurious zero-pad probabilities,
    skewing every segment timestamp; reference emit rule vadc.c:964)."""
    from tests.conftest import assert_close

    samples = np.asarray(_random_chunks((6 * 1536,), seed=5))
    r4 = MinibatchRunner("v3", v31_params, batch_size=4, chunk_samples=1536)
    probs4 = r4.process_window(samples)
    assert len(probs4) == 6  # not 8 (= 2 batches of 4)

    # the real chunks' probabilities must be unaffected by the pad entries
    r6 = MinibatchRunner("v3", v31_params, batch_size=6, chunk_samples=1536)
    probs6 = r6.process_window(samples)
    assert_close(np.asarray(probs4), np.asarray(probs6), 1e-5, "pad-safe probs")


def test_step_state_is_donated(v31_params):
    """The passed-in state is consumed (buffers aliased into the output) —
    the XLA equivalent of the reference's in-place h/c rotation
    (vadc.c:83-84)."""
    runner = StreamRunner("v3", v31_params)
    state = runner.init_state(2)
    chunks = _random_chunks((2, 1536), seed=6)
    _, new_state = runner.step(chunks, state)
    assert state.h.is_deleted(), "input state.h should be donated"
    assert not new_state.h.is_deleted()


@pytest.mark.parametrize("family", ["v3", "v4", "v4_8k", "v5", "v5_8k"])
def test_tblock_scan_matches_plain_scan(v31_params, family):
    """The chunk-blocked scan (front-end batched over B*tblock) must produce
    the plain scan's probabilities and final state for EVERY family,
    including the v5 context carry and the v4/v5 8 kHz branches (the 8 kHz
    stage strides must reach the blocked encoder too — regression: the
    v4_8k shim had no `encode` for the tblock path to resolve)."""
    from pathlib import Path

    if family == "v3":
        params, chunk = v31_params, 1536
    elif family in ("v4", "v4_8k"):
        from vadc_tpu.io.testtensor import load_testtensor
        from vadc_tpu.models.silero_v4 import silero_v4_params

        name = "silero_v4_16k" if family == "v4" else "silero_v4_8k"
        bundled = (
            Path(__file__).resolve().parent.parent
            / "vadc_tpu" / "data" / f"{name}.testtensor"
        )
        params = silero_v4_params(load_testtensor(bundled))
        chunk = 1536 if family == "v4" else 768
    else:
        from vadc_tpu.models.silero_v5 import silero_v5_params
        from vadc_tpu.models.synthetic import (
            random_v5_8k_archive,
            random_v5_archive,
        )

        if family == "v5":
            params, chunk = silero_v5_params(random_v5_archive()), 512
        else:
            params, chunk = silero_v5_params(random_v5_8k_archive()), 256

    plain = StreamRunner(family, params)
    blocked = StreamRunner(family, params, scan_block_chunks=2)
    chunks = _random_chunks((3, 6, chunk), seed=7)
    p_plain, s_plain = plain.scan(chunks, plain.init_state(3))
    p_blk, s_blk = blocked.scan(chunks, blocked.init_state(3))
    assert_close(p_blk, p_plain, 1e-6, f"{family} tblock probs")
    assert_close(s_blk.h, s_plain.h, 1e-6, f"{family} tblock h")
    assert_close(s_blk.c, s_plain.c, 1e-6, f"{family} tblock c")
    if family == "v5":
        assert_close(s_blk.context, s_plain.context, 0, "v5 tblock context")

    # T not divisible by tblock falls back to the plain scan
    odd = _random_chunks((3, 5, chunk), seed=8)
    p_odd, _ = blocked.scan(odd, blocked.init_state(3))
    p_ref, _ = plain.scan(odd, plain.init_state(3))
    assert_close(p_odd, p_ref, 1e-6, f"{family} odd-T fallback")


@pytest.mark.slow
def test_multihost_dryrun():
    """2 simulated host processes x 4 virtual CPU devices: jax.distributed
    init, global mesh, per-process feeding (engine/distributed.py)."""
    import subprocess
    import sys
    from pathlib import Path

    tool = Path(__file__).parent.parent / "tools" / "multihost_dryrun.py"
    result = subprocess.run(
        [sys.executable, str(tool)], capture_output=True, text=True, timeout=600
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert "MULTIHOST DRYRUN OK" in result.stdout


def test_precision_modes(v31_params):
    """All three precision tiers trace and run; on CPU (where matmul
    precision flags are no-ops) they agree exactly, which pins the modes to
    pure precision changes — no structural divergence."""
    chunks = _random_chunks((2, 2, 1536), seed=9)
    outs = {}
    for mode in ("faithful", "balanced", "fast"):
        r = StreamRunner("v3", v31_params, precision=mode)
        p, _ = r.scan(chunks, r.init_state(2))
        outs[mode] = np.asarray(p)
    # CPU executes every tier in fp64-accumulated fp32; only op selection
    # could differ (the fast path swaps attention/log1p forms)
    assert_close(outs["balanced"], outs["faithful"], 1e-6, "balanced vs faithful")
    assert_close(outs["fast"], outs["faithful"], 1e-4, "fast vs faithful")

    m = MinibatchRunner(
        "v3", v31_params, batch_size=2, chunk_samples=1536, precision="balanced"
    )
    probs = m.process_window(np.asarray(_random_chunks((2 * 1536,), seed=10)))
    assert len(probs) == 2
