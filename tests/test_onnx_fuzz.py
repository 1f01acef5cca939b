"""Executor robustness under mutated Silero-shaped graphs, and official
v3/v4 behavior parity across the full supported batch x sequence matrix.

The contract under fuzzing: every failure is a ONE-LINE diagnosis
(OnnxExecError / UnsupportedOnnxOp naming the node and cause), never a raw
numpy/KeyError traceback — the role the reference delegates to ORT's error
macro (onnx_helpers.h:5-14). The shape matrix is the variable-length role
of onnx_helpers.c:230-275."""

import copy

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import assert_close
from vadc_tpu.export.onnx_exec import (
    OnnxExecError,
    OnnxExecutor,
    UnsupportedOnnxOp,
    run_silero_onnx,
)
from vadc_tpu.export.onnx_extract import parse_model

V3_ONNX = "/root/reference/silero_vad_v3.onnx"
V4_ONNX = "/root/reference/silero_vad_v4.onnx"

EXPECTED_FAILURES = (OnnxExecError, UnsupportedOnnxOp)


def _exists(path):
    from pathlib import Path

    if not Path(path).exists():
        pytest.skip(f"{path} not available")
    return path


@pytest.fixture(scope="module")
def v5_graph(tmp_path_factory):
    """An executable official-topology fused v5 graph (no official-file
    dependency): Conv/LSTM/Pad/If/Slice/Concat — the full op surface."""
    from vadc_tpu.export.onnx_build import build_silero_v5_onnx
    from vadc_tpu.models.synthetic import random_v5_8k_archive, random_v5_archive

    path = tmp_path_factory.mktemp("fuzz") / "v5.onnx"
    build_silero_v5_onnx(
        path, dict(random_v5_archive(7)), dict(random_v5_8k_archive(8))
    )
    return parse_model(path)


def _feeds(ex: OnnxExecutor, batch=2, n=576):
    rng = np.random.default_rng(0)
    feeds = {}
    for name in ex.input_names:
        if name in ("sr", "sample_rate"):
            feeds[name] = np.asarray(16000, np.int64)
        elif name in ("state",):
            feeds[name] = np.zeros((2, batch, 128), np.float32)
        elif name in ("h", "h0", "hn"):
            feeds[name] = np.zeros((2, batch, 64), np.float32)
        elif name in ("c", "c0", "cn"):
            feeds[name] = np.zeros((2, batch, 64), np.float32)
        else:
            feeds[name] = (0.1 * rng.normal(size=(batch, n))).astype(np.float32)
    return feeds


def _run_mutant(graph) -> str:
    """Run a mutated graph; classify the outcome. Any exception other than
    the two diagnostic types (or a multi-line message) is a test failure."""
    ex = OnnxExecutor(graph)
    try:
        ex.run(_feeds(ex))
        return "ran"
    except EXPECTED_FAILURES as e:
        msg = str(e)
        assert msg and "\n" not in msg, f"diagnosis not one line: {msg!r}"
        return "diagnosed"


class TestMutatedGraphs:
    def test_dropped_nodes(self, v5_graph):
        """Dropping any single node either still runs (dead/benign node) or
        produces the one-line undefined-tensor / missing-output diagnosis."""
        outcomes = {"ran": 0, "diagnosed": 0}
        for k in range(len(v5_graph.nodes)):
            g = copy.deepcopy(v5_graph)
            del g.nodes[k]
            outcomes[_run_mutant(g)] += 1
        # the harness must actually bite: most drops break the dataflow
        assert outcomes["diagnosed"] >= len(v5_graph.nodes) // 2, outcomes

    def test_renamed_tensors(self, v5_graph):
        """Renaming any node's first output breaks its consumers with the
        undefined-tensor diagnosis (or runs, if the output is unused)."""
        outcomes = {"ran": 0, "diagnosed": 0}
        for k in range(len(v5_graph.nodes)):
            g = copy.deepcopy(v5_graph)
            if not g.nodes[k].outputs or not g.nodes[k].outputs[0]:
                continue
            g.nodes[k].outputs[0] = f"renamed_{k}"
            outcomes[_run_mutant(g)] += 1
        assert outcomes["diagnosed"] >= 1, outcomes

    def test_corrupt_initializer_dims(self, v5_graph):
        """Truncating / transposing weight initializers (including inside
        the If subgraphs, where the fused model keeps them) yields shape
        diagnoses, not numpy tracebacks."""

        def walk(g):
            yield g
            for node in g.nodes:
                for sub in node.subgraphs:
                    yield from walk(sub)

        names = sorted(
            {
                n
                for g in walk(v5_graph)
                for n, arr in g.initializers.items()
                if np.ndim(arr) >= 2
            }
        )
        assert names, "fixture graph has no >=2-D initializers to corrupt"
        outcomes = {"ran": 0, "diagnosed": 0}
        for name in names:
            for mutate in (
                lambda a: a[1:],  # drop a row
                lambda a: np.swapaxes(a, -1, -2),  # transpose
            ):
                g = copy.deepcopy(v5_graph)
                for sub in walk(g):
                    if name in sub.initializers:
                        sub.initializers[name] = mutate(
                            np.asarray(sub.initializers[name])
                        )
                outcomes[_run_mutant(g)] += 1
        assert outcomes["diagnosed"] >= len(names) // 2, outcomes

    def test_wrong_feed_dims(self, v5_graph):
        """Malformed caller feeds (wrong rank, wrong state hidden size,
        missing feed) are diagnosed in one line."""
        ex = OnnxExecutor(v5_graph)
        good = _feeds(ex)

        audio_name = next(
            n for n in ex.input_names if n not in ("sr", "sample_rate", "state")
        )
        for bad in (
            {**good, audio_name: np.zeros((3,), np.float32)},  # rank 1
            {**good, "state": np.zeros((2, 2, 64), np.float32)},  # v3-sized
            {**good, "state": np.zeros((128,), np.float32)},  # rank 1
        ):
            if "state" not in ex.input_names and "state" in bad:
                bad = {k: v for k, v in bad.items() if k in ex.input_names}
                if bad == good:
                    continue
            with pytest.raises(EXPECTED_FAILURES) as exc:
                ex.run(bad)
            assert "\n" not in str(exc.value)

        with pytest.raises(OnnxExecError, match="missing feeds"):
            ex.run({k: v for k, v in good.items() if k != audio_name})

    def test_official_v3_dropped_nodes_sampled(self):
        """Same drop fuzz over the real official v3 graph (sampled — it has
        hundreds of nodes)."""
        path = _exists(V3_ONNX)
        base = parse_model(path)
        outcomes = {"ran": 0, "diagnosed": 0}
        for k in range(0, len(base.nodes), max(1, len(base.nodes) // 25)):
            g = copy.deepcopy(base)
            del g.nodes[k]
            ex = OnnxExecutor(g)
            try:
                rng = np.random.default_rng(1)
                audio = (0.1 * rng.normal(size=(1, 1536))).astype(np.float32)
                feeds = {ex.input_names[0]: audio}
                for n in ex.input_names[1:]:
                    feeds[n] = np.zeros((2, 1, 64), np.float32)
                ex.run(feeds)
                outcomes["ran"] += 1
            except EXPECTED_FAILURES as e:
                assert "\n" not in str(e)
                outcomes["diagnosed"] += 1
        assert outcomes["diagnosed"] >= 1, outcomes


class TestShapeMatrix:
    """Official-graph parity at every supported batch x sequence shape —
    the executor and the JAX forward must agree everywhere the contract
    allows (512-1536 in 256-multiples at 16 kHz, halved at 8 kHz)."""

    @pytest.mark.parametrize("batch", [1, 3])
    @pytest.mark.parametrize("seq", [512, 768, 1024, 1536])
    def test_v3_matrix(self, batch, seq):
        from vadc_tpu.models import silero_v31
        from vadc_tpu.models.weights import load_params

        path = _exists(V3_ONNX)
        _, params = load_params(path)
        rng = np.random.default_rng(seq + batch)
        audio = (0.1 * rng.normal(size=(batch, seq))).astype(np.float32)
        h = np.zeros((2, batch, 64), np.float32)
        out, hn, cn = run_silero_onnx(path, audio, state=(h, h))
        p, _, _ = silero_v31.forward(
            params, jnp.asarray(audio), jnp.asarray(h), jnp.asarray(h)
        )
        assert_close(
            np.asarray(p).ravel(), out[:, 1, 0], 1e-5, f"v3 b{batch} s{seq}"
        )

    @pytest.mark.parametrize("batch", [1, 3])
    @pytest.mark.parametrize(
        "sr,seq",
        [(16000, 512), (16000, 1024), (16000, 1536),
         (8000, 256), (8000, 512), (8000, 768)],
    )
    def test_v4_matrix(self, batch, sr, seq):
        import vadc_tpu.models.silero_v4 as m
        from vadc_tpu.models.weights import load_params

        path = _exists(V4_ONNX)
        fam, params = load_params(path, sample_rate=sr)
        fwd = m.forward if fam == "v4" else m.v4_8k.forward
        rng = np.random.default_rng(sr + seq + batch)
        audio = (0.1 * rng.normal(size=(batch, seq))).astype(np.float32)
        out, _, _ = run_silero_onnx(path, audio, sample_rate=sr)
        h = jnp.zeros((2, batch, 64))
        p, _, _ = fwd(params, jnp.asarray(audio), h, h)
        assert_close(
            np.asarray(p).ravel(), out.ravel(), 1e-5, f"v4 sr{sr} b{batch} s{seq}"
        )
