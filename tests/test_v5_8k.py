"""Silero v5 8 kHz branch tests + v5 ONNX extraction.

Like the 16 kHz v5 (test_v5.py), no official weights exist in this
environment, so the architecture is validated against the independent torch
oracle with random weights. The ONNX extraction path is exercised against a
synthetic .onnx built with a minimal protobuf writer that mirrors the
official fused model's structure: 16 kHz initializers in the top graph,
`_model_8k.*` initializers inside an If-node subgraph (the sr branch,
onnx_helpers.c:314-357)."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.models import silero_v5
from vadc_tpu.models.synthetic import random_v5_8k_archive
from vadc_tpu.models.weights import detect_model_family
from vadc_tpu.io.testtensor import load_testtensor_bytes, save_testtensor_bytes




@pytest.fixture(scope="module")
def v5_8k_params():
    return silero_v5.silero_v5_params(random_v5_8k_archive())


def test_family_detection_8k():
    archive = random_v5_8k_archive()
    assert detect_model_family(archive) == "v5_8k"
    back = load_testtensor_bytes(save_testtensor_bytes(archive))
    assert detect_model_family(back) == "v5_8k"
    # basis-shape heuristic alone (no meta tensor) also classifies 8k
    del archive["meta.sample_rate"]
    assert detect_model_family(archive) == "v5_8k"


def test_forward_shapes_8k(v5_8k_params):
    audio = jnp.zeros((3, 288), jnp.float32)  # 32 context + 256 window
    h, c = silero_v5.v5_8k.init_state(3)
    probs, hn, cn = silero_v5.v5_8k.forward(v5_8k_params, audio, h, c)
    assert probs.shape == (3,)
    assert hn.shape == (1, 3, 128) and cn.shape == (1, 3, 128)


def test_encoder_frame_count_8k(v5_8k_params):
    # 288 samples -> pad 32 -> 320 -> (320-128)/64+1 = 4 STFT frames
    # -> strides 1,2,2,1 -> 1 frame (identical geometry to 16 kHz)
    feats = silero_v5.v5_8k.encode(v5_8k_params, jnp.zeros((1, 288), jnp.float32))
    assert feats.shape == (1, 1, 128)


def test_vs_torch_oracle_8k(v5_8k_params):
    torch_oracle = pytest.importorskip("tests.torch_oracle")
    rng = np.random.default_rng(41)
    h, c = silero_v5.v5_8k.init_state(2)
    oh, oc = np.asarray(h), np.asarray(c)
    for step in range(3):
        audio = (rng.normal(size=(2, 288)) * 0.1).astype(np.float32)
        probs, h, c = silero_v5.v5_8k.forward(v5_8k_params, jnp.asarray(audio), h, c)
        ref, oh, oc = torch_oracle.silero_v5_forward(
            v5_8k_params, audio, oh, oc, pad_right=32, hop=64
        )
        assert_close(probs, ref, 1e-3, f"v5_8k probs step {step}")
        assert_close(c, oc, 1e-3, f"v5_8k c step {step}")


def test_scan_carries_32_sample_context(v5_8k_params):
    from vadc_tpu.engine.runner import StreamRunner

    rng = np.random.default_rng(42)
    chunks = jnp.asarray((rng.normal(size=(2, 4, 256)) * 0.1).astype(np.float32))
    runner = StreamRunner("v5_8k", v5_8k_params)
    state0 = runner.init_state(2)
    assert state0.context.shape == (2, 32)
    probs_scan, state_scan = runner.scan(chunks, state0)

    state = runner.init_state(2)
    outs = []
    for t in range(4):
        p, state = runner.step(chunks[:, t], state)
        outs.append(p)
    assert_close(probs_scan, jnp.stack(outs, axis=1), 1e-6, "v5_8k scan vs steps")
    np.testing.assert_array_equal(
        np.asarray(state_scan.context), np.asarray(chunks[:, -1, -32:])
    )


def test_minibatch_context_chaining_8k(v5_8k_params):
    from vadc_tpu.engine.runner import MinibatchRunner

    rng = np.random.default_rng(43)
    stream = (rng.normal(size=6 * 256) * 0.1).astype(np.float32)
    runner = MinibatchRunner("v5_8k", v5_8k_params, batch_size=3, chunk_samples=256)
    probs = runner.process_window(stream[: 3 * 256]) + runner.process_window(
        stream[3 * 256 :]
    )

    padded = np.concatenate([np.zeros(32, np.float32), stream])
    windows = np.stack([padded[i * 256 : i * 256 + 288] for i in range(6)])
    h = jnp.zeros((1, 1, 128))
    c = jnp.zeros((1, 1, 128))
    ref_probs, _, _ = silero_v5.v5_8k.forward_minibatched(
        v5_8k_params, jnp.asarray(windows), h, c
    )
    assert_close(np.asarray(probs), np.asarray(ref_probs), 1e-5, "v5_8k windows")


# ---- synthetic official-shaped v5 .onnx -----------------------------------


def _pb_key(field: int, wire: int) -> bytes:
    return _pb_varint((field << 3) | wire)


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_key(field, 2) + _pb_varint(len(payload)) + payload


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    # TensorProto: dims=1 (repeated varint), data_type=2, name=8, raw_data=9
    out = b""
    for d in arr.shape:
        out += _pb_key(1, 0) + _pb_varint(d)
    out += _pb_key(2, 0) + _pb_varint(1)  # FLOAT
    out += _pb_len(8, name.encode())
    out += _pb_len(9, np.asarray(arr, "<f4").tobytes())
    return out


def _graph_proto(initializers: dict[str, np.ndarray], subgraphs=()) -> bytes:
    out = b""
    for sub in subgraphs:
        # NodeProto(field 1): op_type=4 "If", attribute=5 (AttributeProto:
        # name=1, g=6)
        attr = _pb_len(1, b"then_branch") + _pb_len(6, sub)
        node = _pb_len(4, b"If") + _pb_len(5, attr)
        out += _pb_len(1, node)
    for name, arr in initializers.items():
        out += _pb_len(5, _tensor_proto(name, arr))
    return out


def synthetic_v5_onnx(path, archive_16k: dict, archive_8k: dict) -> None:
    """Official-shaped fused v5: 16 kHz weights in the top graph, the 8 kHz
    branch inside an If subgraph, jit parameter names preserved."""

    def inits(archive, prefix):
        out = {f"{prefix}stft.forward_basis_buffer": archive["forward_basis_buffer"]}
        for i in range(4):
            out[f"{prefix}encoder.{i}.reparam_conv.weight"] = archive[
                f"enc{i + 1}.weight"
            ]
            out[f"{prefix}encoder.{i}.reparam_conv.bias"] = archive[f"enc{i + 1}.bias"]
        w = archive["weights"][0]
        out[f"{prefix}decoder.rnn.weight_ih_l0"] = w[:, :128].copy()
        out[f"{prefix}decoder.rnn.weight_hh_l0"] = w[:, 128:].copy()
        out[f"{prefix}decoder.rnn.bias_ih_l0"] = archive["biases"][0].copy()
        out[f"{prefix}decoder.rnn.bias_hh_l0"] = np.zeros(512, np.float32)
        out[f"{prefix}decoder.decoder.2.weight"] = archive["decoder_weights"]
        out[f"{prefix}decoder.decoder.2.bias"] = archive["decoder_biases"]
        return out

    sub = _graph_proto(inits(archive_8k, "_model_8k."))
    graph = _graph_proto(inits(archive_16k, "_model."), subgraphs=[sub])
    Path = __import__("pathlib").Path
    Path(path).write_bytes(_pb_len(7, graph))  # ModelProto.graph


def test_v5_onnx_extraction_roundtrip(tmp_path):
    """--model <v5.onnx> end-to-end: both branches extract to archives whose
    forward matches the source weights exactly."""
    from vadc_tpu.export.silero_v5_from_onnx import extract_silero_v5
    from vadc_tpu.models.weights import load_params

    from vadc_tpu.models.synthetic import random_v5_archive
    a16 = dict(random_v5_archive(7))
    a8 = random_v5_8k_archive(8)
    onnx_path = tmp_path / "silero_vad_v5.onnx"
    synthetic_v5_onnx(onnx_path, a16, a8)

    got16 = extract_silero_v5(onnx_path, 16000)
    np.testing.assert_array_equal(got16["forward_basis_buffer"], a16["forward_basis_buffer"])
    np.testing.assert_array_equal(got16["weights"], a16["weights"])
    np.testing.assert_array_equal(got16["biases"], a16["biases"])
    np.testing.assert_array_equal(got16["enc3.weight"], a16["enc3.weight"])

    got8 = extract_silero_v5(onnx_path, 8000)
    np.testing.assert_array_equal(got8["forward_basis_buffer"], a8["forward_basis_buffer"])
    np.testing.assert_array_equal(got8["enc1.weight"], a8["enc1.weight"])
    np.testing.assert_array_equal(got8["weights"], a8["weights"])

    # the CLI's --model path: .onnx -> (family, params) directly
    family, params = load_params(onnx_path)
    assert family == "v5"
    ref = silero_v5.silero_v5_params(a16)
    h, c = silero_v5.init_state(1)
    audio = jnp.asarray(
        (np.random.default_rng(9).normal(size=(1, 576)) * 0.1).astype(np.float32)
    )
    p_got, _, _ = silero_v5.forward(params, audio, h, c)
    p_ref, _, _ = silero_v5.forward(ref, audio, h, c)
    assert_close(p_got, p_ref, 0, "onnx-extracted v5 forward")
