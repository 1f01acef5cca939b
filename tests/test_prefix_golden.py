"""Compositional prefix tests: each adds one pipeline stage, mirroring the
reference's tier-2 golden pyramid (test.c:820-1500). All inputs/outputs come
from tracked reference fixtures."""

import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.nn import functional as F
from vadc_tpu.models.weights import transformer_layer_params, V3_STRIDES


def _run_layers(tensors, layer_ids, strides, x):
    for lid, stride in zip(layer_ids, strides):
        p = transformer_layer_params(tensors, f"transformer_l{lid}.")
        x = F.transformer_layer(x, p, stride=stride)
    return x


def test_transformer_first_layer(testdata):
    d = load_testtensor(testdata / "transformer_first_layer.testtensor")
    p = transformer_layer_params(d)  # unprefixed keys in this fixture
    out = F.transformer_layer(jnp.asarray(d["input"]), p, stride=2)
    assert_close(out, d["result"], 1e-4, "transformer_first_layer")


def test_layers_1_2(testdata):
    d = load_testtensor(testdata / "transformer_layers_1_2.testtensor")
    out = _run_layers(d, (1, 2), V3_STRIDES[:2], jnp.asarray(d["input"]))
    assert_close(out, d["result"], 1e-4, "layers_1_2")


def test_layers_3_alone(testdata):
    d = load_testtensor(testdata / "transformer_layers_3.testtensor")
    out = _run_layers(d, (3,), (V3_STRIDES[2],), jnp.asarray(d["input"]))
    assert_close(out, d["result"], 1e-4, "layers_3")


def test_layers_1_2_3(testdata):
    d = load_testtensor(testdata / "transformer_layers_1_2_3.testtensor")
    out = _run_layers(d, (1, 2, 3), V3_STRIDES[:3], jnp.asarray(d["input"]))
    assert_close(out, d["result"], 1e-4, "layers_1_2_3")


def test_layers_1_2_3_4_full_encoder(testdata):
    d = load_testtensor(testdata / "transformer_layers_1_2_3_4.testtensor")
    out = _run_layers(d, (1, 2, 3, 4), V3_STRIDES, jnp.asarray(d["input"]))
    assert_close(out, d["result"], 1e-4, "full_encoder")


def test_adaptive_norm_plus_encoder(testdata):
    d = load_testtensor(testdata / "adaptive_normalization_encoder.testtensor")
    x = F.adaptive_audio_normalization(jnp.asarray(d["input"]))
    out = _run_layers(d, (1, 2, 3, 4), V3_STRIDES, x)
    assert_close(out, d["result"], 1e-4, "adaptive_norm+encoder")
