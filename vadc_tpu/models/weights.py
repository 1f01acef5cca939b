"""Weight schemas: named .testtensor archives -> model param pytrees.

The v3.1 weight archive layout (99 tensors) is the one produced by the
reference export path (reference utils.py:194-232, consumed by
tensor.h:114-191): `forward_basis_buffer`, four `transformer_l{1..4}.*`
groups (l3 has no conv-block projection), fused LSTM `weights`/`biases`,
and `decoder_weights`/`decoder_biases`.

Model family detection mirrors the reference's ONNX introspection heuristic
(onnx_helpers.c:154-161): LSTM hidden size 128 => v5; a 258-channel first
conv block => v4; otherwise v3.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from vadc_tpu.io.testtensor import load_testtensor

# Encoder stage conv strides for v3 (reference tensor.h:158-161).
V3_STRIDES = (2, 2, 1, 1)
# v4 16 kHz uses stride 2 on stage 3 as well (silero_vad.py:175-178).
V4_STRIDES_16K = (2, 2, 2, 1)
V4_STRIDES_8K = (2, 2, 1, 1)

_TRANSFORMER_KEYS = {
    "dw_w": ("dw_conv_weights", "dw"),
    "dw_b": ("dw_conv_biases", None),
    "pw_w": ("pw_conv_weights", "pw"),
    "pw_b": ("pw_conv_biases", None),
    "proj_w": ("proj_weights", "pw"),
    "proj_b": ("proj_biases", None),
    "qkv_w": ("attention_weights", None),
    "qkv_b": ("attention_biases", None),
    "att_proj_w": ("attention_proj_weights", None),
    "att_proj_b": ("attention_proj_biases", None),
    "norm1_w": ("norm1_weights", None),
    "norm1_b": ("norm1_biases", None),
    "lin1_w": ("linear1_weights", None),
    "lin1_b": ("linear1_biases", None),
    "lin2_w": ("linear2_weights", None),
    "lin2_b": ("linear2_biases", None),
    "norm2_w": ("norm2_weights", None),
    "norm2_b": ("norm2_biases", None),
    "conv_w": ("conv_weights", "pw"),
    "conv_b": ("conv_biases", None),
    "bn_w": ("batch_norm_weights", None),
    "bn_b": ("batch_norm_biases", None),
    "bn_mean": ("batch_norm_running_mean", None),
    "bn_var": ("batch_norm_running_var", None),
}


def _canon(arr: np.ndarray, kind: str | None) -> jnp.ndarray:
    """Canonicalize a raw weight: squeeze conv kernel dims to matmul shapes."""
    if kind == "dw":
        # [C, 1, 5] or [C, 5] -> [C, 5]
        arr = arr.reshape(arr.shape[0], -1)
    elif kind == "pw":
        # [O, C, 1] or [O, C] -> [O, C]
        arr = arr.reshape(arr.shape[0], -1)
    return jnp.asarray(arr, dtype=jnp.float32)


def transformer_layer_params(
    tensors: dict[str, np.ndarray], prefix: str = ""
) -> dict:
    """Extract one encoder-stage param group; `proj_*` are absent for stages
    without a conv-block projection (v3.1 stage 3)."""
    p: dict = {}
    for out_key, (name, kind) in _TRANSFORMER_KEYS.items():
        full = f"{prefix}{name}"
        if full not in tensors:
            # proj is architecturally absent on stage 3; batch-norm tensors
            # are absent when the exporter folded BN into the stage conv
            # (the official .onnx exports do this)
            if out_key in ("proj_w", "proj_b") or out_key.startswith("bn_"):
                continue
            raise KeyError(f"missing weight tensor {full!r}")
        p[out_key] = _canon(tensors[full], kind)
    return p


def silero_v31_params(tensors: dict[str, np.ndarray]) -> dict:
    """Build the Silero v3.1 param pytree from the 99-tensor archive."""
    basis = np.asarray(tensors["forward_basis_buffer"])
    params = {
        "stft_basis": jnp.asarray(basis.reshape(basis.shape[0], -1), jnp.float32),
        "layers": [
            transformer_layer_params(tensors, f"transformer_l{i}.")
            for i in (1, 2, 3, 4)
        ],
        "lstm_w": jnp.asarray(tensors["weights"], jnp.float32),
        "lstm_b": jnp.asarray(tensors["biases"], jnp.float32),
        "dec_w": _canon(np.asarray(tensors["decoder_weights"]), "pw"),
        "dec_b": jnp.asarray(tensors["decoder_biases"], jnp.float32),
    }
    return params


def clamp_sequence_count(family: str, requested: int) -> int:
    """Model-imposed chunk-size contract (reference vadc.h:85-94, clamp
    vadc.c:742-754, README:180-183): v3/v4 chunk sizes are MULTIPLES OF 256
    in [512, 1536] (the model strides by 256-sample slices) — a request like
    1000 is rounded to the nearest valid operating point (1024), never run
    as-is; 8 kHz branch families use half-rate slices (128) and ranges; v5
    is fixed at 512 (+64 carried context), v5 8 kHz at 256 (+32).

    Lives with the model metadata (not the CLI): the engine, server, and
    Python API all enforce the same contract."""
    if family == "v5":
        return 512
    if family == "v5_8k":
        return 256
    if family == "v4_8k":
        slice_samples, lo, hi = 128, 256, 768
    else:
        slice_samples, lo, hi = 256, 512, 1536
    rounded = int(requested / slice_samples + 0.5) * slice_samples
    return max(lo, min(hi, rounded))


def detect_model_family(tensors: dict[str, np.ndarray]) -> str:
    """Classify a weight archive as 'v3', 'v4', or 'v5'.

    Mirrors the reference's model introspection (onnx_helpers.c:154-161,
    277-312): LSTM hidden 128 => v5; v4 is v3-shaped but its first conv block
    consumes 258 channels (cat[spect, normalized]) and has no transformer
    blocks.
    """
    if "transformer_l1.dw_conv_weights" in tensors:
        return "v3"
    if "stage1.dw_conv_weights" in tensors:
        sr = tensors.get("meta.sample_rate")
        if sr is not None and int(sr[0]) == 8000:
            return "v4_8k"
        return "v4"
    if "enc1.weight" in tensors or (
        "weights" in tensors and tensors["weights"].shape[-1] == 256
    ):
        # fused [L, 4H, 2H]: 2H=256 => hidden 128 => v5 (v3/v4 have 2H=128).
        # The 8 kHz branch has a half-rate STFT basis (n_fft 128 -> 130 rows
        # vs 258 at 16 kHz); meta.sample_rate wins when recorded.
        sr = tensors.get("meta.sample_rate")
        if sr is not None and int(np.asarray(sr).ravel()[0]) == 8000:
            return "v5_8k"
        basis = tensors.get("forward_basis_buffer")
        if basis is not None and basis.shape[0] == 130:
            return "v5_8k"
        return "v5"
    raise ValueError("unrecognized weight archive layout")


def load_params_from_tensors(tensors: dict[str, np.ndarray]) -> tuple[str, dict]:
    """Classify a loaded tensor archive and build its param pytree."""
    family = detect_model_family(tensors)
    if family == "v3":
        return family, silero_v31_params(tensors)
    if family in ("v5", "v5_8k"):
        from vadc_tpu.models.silero_v5 import silero_v5_params

        return family, silero_v5_params(tensors)
    from vadc_tpu.models.silero_v4 import silero_v4_params

    return family, silero_v4_params(
        tensors, sample_rate=8000 if family == "v4_8k" else 16000
    )


def load_params(path: str | Path, sample_rate: int = 16000) -> tuple[str, dict]:
    """Load model weights, returning (family, params).

    Accepts .testtensor archives or official .onnx models directly (the
    reference's ORT backend takes .onnx via --model; here the weights are
    extracted in-process by the dependency-free protobuf reader — v4/v4_8k
    fused models and plain v3 graphs are auto-distinguished).

    sample_rate selects the If-branch of fused v4/v5 .onnx models (they
    carry both rates; onnx_helpers.c:314-357 routes this via the sr input
    at runtime, here it routes extraction). Testtensor archives record
    their rate in `meta.sample_rate` and ignore this argument."""
    path = Path(path)
    if path.suffix.lower() == ".onnx":
        from vadc_tpu.export.onnx_extract import classify_model
        from vadc_tpu.export.silero_v3_from_onnx import extract_silero_v3
        from vadc_tpu.export.silero_v4_from_onnx import extract_silero_v4
        from vadc_tpu.export.silero_v5_from_onnx import extract_silero_v5

        # positive marker-based classification (onnx_helpers.c:154-161);
        # corrupt/unknown graphs raise a one-line ValueError here instead of
        # dying later inside the wrong extractor
        family = classify_model(path)
        if family == "v5":
            tensors = extract_silero_v5(path, sample_rate)
        elif family == "v4":
            tensors = extract_silero_v4(path, sample_rate)
        else:
            if sample_rate != 16000:
                raise ValueError(
                    "v3 models have no 8 kHz branch (16 kHz only)"
                )
            tensors = extract_silero_v3(path)
        return load_params_from_tensors(tensors)
    return load_params_from_tensors(load_testtensor(path))
