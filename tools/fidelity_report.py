"""Golden-fidelity report with error-magnitude buckets.

Runs every tracked reference fixture through the corresponding vadc_tpu op
and prints max-abs-error buckets, mirroring the reference test harness's
report format (test.c:70-130: buckets from exact zero through 1e-10 ... 1).

Usage: python tools/fidelity_report.py [--device cpu|tpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def bucket(err: float) -> str:
    if err == 0.0:
        return "zero"
    for exp in range(-10, 1):
        if err <= 10.0**exp:
            return f"<=1e{exp}"
    return "above 1"


def run_cases(testdata: Path) -> list[tuple[str, float]]:
    """Run every tracked golden fixture on the CURRENT jax backend and
    return (op name, max-abs-error) pairs. Shared by the CLI report and
    tools/tpu_check.py's on-chip regression tier."""
    import jax.numpy as jnp

    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.nn import functional as F
    from vadc_tpu.models.weights import transformer_layer_params, V3_STRIDES

    results = []

    def check(name, actual, expected):
        err = float(np.max(np.abs(np.asarray(actual, np.float64) - np.asarray(expected, np.float64))))
        results.append((name, err))

    d = load_testtensor(testdata / "layernorm_test.testtensor")
    check("layer_norm", F.layer_norm(jnp.asarray(d["input"]), jnp.asarray(d["weight"]), jnp.asarray(d["bias"])), d["result"])

    d = load_testtensor(testdata / "batchnorm_test.testtensor")
    check("batch_norm1d", F.batch_norm1d(jnp.asarray(d["input"]), jnp.asarray(d["running_mean"]), jnp.asarray(d["running_var"]), jnp.asarray(d["weight"]), jnp.asarray(d["bias"])), d["result"])

    d = load_testtensor(testdata / "decoder_test.testtensor")
    check("decoder_v3", F.decoder_v3(jnp.asarray(d["input"]), jnp.asarray(d["weight"][:, :, 0]), jnp.asarray(d["bias"])), d["output"])

    d = load_testtensor(testdata / "dw_conv_129.testtensor")
    check("depthwise_conv5", F.depthwise_conv5(jnp.asarray(d["input"])[None], jnp.asarray(d["weight"]), jnp.asarray(d["bias"]))[0], d["output"])

    d = load_testtensor(testdata / "pw_conv_129_16.testtensor")
    check("pointwise_conv", F.pointwise_conv(jnp.asarray(d["input"])[None], jnp.asarray(d["weight"][:, :, 0]), jnp.asarray(d["bias"]))[0], d["output"])

    d = load_testtensor(testdata / "first_layer_conv_block.testtensor")
    check("conv_block", F.conv_block(jnp.asarray(d["input"])[None], jnp.asarray(d["dw_conv.0.weight"]), jnp.asarray(d["dw_conv.0.bias"]), jnp.asarray(d["pw_conv.0.weight"][:, :, 0]), jnp.asarray(d["pw_conv.0.bias"]), jnp.asarray(d["proj.weight"][:, :, 0]), jnp.asarray(d["proj.bias"]))[0], d["output"])

    d = load_testtensor(testdata / "dual_head_attention_test.testtensor")
    check("attention", F.attention(jnp.asarray(d["input"])[None], jnp.asarray(d["weights"]), jnp.asarray(d["biases"]), jnp.asarray(d["proj_weights"]), jnp.asarray(d["proj_biases"]))[0], d["result"])

    d = load_testtensor(testdata / "adaptive_audio_normalization_test.testtensor")
    check("adaptive_norm", F.adaptive_audio_normalization(jnp.asarray(d["input"])), d["output"])

    d = load_testtensor(testdata / "lstm_nito_reference_randn.testtensor")
    out, hn, cn = F.lstm(jnp.asarray(d["input_x"])[None], jnp.asarray(d["hidden_state_previous"])[:, None, :], jnp.asarray(d["cell_state_previous"])[:, None, :], jnp.asarray(d["weights_transposed"]), jnp.asarray(d["biases"]))
    check("lstm", out[0], d["output"][:7])

    for fixture, layers, label in (
        ("transformer_first_layer.testtensor", None, "encoder layer 1"),
        ("transformer_layers_1_2.testtensor", (1, 2), "encoder layers 1-2"),
        ("transformer_layers_1_2_3.testtensor", (1, 2, 3), "encoder layers 1-3"),
        ("transformer_layers_1_2_3_4.testtensor", (1, 2, 3, 4), "full encoder"),
    ):
        d = load_testtensor(testdata / fixture)
        x = jnp.asarray(d["input"])
        if layers is None:
            x = F.transformer_layer(x, transformer_layer_params(d), stride=2)
        else:
            for lid, stride in zip(layers, V3_STRIDES):
                x = F.transformer_layer(x, transformer_layer_params(d, f"transformer_l{lid}."), stride=stride)
        check(label, x, d["result"])

    d = load_testtensor(testdata / "adaptive_normalization_encoder.testtensor")
    x = F.adaptive_audio_normalization(jnp.asarray(d["input"]))
    for lid, stride in zip((1, 2, 3, 4), V3_STRIDES):
        x = F.transformer_layer(x, transformer_layer_params(d, f"transformer_l{lid}."), stride=stride)
    check("adaptive_norm + encoder", x, d["result"])
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", choices=("cpu", "tpu"), default="cpu")
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    testdata = Path("/root/reference/testdata")
    if not testdata.is_dir():
        print("reference testdata not found", file=sys.stderr)
        return 1
    results = run_cases(testdata)

    print(f"device: {jax.devices()[0]}")
    print(f"{'op':28s} {'max-abs-error':>14s}  bucket")
    for name, err in results:
        print(f"{name:28s} {err:14.3e}  {bucket(err)}")
    worst = max(err for _, err in results)
    print(f"\nworst: {worst:.3e} ({bucket(worst)}); all within the reference "
          "per-op tolerance" if worst <= 1e-4 else f"\nworst: {worst:.3e} EXCEEDS 1e-4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
