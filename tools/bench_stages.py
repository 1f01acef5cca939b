"""Per-stage device timing of the Silero v3.1 pipeline.

Runs each pipeline stage N times inside one jitted fori_loop (input is
perturbed by the loop index so XLA cannot hoist the stage out of the loop)
and divides by N — this amortizes the device-tunnel round trip that makes
naive per-call timing useless in this environment.

Usage: python tools/bench_stages.py [batch]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vadc_tpu.nn import functional as F
    from vadc_tpu.models import silero_v31
    from vadc_tpu.models.weights import V3_STRIDES
    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from __graft_entry__ import _load_v31_params

    enable_persistent_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = 30
    params = _load_v31_params()
    rng = np.random.default_rng(0)

    def timed(name, fn, *args):
        """Apply fn iters times in one jit; report per-iteration µs."""

        def body(i, carry):
            x, acc = carry
            out = fn(x * (1.0 + 1e-12 * i), *args)
            return x, acc + jnp.sum(out) * 1e-30

        @jax.jit
        def run(x):
            _, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
            return acc

        x0 = args_input[name]
        run(x0)  # compile
        np.asarray(run(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            best = min(best, time.perf_counter() - t0)
        per = best / iters
        print(f"{name:24s} {per*1e6:10.1f} us/iter")
        return per

    audio = jnp.asarray(rng.normal(size=(batch, 1536)).astype(np.float32) * 0.1)
    spect = F.stft_magnitude(audio, params["stft_basis"], pad_left=128, pad_right=128, hop=64)
    x = F.adaptive_audio_normalization(spect)
    feats = [x]
    for lp, s in zip(params["layers"], V3_STRIDES):
        feats.append(F.transformer_layer(feats[-1], lp, stride=s))
    enc_out = feats[-1]
    lstm_in = enc_out.transpose(0, 2, 1)

    args_input = {
        "stft": audio,
        "adaptive_norm": spect,
        "layer1 (129->16,/2)": feats[0],
        "layer2 (16->32,/2)": feats[1],
        "layer3 (32->32)": feats[2],
        "layer4 (32->64)": feats[3],
        "lstm (7 steps)": lstm_in,
        "decoder": enc_out,
        "FULL forward": audio,
    }

    h, c = silero_v31.init_state(batch)
    total = 0.0
    total += timed("stft", lambda a: F.stft_magnitude(
        a, params["stft_basis"], pad_left=128, pad_right=128, hop=64))
    total += timed("adaptive_norm", F.adaptive_audio_normalization)
    for i, (lp, s) in enumerate(zip(params["layers"], V3_STRIDES)):
        name = list(args_input)[2 + i]
        total += timed(name, lambda xx, lp=lp, s=s: F.transformer_layer(xx, lp, stride=s))
    total += timed("lstm (7 steps)", lambda xx: F.lstm(
        xx, h, c, params["lstm_w"], params["lstm_b"])[0])
    total += timed("decoder", lambda xx: F.decoder_v3(xx, params["dec_w"], params["dec_b"]))
    print(f"{'sum of stages':24s} {total*1e6:10.1f} us")
    timed("FULL forward", lambda a: silero_v31.forward(params, a, h, c)[0])


if __name__ == "__main__":
    main()
