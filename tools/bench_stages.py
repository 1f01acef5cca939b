"""Per-stage device timing of the Silero v3.1 pipeline — prefix-scan method.

Times PREFIX pipelines (stft; +norm; +layer1; ...; +decoder), each as a
sustained long/short scan difference, and reports per-stage cost as the
difference between consecutive prefixes. This is the only per-stage method
that holds up in this environment: timing a stage in isolation (a fori_loop
around one op, this tool's previous approach) pays un-amortized boundary
costs and runs in the chip's bursty-clock regime — its per-stage numbers
summed to 3x the real full-forward time. Prefix differences run every
measurement inside the same sustained whole-pipeline regime as production.
See docs/PERFORMANCE.md "Where the step actually goes".

Cheap prefixes (stft alone is ~0.1 ms/chunk) sit near the tunnel-RTT
jitter floor, so the first row or two can read low/negative; the deeper
cumulative numbers and the full-pipeline total are the reliable figures.

Usage: python tools/bench_stages.py [batch] [precision]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

T_SHORT, T_LONG = 16, 336


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
    precision = sys.argv[2] if len(sys.argv) > 2 else "fast"
    params = _load_v31_params()

    def prefix_scan(depth):
        """depth: 1=stft, 2=+norm, 3..6=+layer1..4, 7=+lstm, 8=+decoder."""

        def fwd(p, audio, h, c):
            with F.precision_mode(precision):
                x = F.stft_magnitude_nlc(
                    audio, p["stft_basis"], pad_left=128, pad_right=128, hop=64
                )
                if depth >= 2:
                    x = F.adaptive_audio_normalization_nlc(x)
                n_layers = min(depth - 2, 4) if depth > 2 else 0
                for i in range(n_layers):
                    x = F.transformer_layer_nlc(
                        x, p["layers"][i], stride=V3_STRIDES[i]
                    )
                if depth >= 7:
                    x, h, c = F.lstm(x, h, c, p["lstm_w"], p["lstm_b"])
                if depth >= 8:
                    return F.decoder_v3_nlc(x, p["dec_w"], p["dec_b"]), h, c
                return jnp.mean(x, axis=tuple(range(1, x.ndim))), h, c

        def scan_impl(chunks, state):
            def body(st, ct):
                val, hn, cn = fwd(params, ct, st[0], st[1])
                return (hn, cn), val

            fs, vals = lax.scan(body, state, chunks.transpose(1, 0, 2))
            return vals.transpose(1, 0), fs

        return jax.jit(scan_impl)

    audio_long = (
        jax.random.normal(jax.random.key(0), (batch, T_LONG, 1536), jnp.float32)
        * 0.1
    ).block_until_ready()
    audio_short = audio_long[:, :T_SHORT]
    state = silero_v31.init_state(batch)
    names = [
        "stft", "+adaptive_norm", "+layer1", "+layer2", "+layer3", "+layer4",
        "+lstm", "+decoder (full)",
    ]
    scans = []
    for d in range(1, 9):
        s = prefix_scan(d)
        for a in (audio_short, audio_long):
            v, _ = s(a, state)
            np.asarray(v[:, -1])
        scans.append(s)
        print(f"compiled prefix depth {d}", file=sys.stderr, flush=True)

    costs = [float("inf")] * 8
    for _ in range(3):
        for i, s in enumerate(scans):
            t1 = time.perf_counter()
            v, _ = s(audio_short, state)
            np.asarray(v[:, -1])
            ts = time.perf_counter() - t1
            t1 = time.perf_counter()
            v, _ = s(audio_long, state)
            np.asarray(v[:, -1])
            tl = time.perf_counter() - t1
            costs[i] = min(costs[i], (tl - ts) / (T_LONG - T_SHORT))

    print(f"batch {batch}, precision {precision}:")
    prev = 0.0
    for name, c in zip(names, costs):
        print(
            f"{name:16s} cumulative {c*1e6:7.1f} us   stage "
            f"{max(c - prev, 0.0)*1e6:7.1f} us"
        )
        prev = c


if __name__ == "__main__":
    main()
