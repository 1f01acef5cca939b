"""Benchmark: concurrent realtime 16 kHz streams per TPU chip.

Measures the sustained streaming throughput of the flagship Silero v3.1
forward: B independent streams, T consecutive 1536-sample (96 ms) chunks per
stream, executed as ONE jitted lax.scan with LSTM state in the carry — the
exact shape of the serving engine's offline/streaming path. Audio is
generated on-device so the measurement is compute, not host transfer.

streams-at-realtime = B * 0.096 s / per-chunk-step-seconds.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"},
vs_baseline = value / 1000 (BASELINE.md target: >=1000 streams/chip).
"""

import json
import sys
import time

import numpy as np


def bench_scan(batch_sizes=(512, 1024, 2048), scan_steps=100, reps=3):
    import jax
    import jax.numpy as jnp
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from __graft_entry__ import _load_v31_params

    enable_persistent_compilation_cache()
    params = _load_v31_params()
    runner = StreamRunner("v3", params)
    chunk_seconds = 1536 / 16000.0

    results = {}
    for bsz in batch_sizes:
        make_audio = jax.jit(
            lambda key: jax.random.normal(key, (bsz, scan_steps, 1536), jnp.float32)
            * 0.1
        )
        audio = make_audio(jax.random.key(0))
        audio.block_until_ready()
        state = runner.init_state(bsz)

        # NOTE: through remote-device tunnels block_until_ready can return
        # before execution completes; materializing the result to host is the
        # only reliable completion barrier, so the measurement includes one
        # device->host round trip, amortized over scan_steps chunk-steps.
        probs, state = runner.scan(audio, state)  # compile + warmup
        np.asarray(probs)

        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            probs, state = runner.scan(audio, state)
            np.asarray(probs)
            best = min(best, time.perf_counter() - t0)
        per_chunk = best / scan_steps
        streams_rt = bsz * chunk_seconds / per_chunk
        results[bsz] = (streams_rt, per_chunk)
        print(
            f"batch {bsz:5d}: {per_chunk*1e3:8.3f} ms per chunk-step -> "
            f"{streams_rt:10.0f} streams at realtime",
            file=sys.stderr,
        )
    return results


def main():
    results = bench_scan()
    best_bsz, (best_streams, per_chunk) = max(
        results.items(), key=lambda kv: kv[1][0]
    )
    print(
        f"best: batch {best_bsz} -> {best_streams:.0f} streams/chip, "
        f"per-chunk step {per_chunk*1e3:.3f} ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "concurrent_realtime_16kHz_streams_per_chip",
                "value": round(best_streams, 1),
                "unit": "streams",
                "vs_baseline": round(best_streams / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
