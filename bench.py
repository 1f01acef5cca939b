"""Benchmark: concurrent realtime 16 kHz streams per TPU chip.

Measures sustained streaming throughput of the flagship Silero v3.1 forward:
B independent streams x T consecutive 1536-sample (96 ms) chunks, executed
as ONE jitted lax.scan with LSTM state in the carry — the serving engine's
exact execution shape. Audio is generated on-device; completion is forced by
host materialization (through remote-device tunnels block_until_ready can
return early, so np.asarray is the only reliable barrier — the measurement
therefore includes one device->host round trip amortized over T steps).

Two modes are measured:
  * faithful — full-fp32 matmuls (the golden-fidelity contract)
  * fast     — bf16 matmuls with fp32 accumulation; probability deviation
               vs faithful is measured and printed (typically ~5e-3)

The JSON line reports the best mode. vs_baseline = value / 1000 (BASELINE.md
target: >= 1000 streams/chip).
"""

import json
import sys
import time

import numpy as np


def bench_mode(fast: bool, batch: int, scan_steps: int, reps: int, audio, params):
    import jax.numpy as jnp
    from vadc_tpu.engine.runner import StreamRunner

    runner = StreamRunner("v3", params, fast_math=fast)
    state = runner.init_state(batch)
    probs, state = runner.scan(audio, state)  # compile + warmup
    np.asarray(probs)

    best = float("inf")
    last_probs = None
    for _ in range(reps):
        state = runner.init_state(batch)
        t0 = time.perf_counter()
        probs, state = runner.scan(audio, state)
        last_probs = np.asarray(probs)
        best = min(best, time.perf_counter() - t0)
    return best / scan_steps, last_probs


def main():
    import jax
    import jax.numpy as jnp

    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from __graft_entry__ import _load_v31_params

    enable_persistent_compilation_cache()
    params = _load_v31_params()
    batch, scan_steps, reps = 2048, 100, 3
    chunk_seconds = 1536 / 16000.0

    audio = jax.jit(
        lambda key: jax.random.normal(key, (batch, scan_steps, 1536), jnp.float32) * 0.1
    )(jax.random.key(0))
    np.asarray(audio[0, 0, :2])

    results = {}
    probs_by_mode = {}
    for fast in (False, True):
        per_chunk, probs = bench_mode(fast, batch, scan_steps, reps, audio, params)
        streams_rt = batch * chunk_seconds / per_chunk
        name = "fast" if fast else "faithful"
        results[name] = streams_rt
        probs_by_mode[name] = probs
        print(
            f"{name:9s}: {per_chunk*1e3:7.3f} ms/chunk-step -> "
            f"{streams_rt:10.0f} streams at realtime (batch {batch})",
            file=sys.stderr,
        )
    dev = float(np.abs(probs_by_mode["fast"] - probs_by_mode["faithful"]).max())
    print(f"fast-vs-faithful probability deviation: {dev:.2e}", file=sys.stderr)

    best_mode, best = max(results.items(), key=lambda kv: kv[1])
    print(f"best: {best_mode} -> {best:.0f} streams/chip", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "concurrent_realtime_16kHz_streams_per_chip",
                "value": round(best, 1),
                "unit": "streams",
                "vs_baseline": round(best / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
