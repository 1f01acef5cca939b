"""Benchmark: concurrent realtime 16 kHz streams per TPU chip.

Runs the flagship Silero v3.1 forward over a batch of B independent streams,
one 1536-sample (96 ms) chunk per stream per step, state device-resident.
streams-at-realtime = B * 0.096 / step_seconds. Sweeps B and reports the best.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1000 (the BASELINE.md target of >=1000 streams/chip).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np


def bench_streams_per_chip(batch_sizes=(256, 512, 1024, 2048), steps=20):
    import jax
    import jax.numpy as jnp
    from vadc_tpu.models import silero_v31
    from __graft_entry__ import _load_v31_params

    params = _load_v31_params()
    fwd = jax.jit(silero_v31.forward, donate_argnums=(2, 3))

    chunk_seconds = 1536 / 16000.0
    results = {}
    for bsz in batch_sizes:
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.normal(size=(bsz, 1536)).astype(np.float32) * 0.1)
        h, c = silero_v31.init_state(bsz)
        # warmup / compile
        probs, h, c = fwd(params, audio, h, c)
        probs.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(steps):
            probs, h, c = fwd(params, audio, h, c)
        probs.block_until_ready()
        dt = (time.perf_counter() - t0) / steps
        streams_rt = bsz * chunk_seconds / dt
        results[bsz] = (streams_rt, dt)
        print(
            f"batch {bsz:5d}: {dt*1e3:8.3f} ms/step -> "
            f"{streams_rt:10.0f} streams at realtime "
            f"(per-chunk latency {dt*1e3:.3f} ms)",
            file=sys.stderr,
        )
    return results


def main():
    results = bench_streams_per_chip()
    best_bsz, (best_streams, best_dt) = max(
        results.items(), key=lambda kv: kv[1][0]
    )
    print(
        f"best: batch {best_bsz} -> {best_streams:.0f} streams/chip, "
        f"p50 chunk latency {best_dt*1e3:.3f} ms",
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
