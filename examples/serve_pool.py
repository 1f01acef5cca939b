"""Live multi-stream serving with the native ingest pool.

Spawns N producer processes writing s16le PCM into pipes (stand-ins for
live network/microphone feeds), drains them GIL-free through the C++
StreamPool, and advances only the READY streams each engine tick in one
batched device step. Segment events print as they close.

    python examples/serve_pool.py a.s16le b.s16le c.s16le
"""

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+")
    parser.add_argument("--model", default=None)
    parser.add_argument("--fast", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from vadc_tpu import native
    from vadc_tpu.cli.main import resolve_weights_path, clamp_sequence_count
    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.models.weights import load_params
    from vadc_tpu.runtime import enable_persistent_compilation_cache

    if not native.available():
        print("native library unavailable (make -C native)", file=sys.stderr)
        return 1

    enable_persistent_compilation_cache()
    family, params = load_params(resolve_weights_path(args.model))
    chunk = clamp_sequence_count(family, 1536)
    n = len(args.files)

    pool = native.StreamPool(n, chunk, ring_chunks=32)
    producers = []
    for i, path in enumerate(args.files):
        r, w = os.pipe()
        pool.add_fd(i, r)
        # producer: cat the file into the pipe (a live feed stand-in)
        producers.append(
            subprocess.Popen(["cat", path], stdout=w, close_fds=True)
        )
        os.close(w)
    pool.start()

    runner = StreamRunner(family, params, fast_math=args.fast)
    state = runner.init_state(n)
    cfg = SegmenterConfig.from_ms(chunk_samples=chunk)
    fsm = native.NativeFsm(
        n,
        threshold=cfg.threshold,
        neg_threshold=cfg.neg_threshold,
        min_silence_chunks=cfg.min_silence_chunks,
        min_speech_chunks=cfg.min_speech_chunks,
    )
    spc = cfg.seconds_per_chunk
    chunk_counts = np.zeros(n, np.int64)

    t0 = time.perf_counter()
    # One jitted tick: device step + masked state merge (idle streams keep
    # their previous LSTM state, so stalled streams neither drift nor
    # mis-time). One compiled program per tick — per-op eager dispatch
    # through a remote-device tunnel would cost one RTT per op.
    import jax

    from vadc_tpu.engine.runner import StreamState, _step as engine_step

    @jax.jit
    def tick(params, batch, state, mask):
        # the pool gathers RAW s16 (half the host->device bytes); /32768 on
        # device is bit-identical to host conversion (power-of-two scale)
        batch = batch.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        probs, new_state = engine_step(runner.module, family, params, batch, state)
        m3 = mask[None, :, None]
        merged = StreamState(
            jnp.where(m3, new_state.h, state.h),
            jnp.where(m3, new_state.c, state.c),
            None
            if state.context is None
            else jnp.where(mask[:, None], new_state.context, state.context),
        )
        return probs, merged

    while True:
        batch, ready, count, _ = pool.gather()
        if count == 0:
            if all(pool.stream_done(i) for i in range(n)):
                break
            time.sleep(0.002)
            continue
        mask = ready > 0
        probs, state = tick(runner.params, jnp.asarray(batch), state, jnp.asarray(mask))
        for stream, start, end in fsm.feed(np.asarray(probs)[:, None], active=mask):
            print(f"{args.files[stream]}\t{start * spc:.2f},{end * spc:.2f}")
        chunk_counts += mask
    wall = time.perf_counter() - t0
    total_audio = float(chunk_counts.sum()) * spc
    print(
        f"# {n} live streams, {total_audio:.0f} s audio in {wall:.2f} s "
        f"({total_audio / wall:.1f}x realtime aggregate; step-wise serving is\n"
        f"# round-trip-bound through a remote-device tunnel)",
        file=sys.stderr,
    )
    for proc in producers:
        proc.wait()
    pool.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
