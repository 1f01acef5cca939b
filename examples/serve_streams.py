"""Realtime multi-stream serving demo.

Treats N s16le files as N live audio streams, advancing all of them in
lockstep one 96 ms chunk per step through a single batched device call —
the serving shape: per-stream LSTM state lives on device across steps, the
segmentation FSM runs in the native C++ kernel on host, and segment events
are printed as they close (stream, start_s, end_s).

    python examples/serve_streams.py a.s16le b.s16le c.s16le [--fast]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+")
    parser.add_argument("--model", default=None)
    parser.add_argument("--fast", action="store_true", help="bf16 fast-math mode")
    parser.add_argument("--chunk", type=int, default=1536)
    args = parser.parse_args()

    import jax.numpy as jnp

    from vadc_tpu import native
    from vadc_tpu.cli.main import resolve_weights_path, clamp_sequence_count
    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.models.weights import load_params
    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    family, params = load_params(resolve_weights_path(args.model))
    chunk = clamp_sequence_count(family, args.chunk)

    # "live" sources: pre-framed files consumed one chunk per step
    frames = [
        native.frame_s16le(np.fromfile(p, dtype=np.int16), chunk) for p in args.files
    ]
    n = len(frames)
    t_max = max(f.shape[0] for f in frames)

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
    t0 = time.perf_counter()
    batch = np.zeros((n, chunk), np.float32)
    for step in range(t_max):
        for i, f in enumerate(frames):
            batch[i] = f[step] if step < f.shape[0] else 0.0
        probs, state = runner.step(jnp.asarray(batch), state)
        for stream, start, end in fsm.feed(np.asarray(probs)[:, None]):
            print(f"{args.files[stream]}\t{start * spc:.2f},{end * spc:.2f}")
    wall = time.perf_counter() - t0
    audio_s = t_max * spc * n
    print(
        f"# {n} streams x {t_max} chunks ({audio_s:.0f} s audio) in {wall:.2f} s"
        f" = {audio_s / wall:.0f}x realtime aggregate",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
