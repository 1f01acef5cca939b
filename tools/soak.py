"""Long-stream soak: hours of audio through the CLI's window loop with a
memory-growth bound — the production claim behind "unbounded audio length"
(reference: one 32 MB arena for an entire run, vadc.c:1131-1143; here the
equivalent claim is constant host RSS + device state of fixed shape).

Streams synthetic audio window-by-window through MinibatchRunner +
Segmenter exactly like cli/main.py's loop (no subprocess), and reports
throughput plus RSS at warmup vs end. Exits nonzero if RSS grew more than
--max_growth_mb after warmup.

Intended for the chip (single stream runs ~2700x realtime there; a CPU
run of the same minutes is ~1x). Usage:

    python tools/soak.py --minutes 60 [--precision fast] [--batch 96]
    JAX_PLATFORMS=cpu python tools/soak.py --minutes 1   # host smoke
"""

from __future__ import annotations

import argparse
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--minutes", type=float, default=60.0)
    p.add_argument("--precision", default="fast",
                   choices=("faithful", "balanced", "fast", "turbo"))
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--sequence_count", type=int, default=1536)
    p.add_argument("--model", default=None)
    p.add_argument("--max_growth_mb", type=float, default=64.0,
                   help="fail if RSS grows more than this after warmup")
    p.add_argument("--warmup_windows", type=int, default=5)
    args = p.parse_args()

    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from vadc_tpu.cli.main import (
        WINDOW_CHUNKS,
        clamp_sequence_count,
        resolve_weights_path,
    )
    from vadc_tpu.cli.segmenter import Segmenter, SegmenterConfig
    from vadc_tpu.engine.runner import MinibatchRunner
    from vadc_tpu.models.weights import load_params

    family, params = load_params(resolve_weights_path(args.model))
    seq = clamp_sequence_count(family, args.sequence_count)
    runner = MinibatchRunner(
        family, params, batch_size=args.batch, chunk_samples=seq,
        precision=args.precision,
    )
    model_sr = getattr(runner.module, "SAMPLE_RATE", 16000)
    seg = Segmenter(
        SegmenterConfig.from_ms(chunk_samples=seq, sample_rate=model_sr)
    )
    window = seq * WINDOW_CHUNKS
    total_windows = max(
        int(args.minutes * 60 * model_sr / window) + 1,
        args.warmup_windows + 2,
    )

    def rss_mb() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    from vadc_tpu.io.synthaudio import voiced

    rng = np.random.default_rng(0)
    # alternating noise/speech windows so the FSM opens and closes
    # segments continuously (exercises the emit path, not just the model)
    speech = voiced(window / model_sr, sr=model_sr)[:window].astype(
        np.float32
    )
    n_seg = 0
    rss_warm = None
    t0 = time.perf_counter()
    for w in range(total_windows):
        if w % 3 == 2:
            x = speech
        else:
            x = (0.02 * rng.normal(size=window)).astype(np.float32)
        probs = runner.process_window(x)
        for prob in probs:
            n_seg += sum(1 for _ in seg.feed(prob))
        if w + 1 == args.warmup_windows:
            rss_warm = rss_mb()
    dt = time.perf_counter() - t0
    audio_s = total_windows * window / model_sr
    rss_end = rss_mb()
    growth = rss_end - (rss_warm or rss_end)
    print(
        f"soak: {audio_s / 60:.1f} min audio in {dt:.1f} s "
        f"({audio_s / dt:.1f}x realtime, single stream), "
        f"{n_seg} segments, RSS {rss_warm:.0f} -> {rss_end:.0f} MB "
        f"(growth {growth:.1f} MB after warmup)",
        file=sys.stderr,
    )
    if growth > args.max_growth_mb:
        print(
            f"FAIL: RSS grew {growth:.1f} MB > {args.max_growth_mb} MB",
            file=sys.stderr,
        )
        return 1
    print("SOAK PASSED", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
