"""Offline corpus mode: hundreds of audio files -> timestamps, in parallel.

The capability the reference cannot express (its batch axis is chunks of ONE
stream; SURVEY.md §2.9): here every file is an independent stream with its
own LSTM state, batched to fill the MXU and sharded over all available
devices. Audio is scanned on-device in time slabs with state carried in the
scan, and the segmentation FSM runs vectorized on device.

Usage:
    python -m vadc_tpu.cli.batch FILE.s16le [FILE.s16le ...]
        [--model PATH] [--sequence_count N] [--slab_chunks N]
        [--min_silence MS] [--min_speech MS] [--threshold P]
        [--neg_threshold_relative P] [--speech_pad MS] [--stats]
        [--cut_dir DIR]

Output (stdout): `<filename>\t<start>,<end>` per segment. With --cut_dir,
additionally writes one speech-only file per input (corpus-scale silence
removal in the same sharded pass). Inputs are raw mono model-rate s16le
files or .wav at any rate/bits/channels (decoded natively).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vadc-batch", description=__doc__)
    p.add_argument("files", nargs="+", help="raw mono 16 kHz s16le files")
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--sequence_count", type=int, default=1536)
    p.add_argument("--slab_chunks", type=int, default=64,
                   help="chunks per device scan slab (memory/latency knob)")
    p.add_argument("--min_silence", type=float, default=200.0)
    p.add_argument("--min_speech", type=float, default=250.0)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--neg_threshold_relative", type=float, default=0.15)
    p.add_argument("--speech_pad", type=float, default=30.0)
    p.add_argument("--cut_dir", type=str, default=None,
                   help="also WRITE speech-only audio per input file into "
                        "this directory (wav for .wav inputs, raw s16le "
                        "otherwise) — corpus-scale silence removal in the "
                        "same sharded pass")
    p.add_argument("--stats", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="shorthand for --precision fast")
    p.add_argument("--precision", choices=("faithful", "balanced", "fast", "turbo"),
                   default=None,
                   help="matmul tier: faithful = fp32 fidelity contract "
                        "(default); balanced = bf16_3x matmuls (~2e-5 max "
                        "probability deviation); fast = bf16 (~4e-4, "
                        "decision-compatible); turbo = fast + bf16-resident "
                        "encoder (~4e-4). Throughput: docs/PERFORMANCE.md")
    return p


def load_streams(
    paths: list[str], chunk_samples: int, sample_rate: int = 16000
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Load s16le files into a zero-padded [B, T_max, chunk] grid.
    Returns (chunk grid, per-stream valid chunk counts).

    The grid stays int16: the s16 -> f32/32768 conversion runs ON DEVICE
    per slab. Through a remote-device tunnel the host->device copy is the
    corpus bottleneck, and int16 halves the bytes; it also skips a
    whole-corpus float conversion on the host."""
    from vadc_tpu.io.wav import read_file_s16

    # raw s16le or .wav (sniffed by magic; wav decodes/downmixes/resamples
    # natively — the reference needs ffmpeg for any container input)
    audios = [read_file_s16(p, target_rate=sample_rate) for p in paths]
    valid = np.asarray(
        [int(len(a) / chunk_samples) if len(a) % chunk_samples == 0
         else int(len(a) / chunk_samples) + 1 for a in audios],
        np.int64,
    )
    # emission parity with the streaming CLI: a trailing partial chunk is
    # model-processed but not emitted (vadc.c:964 floor semantics)
    emit_valid = np.asarray([len(a) // chunk_samples for a in audios], np.int64)
    t_max = int(valid.max())
    grid = np.zeros((len(audios), t_max, chunk_samples), np.int16)
    for i, a in enumerate(audios):
        n_full = len(a) // chunk_samples
        grid[i, :n_full] = a[: n_full * chunk_samples].reshape(-1, chunk_samples)
        rem = len(a) - n_full * chunk_samples
        if rem:
            grid[i, n_full, :rem] = a[n_full * chunk_samples :]
    return grid, emit_valid, audios


def main(argv: list[str] | None = None) -> int:
    try:
        return _main(argv)
    except (FileNotFoundError, ValueError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    except BrokenPipeError:
        return 0
    except KeyboardInterrupt:
        return 130


def _main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from vadc_tpu.cli.main import resolve_weights_path, clamp_sequence_count
    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.engine.shard import ShardedStreamRunner, make_stream_mesh
    from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter
    from vadc_tpu.models.weights import load_params
    from vadc_tpu.io.pcm import SAMPLE_RATE

    enable_persistent_compilation_cache()
    family, params = load_params(resolve_weights_path(args.model))
    seq = clamp_sequence_count(family, int(args.sequence_count))

    t0 = time.perf_counter()
    # 8 kHz branch families take 8 kHz input (raw files are presumed at
    # the model rate, as on the streaming CLI; wav files resample to it)
    file_sr = 8000 if family.endswith("_8k") else 16000
    grid, valid, audios = load_streams(args.files, seq, sample_rate=file_sr)
    n_files, t_chunks = grid.shape[:2]

    mesh = make_stream_mesh()
    # pad stream count to a device multiple; pad time to a slab multiple
    n_streams = -(-n_files // mesh.size) * mesh.size
    slab = min(args.slab_chunks, t_chunks)
    t_pad = -(-t_chunks // slab) * slab
    grid = np.pad(grid, ((0, n_streams - n_files), (0, t_pad - t_chunks), (0, 0)))

    runner = ShardedStreamRunner(
        family, params, mesh, fast_math=args.fast, precision=args.precision
    )
    state = runner.init_state(n_streams)
    # 8 kHz branch families time chunks at their own rate (inputs are then
    # raw 8 kHz s16le files)
    model_sr = getattr(runner.module, "SAMPLE_RATE", SAMPLE_RATE)
    seg_config = SegmenterConfig.from_ms(
        chunk_samples=seq,
        sample_rate=model_sr,
        min_silence_ms=args.min_silence,
        min_speech_ms=args.min_speech,
        threshold=args.threshold,
        neg_threshold_relative=args.neg_threshold_relative,
        speech_pad_ms=args.speech_pad,
    )
    # device backend: only sparse closed-segment events cross the
    # device->host boundary per slab; materializing the full probability
    # slab for the native host FSM costs seconds per slab through
    # remote-device tunnels (measured 2-4 s vs ~30 ms of events).
    # pending_depth=2 defers each slab's event readback until two more
    # slabs have been dispatched, so the readback sync overlaps with the
    # next slabs' transfer + compute instead of serializing the loop.
    segmenter = BatchSegmenter(
        seg_config, n_streams, backend="device", pending_depth=2,
        # mask each file's zero-padded tail out of the FSM: pad chunks
        # must not confirm closes the scalar segmenter would EOF-snap
        valid_chunks=list(valid) + [0] * (n_streams - n_files),
    )

    # s16 -> f32 on device (reference vadc.c:873-901 does this on the host;
    # here the raw int16 slab is what crosses the host->device link)
    to_f32 = jax.jit(lambda x: x.astype(jnp.float32) * (1.0 / 32768.0))

    # double-buffered host->device pipeline: slab k+1's transfer is
    # dispatched before slab k's scan is consumed, so the link and the chip
    # work concurrently and e2e approaches max(transfer, compute) instead
    # of their sum (the reference's single-thread loop, vadc.c:852-999, is
    # exactly this sum)
    def h2d(off: int):
        return jnp.asarray(grid[:, off : off + slab])

    pending = h2d(0) if t_pad else None
    for off in range(0, t_pad, slab):
        nxt = h2d(off + slab) if off + slab < t_pad else None
        probs, state = runner.scan(to_f32(pending), state)
        segmenter.feed(probs)
        pending = nxt

    segments = segmenter.finish(
        valid_chunks=list(valid) + [0] * (n_streams - n_files)
    )
    for path, segs in zip(args.files, segments):
        for start, end in segs:
            sys.stdout.write(f"{path}\t{start:.2f},{end:.2f}\n")
    sys.stdout.flush()

    if args.cut_dir is not None:
        # corpus-scale silence removal: slice the kept ranges out of the
        # already-loaded samples and write one speech-only file per input
        # (the single-file form is cli/cut.py)
        import os

        from vadc_tpu.cli.segmenter import slice_segments
        from vadc_tpu.io.wav import write_wav

        os.makedirs(args.cut_dir, exist_ok=True)
        written: set[str] = set()
        for path, samples, segs in zip(args.files, audios, segments):
            kept = slice_segments(samples, segs, model_sr)
            name = Path(path).name
            if name in written:  # same basename from different directories
                stem, dot, ext = name.partition(".")
                i = 1
                while f"{stem}_{i}{dot}{ext}" in written:
                    i += 1
                name = f"{stem}_{i}{dot}{ext}"
            written.add(name)
            out = Path(args.cut_dir) / name
            if name.lower().endswith(".wav"):
                write_wav(out, kept, sample_rate=model_sr)
            else:
                out.write_bytes(np.asarray(kept, "<i2").tobytes())

    if args.stats:
        wall = time.perf_counter() - t0
        total_audio = float(valid.sum()) * seq / model_sr
        print(
            f"{n_files} files, {total_audio:.1f} s audio in {wall:.2f} s "
            f"({total_audio / wall:.1f}x realtime)",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
