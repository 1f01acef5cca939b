"""One-command validation harness for a real Silero v5 .onnx file.

No official v5 weights exist in this build environment, so v5 correctness
rests on a random-weight oracle (README caveat). The day a real
`silero_vad_v5.onnx` appears, this tool closes that caveat in one command:

    python tools/validate_v5.py /path/to/silero_vad_v5.onnx

It runs, for BOTH sample-rate branches (16 kHz and 8 kHz):
  1. marker-based classification (must say v5 — onnx_helpers.c:154-161);
  2. weight extraction into the runtime archive schema;
  3. the numpy ONNX graph executor on random audio with LSTM state threaded
     across consecutive chunks (the role ORT plays for the reference,
     onnx_helpers.c:532-549);
  4. the JAX forward on the same audio/state;
and prints a per-chunk probability fidelity report with the reference
harness's error-magnitude buckets (test.c:70-130). Exit code 0 iff every
probability matches within --atol (default 1e-5).

CI exercises this harness end-to-end against an executable synthetic
official-topology v5 model (tests/test_tools.py), so it is known-working
before real weights ever arrive.
"""

from __future__ import annotations

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


def validate(path: Path, atol: float, chunks: int = 4, batch: int = 3) -> bool:
    import jax.numpy as jnp

    from vadc_tpu.export.onnx_exec import run_silero_onnx
    from vadc_tpu.export.onnx_extract import classify_model
    from vadc_tpu.export.silero_v5_from_onnx import extract_silero_v5
    from vadc_tpu.models import silero_v5
    from vadc_tpu.models.weights import load_params_from_tensors

    family = classify_model(path)
    print(f"classified: {family}")
    if family != "v5":
        print(f"FAIL: expected a v5 graph, got {family}", file=sys.stderr)
        return False

    ok = True
    from vadc_tpu.export.onnx_exec import OnnxExecutor

    executor = OnnxExecutor.from_path(path)  # parse the protobuf once
    for sr in (16000, 8000):
        fam, params = load_params_from_tensors(extract_silero_v5(path, sr))
        mod = silero_v5 if sr == 16000 else silero_v5.v5_8k
        window = mod.WINDOW_SAMPLES + mod.CONTEXT_SAMPLES
        rng = np.random.default_rng(42)
        h = np.zeros((1, batch, 128), np.float32)
        c = np.zeros((1, batch, 128), np.float32)
        hj, cj = jnp.asarray(h), jnp.asarray(c)
        print(f"-- {sr} Hz branch (family {fam}, {chunks} chunks x batch {batch})")
        for step in range(chunks):
            audio = (0.2 * rng.normal(size=(batch, window))).astype(np.float32)
            out, h, c = run_silero_onnx(
                path, audio, state=(h, c), sample_rate=sr, executor=executor
            )
            p, hj, cj = mod.forward(params, jnp.asarray(audio), hj, cj)
            err = float(np.max(np.abs(np.asarray(p).ravel() - out.ravel())))
            status = "ok" if err <= atol else "FAIL"
            print(f"  chunk {step}: max prob error {err:.3e}  [{bucket(err)}]  {status}")
            ok &= err <= atol
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", type=Path, help="path to silero_vad_v5.onnx")
    ap.add_argument("--atol", type=float, default=1e-5)
    ap.add_argument("--chunks", type=int, default=4)
    args = ap.parse_args(argv)

    import jax

    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if not args.model.exists():
        print(f"Error: {args.model} not found", file=sys.stderr)
        return 1
    ok = validate(args.model, args.atol, chunks=args.chunks)
    print("V5 VALIDATION " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
