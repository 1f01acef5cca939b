"""Serving fault injection: slowloris writers, mid-wav-decode aborts, and
malformed wav headers against a live VadServer — the server must diagnose,
recycle slots, keep serving, and not grow memory (VERDICT r3 item 8).

Runs the serve_bench fault machinery at CI scale (2 steady clients, short
cycles) on the CPU mesh."""

import sys
from pathlib import Path

import pytest

from vadc_tpu import native

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_fault_wave_end_to_end(testdata):
    if not native.available():
        pytest.skip("native library unavailable")
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import serve_bench as sb
    finally:
        sys.path.pop(0)

    r = sb.run_serving_bench(
        n_clients=2,
        seconds=6.0,
        rtf=8.0,
        precision="faithful",
        model=str(testdata / "silero_v31_16k.testtensor"),
        churn=True,
        checkpoint=True,
        faults=True,
    )
    # steady clients unharmed by the fault wave
    assert r["client_errors"] == 0, r
    assert r["delivery_exact"] == r["clients"], r
    # every fault class actually fired
    assert r["fault_midwav_aborts"] >= 1, r
    assert r["fault_malformed"] >= 1, r
    assert r["fault_slowloris_errors"] == 0, r
    # the non-reading client got every line intact once it finally read
    # (outbox absorbed the backpressure; EOF flush delivered the rest)
    assert r["fault_slowreader_delivery_exact"] is True, r
    # malformed wav headers were diagnosed with the one-line error reply
    assert r["fault_malformed_diagnosed"] == r["fault_malformed"], r
    # the server still serves exactly after all fault classes
    assert r["post_fault_delivery_exact"] is True, r
    assert r["checkpoint_under_load"] == "ok", r
    # the checkpoint wave fired and each save's wall time was measured
    assert r["ckpt_saves"] >= 1, r
    assert r["ckpt_save_p50_ms"] > 0, r
    assert r["ckpt_save_max_ms"] >= r["ckpt_save_p50_ms"], r
    # bounded memory across the wave, split warmup vs post-warm (CI scale:
    # generous but finite; a 6 s run may put everything in the warmup bucket)
    assert r["rss_warmup_mb"] < 256, r
    assert r["rss_postwarm_growth_mb"] < 128, r
    # the plugin-leak model is present and the residual (what THIS codebase
    # is accountable for) passes its own assertion — on the CPU backend
    # there is no plugin leak, so the raw growth already bounds the residual
    assert r["rss_postwarm_residual_mb"] <= r["rss_postwarm_growth_mb"], r
    assert r["rss_postwarm_ok"] is True, r
