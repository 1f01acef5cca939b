"""Unit tests for bench.py's pure statistics/diff logic.

The bench harness is the round's headline artifact; its median+IQR
summarization and round-over-round auto-diff (VERDICT r3 item 1) are pure
functions, tested here without touching a device. bench.py imports jax
lazily inside the measurement functions, so importing the module is cheap.
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_BENCH_PATH = Path(__file__).resolve().parent.parent / "bench.py"


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("bench_under_test", None)


class TestSummarize:
    def test_odd_count_median(self, bench):
        stats = bench._summarize([3.0, 1.0, 2.0, 5.0, 4.0])
        assert stats["median"] == 3.0
        assert stats["best"] == 1.0
        assert stats["reps"] == 5
        # n=5: q1 = xs[1] = 2, q3 = xs[3] = 4
        assert stats["iqr"] == 2.0

    def test_even_count_median_interpolates(self, bench):
        stats = bench._summarize([1.0, 2.0, 3.0, 4.0])
        assert stats["median"] == 2.5

    def test_single_outlier_does_not_move_median(self, bench):
        # the r2->r3 "regression" mechanism: one lucky rep moves a min by
        # 35% while the median sits still
        base = [1.0] * 8
        assert bench._summarize(base + [0.65])["median"] == 1.0
        assert bench._summarize(base + [1.35])["median"] == 1.0

    def test_floors_at_positive(self, bench):
        stats = bench._summarize([0.0, -1e-6, 0.0])
        assert stats["median"] >= 1e-9
        assert stats["best"] >= 1e-9
        assert stats["iqr"] >= 0.0


class TestDiffAgainstPrevious:
    def _write_prev(self, tmp_path, bench, monkeypatch, payload, name="BENCH_r03.json"):
        (tmp_path / name).write_text(json.dumps(payload))
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))

    def test_no_previous_round(self, bench, tmp_path, monkeypatch):
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
        assert bench.diff_against_previous({"a": 1.0}, lambda s: None) == {}

    def test_flags_only_moves_over_10pct(self, bench, tmp_path, monkeypatch):
        self._write_prev(
            tmp_path,
            bench,
            monkeypatch,
            {"configs": {"up": 1.0, "down": 1.0, "steady": 1.0, "zero": 0.0}},
        )
        out = bench.diff_against_previous(
            {"up": 1.2, "down": 0.85, "steady": 1.05, "zero": 5.0, "new": 9.9},
            lambda s: None,
        )
        assert out["baseline_round"] == 3
        assert set(out["moved"]) == {"up", "down"}
        assert out["moved"]["up"]["rel"] == 0.2
        assert out["moved"]["down"]["prev"] == 1.0

    def test_ignores_bools_and_non_numeric(self, bench, tmp_path, monkeypatch):
        self._write_prev(
            tmp_path,
            bench,
            monkeypatch,
            {"configs": {"flag": True, "label": "turbo", "x": 1.0}},
        )
        out = bench.diff_against_previous(
            {"flag": False, "label": "fast", "x": 1.01}, lambda s: None
        )
        assert out["moved"] == {}

    def test_picks_latest_round_and_unwraps_driver_format(
        self, bench, tmp_path, monkeypatch
    ):
        # the driver wraps bench stdout as {"parsed": {...}}
        self._write_prev(
            tmp_path, bench, monkeypatch, {"configs": {"x": 1.0}}, "BENCH_r02.json"
        )
        (tmp_path / "BENCH_r03.json").write_text(
            json.dumps({"parsed": {"configs": {"x": 2.0}}})
        )
        out = bench.diff_against_previous({"x": 2.05}, lambda s: None)
        assert out["baseline_round"] == 3
        assert out["moved"] == {}

    def test_noise_valued_keys_are_never_flagged(self, bench, tmp_path, monkeypatch):
        # jitter statistics and run-length-dependent counters move >10%
        # between healthy rounds; flagging them would bury real regressions
        noisy = {
            "v3_turbo_ms_iqr": 1.0,
            "v3_turbo_ms_best": 1.0,
            "serving_fault_midwav_aborts": 50.0,
            "serving_rss_growth_mb": 3.0,
            "serving_clients": 64.0,
            "serving_churn_errors": 1.0,
            "serving_fault_malformed_diagnosed": 54.0,
            "serving_delivery_exact": 1.0,
            "serving_ckpt_saves": 8.0,
            "serving_ckpt_save_max_ms": 120.0,
        }
        self._write_prev(
            tmp_path,
            bench,
            monkeypatch,
            {"configs": dict(noisy, v3_turbo_ms_per_chunk_step=0.5)},
        )
        out = bench.diff_against_previous(
            dict({k: v * 2 for k, v in noisy.items()},
                 v3_turbo_ms_per_chunk_step=0.7),
            lambda s: None,
        )
        assert set(out["moved"]) == {"v3_turbo_ms_per_chunk_step"}

    def test_malformed_previous_is_skipped(self, bench, tmp_path, monkeypatch):
        (tmp_path / "BENCH_r03.json").write_text("{not json")
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
        assert bench.diff_against_previous({"a": 1.0}, lambda s: None) == {}

    def test_truncated_tail_is_salvaged(self, bench, tmp_path, monkeypatch):
        # BENCH_r04.json's real failure mode: parsed=null, tail starts
        # mid-JSON. Flat pairs and "moved" entries' "now" values are both
        # genuine that-round numbers and must be recovered.
        tail = (
            '1, "v5_fast_ms_per_chunk_step": 0.0594, "flagged": true, '
            '"vs_previous_round": {"baseline_round": 3, "moved": '
            '{"v3_pallas_ms_per_chunk_step": {"prev": 1.871, "now": 5.7689, '
            '"rel": 2.083}}}}'
        )
        (tmp_path / "BENCH_r04.json").write_text(
            json.dumps({"n": 4, "rc": 0, "tail": tail, "parsed": None})
        )
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
        out = bench.diff_against_previous(
            {"v5_fast_ms_per_chunk_step": 0.08, "v3_pallas_ms_per_chunk_step": 1.9},
            lambda s: None,
        )
        assert out["moved"]["v5_fast_ms_per_chunk_step"]["prev"] == 0.0594
        assert out["moved"]["v3_pallas_ms_per_chunk_step"]["prev"] == 5.7689
        assert "salvage" in out["baseline_source"]

    def test_known_causes_annotate_within_envelope_only(
        self, bench, tmp_path, monkeypatch
    ):
        """Moves matching a documented variance pattern carry its cause in
        the artifact; a move EXCEEDING the pattern's envelope stays
        unannotated so a real regression can't hide behind the label."""
        self._write_prev(
            tmp_path,
            bench,
            monkeypatch,
            {"configs": {
                "v5_8k_turbo_ms_per_chunk_step": 0.024,
                "v5_fast_ms_per_chunk_step": 0.06,
                "serving_tick_p50_ms_incl_tunnel_rtt": 30.0,
                "some_new_subsystem_ms": 1.0,
            }},
        )
        out = bench.diff_against_previous(
            {
                "v5_8k_turbo_ms_per_chunk_step": 0.036,  # +50%: in envelope
                "v5_fast_ms_per_chunk_step": 0.12,  # +100%: outside envelope
                "serving_tick_p50_ms_incl_tunnel_rtt": 36.0,  # +20%
                "some_new_subsystem_ms": 1.5,  # no documented pattern
            },
            lambda s: None,
        )
        m = out["moved"]
        assert "bistable" in m["v5_8k_turbo_ms_per_chunk_step"]["known_cause"]
        assert "known_cause" not in m["v5_fast_ms_per_chunk_step"]
        assert "known_cause" in m["serving_tick_p50_ms_incl_tunnel_rtt"]
        assert "known_cause" not in m["some_new_subsystem_ms"]

    def test_compact_artifact_falls_back_to_bench_full(
        self, bench, tmp_path, monkeypatch
    ):
        # round 5+ prints a compact headline line (no "configs"); the full
        # record lives in BENCH_full.json written by the same run
        (tmp_path / "BENCH_r05.json").write_text(
            json.dumps({"parsed": {"metric": "m", "value": 1.0}})
        )
        (tmp_path / "BENCH_full.json").write_text(
            json.dumps({"configs": {"x": 1.0}, "run_label": "2026-08-19T12:00:00"})
        )
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
        out = bench.diff_against_previous({"x": 1.5}, lambda s: None)
        assert out["moved"]["x"]["prev"] == 1.0
        assert "BENCH_full.json" in out["baseline_source"]
