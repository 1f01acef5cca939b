"""Benchmark: the full BASELINE.md matrix on one TPU chip.

Configs (BASELINE.json): v3.1 faithful / fast / pallas throughput + step
latency percentiles, single-stream RTF, v4 16k / v4 8k / v5 / v5 8k
throughput, a 512-stream offline batch pass (model + segmentation), and the
serving-tick latency. The headline JSON metric stays the round-1 contract
(concurrent realtime 16 kHz streams per chip, best v3 mode); every other
config rides in the "configs" field.

Measurement notes (see docs/PERFORMANCE.md):
  * Through the remote-device tunnel, block_until_ready returns early; host
    materialization (np.asarray) is the only reliable barrier, and each
    materialization costs a ~25-40 ms round trip. Per-chunk cost is measured
    as a long/short scan difference — (t_long - t_short) / (T_long -
    T_short) — which cancels the fixed tunnel cost exactly.
  * The chip must be under SUSTAINED load when timed: cold or bursty
    timings run 10-40% slow and swing run-to-run (clock ramp), which round
    1/early round 2 misread as both a too-slow headline and a phantom
    layout win. Each config therefore warms with untimed long scans and
    interleaves short/long timed pairs back-to-back, taking the best pair.
  * step() latency percentiles are wall-clock per call and therefore
    RTT-dominated through the tunnel (~30 ms); they are reported as the
    interactive-serving shape anyway, labeled accordingly. On a local chip
    the same calls are ~1 ms.
  * Always check for competing TPU processes before timing; overlapping
    benchmarks swing results 2-10x.
"""

import json
import sys
import time

import numpy as np

T_SHORT, T_LONG = 16, 336
STEP_REPS = 30


def _materialize(x):
    return np.asarray(x)


def _steady_state_once(runner, batch, chunk, key, t_short_len, t_long_len, reps):
    import jax
    import jax.numpy as jnp

    audio_long = jax.jit(
        lambda k: jax.random.normal(k, (batch, t_long_len, chunk), jnp.float32)
        * 0.1
    )(key)
    _materialize(audio_long[0, 0, :2])
    audio_short = audio_long[:, :t_short_len]

    def timed(audio):
        state = runner.init_state(batch)
        t0 = time.perf_counter()
        probs, _ = runner.scan(audio, state)
        _materialize(probs[:, -1])  # small slice: forces the scan, not a bulk copy
        return time.perf_counter() - t0

    # compile both lengths, then warm the chip with an untimed long scan
    for audio in (audio_short, audio_long):
        probs, _ = runner.scan(audio, runner.init_state(batch))
        _materialize(probs[:, -1])
    timed(audio_long)
    diffs = []
    for _ in range(reps):
        t_short = timed(audio_short)
        t_long = timed(audio_long)
        diffs.append((t_long - t_short) / (t_long_len - t_short_len))
    return diffs


def _summarize(diffs):
    """Median + IQR of per-chunk-step timings. The median is the reported
    number (robust to single inflated/deflated reps either way — min-of-
    reps overstated throughput on jittery fast configs, and was also how
    the r2->r3 'regressions' appeared: single-rep luck, not code);
    the IQR separates real movement from tunnel noise."""
    xs = sorted(diffs)
    n = len(xs)
    med = xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])
    q1 = xs[max(0, (n - 1) // 4)]
    q3 = xs[min(n - 1, (3 * (n - 1)) // 4)]
    return {
        "median": max(med, 1e-9),
        "iqr": max(q3 - q1, 0.0),
        "best": max(xs[0], 1e-9),
        "reps": n,
    }


def steady_state_per_chunk(runner, batch, chunk, key, reps=5):
    """Sustained steady-state seconds per chunk-step via interleaved
    long/short scan differences on a warmed chip: median + IQR over >=5
    repeats (VERDICT r3 item 1: single-number reports made regressions and
    noise indistinguishable). Very fast configs are re-measured with
    proportionally longer scans so the difference carries signal over the
    ~ms-level tunnel-RTT jitter. Returns the stats dict from _summarize."""
    import jax

    k1, k2 = jax.random.split(key)
    diffs = _steady_state_once(runner, batch, chunk, k1, T_SHORT, T_LONG, reps)
    stats = _summarize(diffs)
    if stats["median"] * (T_LONG - T_SHORT) < 0.05:  # under 50 ms of signal
        # Bound the longer-scan audio buffer: the generator output and the
        # scan's in-flight copy hold ~2 audio-sized fp32 buffers on a
        # ~15.75G chip, and a 4x scan at batch 1024 x chunk 1536 (v4 fast,
        # fp32 compute) compiles to 7.88G args + 7.88G temp = OOM by 4.5M.
        # Scale the factor to a 6G audio budget and buy the lost signal
        # back with extra base-length reps instead.
        budget = 6 * 2**30
        factor = max(1, min(4, int(budget // (batch * T_LONG * chunk * 4))))
        diffs = _steady_state_once(
            runner,
            batch,
            chunk,
            k2,
            factor * T_SHORT,
            factor * T_LONG,
            max(reps, 5) + (3 if factor < 4 else 0),
        )
        stats = _summarize(diffs)
    return stats


def _load_previous_bench():
    """Latest BENCH_r*.json next to this script (the auto-diff baseline)."""
    import re
    from pathlib import Path

    best = None
    for p in Path(__file__).parent.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json$", p.name)
        if m:
            r = int(m.group(1))
            if best is None or r > best[0]:
                best = (r, p)
    if best is None:
        return None, None
    try:
        data = json.loads(best[1].read_text())
    except (OSError, json.JSONDecodeError):
        return None, None
    # the driver wraps bench stdout as {"n", "cmd", "rc", "tail", "parsed"}
    if "configs" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return best[0], data


# Keys whose round-over-round movement is expected noise, not a perf
# signal: jitter statistics (iqr/best), fault-injection and churn counters
# (run-length-dependent), memory-growth readings. Flagging these >10%
# would permanently pollute the moved list and bury real regressions.
_DIFF_NOISE_MARKERS = (
    "_iqr",
    "_best",
    "fault",
    "rss",
    "_clients",
    "_errors",
    "_aborts",
    "delivery",
    "_saves",  # checkpoint-wave count: run-length-dependent
    "_max_ms",  # single-worst-sample statistic, jitters across rounds
    # real perf signal, but measured on a contended single-core host where
    # writers/reader/engine timeshare — run-to-run spread far exceeds 10%;
    # tools/ingest_bench.py is the deliberate-measurement tool
    "host_ingest",
)


def diff_against_previous(configs, log):
    """Flag any shared signal-valued numeric config that moved >10% vs the
    last round's BENCH_r*.json. The flags ride in the output JSON so a
    regression is visible in the artifact itself, not just the stderr log."""
    prev_round, prev = _load_previous_bench()
    if prev is None:
        return {}
    prev_configs = prev.get("configs", {})
    moved = {}
    for k, v in configs.items():
        pv = prev_configs.get(k)
        if any(m in k for m in _DIFF_NOISE_MARKERS):
            continue
        if (
            isinstance(v, (int, float))
            and isinstance(pv, (int, float))
            and not isinstance(v, bool)
            and not isinstance(pv, bool)
            and pv
        ):
            rel = (v - pv) / abs(pv)
            if abs(rel) > 0.10:
                moved[k] = {"prev": pv, "now": v, "rel": round(rel, 3)}
    if moved:
        log(f"vs BENCH_r{prev_round:02d}: {len(moved)} configs moved >10%:")
        for k, d in sorted(moved.items(), key=lambda kv: -abs(kv[1]["rel"])):
            log(f"  {k}: {d['prev']} -> {d['now']} ({d['rel']:+.0%})")
    else:
        log(f"vs BENCH_r{prev_round:02d}: no config moved >10%")
    return {"baseline_round": prev_round, "moved": moved}


def step_percentiles(runner, batch, chunk, key):
    """Wall-clock per step() call (interactive shape; RTT-dominated through
    the tunnel). Returns (p50_ms, p99_ms)."""
    import jax
    import jax.numpy as jnp

    chunks = jax.jit(
        lambda k: jax.random.normal(k, (batch, chunk), jnp.float32) * 0.1
    )(key)
    _materialize(chunks[0, :2])
    state = runner.init_state(batch)
    probs, state = runner.step(chunks, state)
    _materialize(probs)
    times = []
    for _ in range(STEP_REPS):
        t0 = time.perf_counter()
        probs, state = runner.step(chunks, state)
        _materialize(probs)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2] * 1e3
    p99 = times[min(len(times) - 1, int(len(times) * 0.99))] * 1e3
    return round(p50, 3), round(p99, 3)


def _load_bundled(name):
    from pathlib import Path

    from vadc_tpu.models.weights import load_params

    for base in (
        Path(__file__).parent / "vadc_tpu" / "data",
        Path("/root/reference/testdata"),
    ):
        p = base / name
        if p.exists():
            return load_params(p)
    return None, None


def _probe_device(timeout_s: float = 300.0) -> None:
    """Bounded backend-availability check. Through the remote-device
    tunnel, a dead link makes the FIRST device op hang indefinitely —
    a clean error beats an infinite bench hang at round end."""
    import threading

    err: list[BaseException] = []

    def init():
        try:
            import jax.numpy as jnp
            import numpy as np

            from vadc_tpu.runtime import honor_jax_platforms_env

            honor_jax_platforms_env()  # before the backend latches
            np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        except BaseException as e:  # surfaced below
            err.append(e)

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(
            f"bench: device backend did not initialize within {timeout_s:.0f}s "
            "(remote-device tunnel down?); aborting instead of hanging",
            file=sys.stderr,
            flush=True,
        )
        raise SystemExit(2)
    if err:
        raise err[0]


def main():
    _probe_device()

    import jax
    import jax.numpy as jnp

    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from vadc_tpu.engine.runner import StreamRunner
    from __graft_entry__ import _load_v31_params

    enable_persistent_compilation_cache()
    v31 = _load_v31_params()
    batch = 2048
    chunk_s = 1536 / 16000.0
    keys = iter(jax.random.split(jax.random.key(0), 32))
    configs = {}

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # ---- v3.1: faithful / fast / pallas throughput ----
    results = {}
    probs_by_mode = {}
    for name, kwargs in (
        ("faithful", dict(precision="faithful")),
        ("balanced", dict(precision="balanced")),
        ("fast", dict(precision="fast")),
        ("turbo", dict(precision="turbo")),
        ("pallas", dict(precision="fast", use_pallas=True)),
    ):
        try:
            runner = StreamRunner("v3", v31, precision=kwargs["precision"],
                                  use_pallas=kwargs.get("use_pallas", False))
            # the headline configs get 9 reps (vs 5): the median of 9 pins
            # the round-over-round comparison against cross-session ~+-5%
            # chip/tunnel drift at ~2 s extra per config
            reps = 5 if name == "pallas" else 9
            stats = steady_state_per_chunk(
                runner, batch, 1536, next(keys), reps=reps
            )
            per_chunk = stats["median"]
            streams = batch * chunk_s / per_chunk
            results[name] = streams
            configs[f"v3_{name}_ms_per_chunk_step"] = round(per_chunk * 1e3, 4)
            configs[f"v3_{name}_ms_iqr"] = round(stats["iqr"] * 1e3, 4)
            configs[f"v3_{name}_ms_best"] = round(stats["best"] * 1e3, 4)
            configs[f"v3_{name}_streams_per_chip"] = round(streams, 1)
            # record probabilities for deviation reporting
            audio = jax.jit(
                lambda k: jax.random.normal(k, (256, 8, 1536), jnp.float32) * 0.1
            )(jax.random.key(7))
            p, _ = runner.scan(audio, runner.init_state(256))
            probs_by_mode[name] = np.asarray(p)
            log(f"v3 {name:9s}: {per_chunk*1e3:7.3f} ms/chunk-step "
                f"(IQR {stats['iqr']*1e3:.3f}, best {stats['best']*1e3:.3f}, "
                f"n={stats['reps']}) -> {streams:10.0f} streams at realtime "
                f"(batch {batch}, steady-state)")
        except Exception as e:  # pallas may be unavailable on some toolchains
            log(f"v3 {name}: skipped ({type(e).__name__}: {e})")

    for mode in ("balanced", "fast", "turbo", "pallas"):
        if mode in probs_by_mode:
            dev = float(np.abs(probs_by_mode[mode] - probs_by_mode["faithful"]).max())
            configs[f"v3_{mode}_vs_faithful_max_prob_dev"] = round(dev, 6)
            log(f"v3 {mode}-vs-faithful probability deviation: {dev:.2e}")

    # ---- v3.1 step-latency percentiles (interactive shape) ----
    runner = StreamRunner("v3", v31, fast_math=True)
    p50, p99 = step_percentiles(runner, batch, 1536, next(keys))
    configs["v3_step_p50_ms_incl_tunnel_rtt"] = p50
    configs["v3_step_p99_ms_incl_tunnel_rtt"] = p99
    log(f"v3 step(batch {batch}) wall p50/p99: {p50}/{p99} ms (incl. tunnel RTT)")

    # ---- single-stream RTF ----
    runner1 = StreamRunner("v3", v31)  # faithful: the CLI's default mode
    per_chunk_1 = steady_state_per_chunk(runner1, 8, 1536, next(keys))["median"]
    rtf = chunk_s / per_chunk_1
    configs["v3_single_stream_rtf"] = round(rtf, 1)
    log(f"v3 single-stream RTF (faithful, steady-state): {rtf:.1f}x")

    # ---- other model families (fast + turbo tiers) ----
    # v4 16k runs at batch 1024: its 258-channel concat blows the remote
    # compiler at 2048 on the fp32-resident tiers. (The bf16-resident turbo
    # tier DOES compile at 2048 and measures ~equal per-chip throughput —
    # 784k vs 748-816k streams — so the 1024 point stays for tier
    # comparability.)
    fams = []
    v4_family, v4 = _load_bundled("silero_v4_16k.testtensor")
    if v4 is not None:
        fams.append((v4_family, v4, 1536, 1536 / 16000.0, 1024))
    # v4 8k at 2048 sits within 6 MB of HBM capacity since the fast tier's
    # HIGH-precision STFT keeps fp32 frames (functional._stft_precision);
    # 1024 restores headroom, same per-chip throughput regime as v4 16k.
    v48_family, v48 = _load_bundled("silero_v4_8k.testtensor")
    if v48 is not None:
        fams.append((v48_family, v48, 768, 768 / 8000.0, 1024))
    try:
        # NOTE: must not import tests/* here — tests.conftest switches jax to
        # the CPU backend as an import side effect
        from vadc_tpu.models.synthetic import random_v5_archive, random_v5_8k_archive
        from vadc_tpu.models.silero_v5 import silero_v5_params

        fams.append(
            ("v5", silero_v5_params(random_v5_archive()), 512, 512 / 16000.0, batch)
        )
        fams.append(
            ("v5_8k", silero_v5_params(random_v5_8k_archive()), 256, 256 / 8000.0, batch)
        )
    except Exception as e:
        log(f"v5 synthetic weights unavailable: {e}")
    for family, params, chunk, cs, fam_batch in fams:
        for tier in ("fast", "turbo"):
            try:
                runner = StreamRunner(family, params, precision=tier)
                stats = steady_state_per_chunk(
                    runner, fam_batch, chunk, next(keys)
                )
                per_chunk = stats["median"]
                streams = fam_batch * cs / per_chunk
                configs[f"{family}_{tier}_streams_per_chip"] = round(streams, 1)
                configs[f"{family}_{tier}_ms_per_chunk_step"] = round(
                    per_chunk * 1e3, 4
                )
                configs[f"{family}_{tier}_ms_iqr"] = round(stats["iqr"] * 1e3, 4)
                log(f"{family:6s} {tier:5s}: {per_chunk*1e3:7.3f} ms/chunk-step"
                    f" (IQR {stats['iqr']*1e3:.3f}, n={stats['reps']})"
                    f" -> {streams:10.0f} streams at realtime")
            except Exception as e:
                log(f"{family} {tier}: skipped ({type(e).__name__}: {e})")

    # ---- 512-stream offline batch pass (model + segmentation) ----
    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter

    nb, T = 512, 64
    runner = StreamRunner("v3", v31, fast_math=True)
    audio = jax.jit(
        lambda k: jax.random.normal(k, (nb, T, 1536), jnp.float32) * 0.1
    )(next(keys))
    _materialize(audio[0, 0, :2])
    probs, _ = runner.scan(audio, runner.init_state(nb))  # warmup
    _materialize(probs)
    t0 = time.perf_counter()
    probs, _ = runner.scan(audio, runner.init_state(nb))
    seg = BatchSegmenter(SegmenterConfig(), nb)
    seg.feed(np.asarray(probs))
    seg.finish()
    wall = time.perf_counter() - t0
    audio_seconds = nb * T * chunk_s
    # model + on-device FSM only, audio already device-resident — the
    # end-to-end corpus number (file IO + load + segment + print) is the
    # cli.batch --stats line, ~318x realtime for 512 files in round 1
    configs["offline_512_streams_model_plus_fsm_rt_factor"] = round(
        audio_seconds / wall, 1
    )
    log(f"offline 512-stream pass (model + on-device FSM, device-resident "
        f"audio): {audio_seconds/60:.0f} min audio in {wall:.2f} s = "
        f"{audio_seconds/wall:.0f}x realtime aggregate")

    # ---- sustained multi-client serving (64 sockets, 20 s, churn) ----
    # the reference's stats contract (vadc.c:1037-1081) generalized to N
    # streams; tick/emit latencies measured inside the engine loop, not RTT
    try:
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        from serve_bench import run_serving_bench

        serving = run_serving_bench(
            n_clients=64, seconds=20.0, rtf=4.0, precision="turbo",
            churn=True, checkpoint=True, faults=True,
            # production-shaped cadence: through the remote-device tunnel
            # each save's D2H materialization contends with tick dispatch,
            # so a 2 s cadence (16 saves/run) inflates tick p99 ~2x purely
            # from tunnel contention; 6 s still fires 3 saves per run
            ckpt_period_s=6.0,
        )
        for k in (
            "aggregate_realtime_x",
            "tick_p50_ms",
            "tick_p99_ms",
            "emit_p50_ms",
            "emit_p99_ms",
            "delivery_exact",
            "clients",
            "client_errors",
            "churn_clients",
            "churn_errors",
            "fault_slowloris_errors",
            "fault_slowreader_delivery_exact",
            "delivery_p50_ms",
            "delivery_p99_ms",
            "segments_dropped",
            "fault_midwav_aborts",
            "fault_malformed",
            "fault_malformed_diagnosed",
            "post_fault_delivery_exact",
            "rss_growth_mb",
            "ckpt_saves",
            "ckpt_save_p50_ms",
            "ckpt_save_max_ms",
        ):
            # tick latency includes the device step, which through the
            # remote-device tunnel is RTT-dominated (~30 ms); label it so
            # the number is not misread as on-chip serving latency
            key = f"serving_{k}"
            if k.startswith("tick_"):
                key += "_incl_tunnel_rtt"
            if k in serving:
                configs[key] = serving[k]
        log(
            f"serving: {serving['clients']} clients x {serving['rtf_per_client']}x "
            f"realtime, tick p50/p99 {serving['tick_p50_ms']}/"
            f"{serving['tick_p99_ms']} ms, emit p50 {serving['emit_p50_ms']} ms, "
            f"{serving['aggregate_realtime_x']}x aggregate, "
            f"delivery exact {serving['delivery_exact']}/{serving['clients']}, "
            f"churn {serving['churn_clients']} ({serving['churn_errors']} errors), "
            f"faults: {serving.get('fault_midwav_aborts', 0)} aborts / "
            f"{serving.get('fault_malformed_diagnosed', 0)}/"
            f"{serving.get('fault_malformed', 0)} malformed diagnosed, "
            f"post-fault exact={serving.get('post_fault_delivery_exact')}, "
            f"rss +{serving.get('rss_growth_mb')} MB, "
            f"ckpts {serving.get('ckpt_saves', 0)} @ p50 "
            f"{serving.get('ckpt_save_p50_ms')} ms"
        )
    except Exception as e:
        log(f"serving bench skipped ({type(e).__name__}: {e})")

    # ---- host-ingest ceiling (no device; the serving path's OTHER half) ----
    # max-pace pipes through the native StreamPool + batched FSM; the
    # device headline assumes audio arrives — this measures how many
    # realtime streams THIS host can actually deliver (tools/ingest_bench.py)
    try:
        from ingest_bench import run_ingest

        ing = run_ingest(256, 3.0, with_fsm=True)
        configs["host_ingest_realtime_streams"] = ing["realtime_streams_equiv"]
        configs["host_ingest_mb_per_s"] = ing["mb_per_s_s16"]
        log(
            f"host ingest (256 max-pace pipes, pool+FSM, no device): "
            f"{ing['mb_per_s_s16']} MB/s = {ing['realtime_streams_equiv']:,} "
            f"realtime streams equivalent"
        )
    except Exception as e:
        log(f"host ingest bench skipped ({type(e).__name__}: {e})")

    best_mode, best = max(results.items(), key=lambda kv: kv[1])
    log(f"best: {best_mode} -> {best:.0f} streams/chip")
    vs_prev = diff_against_previous(configs, log)
    print(
        json.dumps(
            {
                "metric": "concurrent_realtime_16kHz_streams_per_chip",
                "value": round(best, 1),
                "unit": "streams",
                "vs_baseline": round(best / 1000.0, 3),
                "best_mode": best_mode,
                "configs": configs,
                "vs_previous_round": vs_prev,
            }
        )
    )


if __name__ == "__main__":
    main()
