"""Attribute serving RSS growth: leak vs allocator churn vs device plugin.

bench.py's round-5 run showed post-warm RSS growth roughly LINEAR through a
serving run (64 clients: +93 MB warmup, +95 MB post-warm over 20 s; 1024
clients: +302 MB post-warm) — which violated serve_bench's own
`rss_postwarm_ok <= 64 MB` assertion both times. Linear growth is either a
real leak, glibc/numpy allocator retention of per-tick churn, or growth
inside the remote-device plugin (per-transfer bookkeeping).

This experiment separates the three:

  * steady 64-client load, NO churn/faults/checkpoints (isolates the tick
    loop itself);
  * RSS sampled every second -> a slope, not two points;
  * tracemalloc snapshots at warm point and end -> Python-visible growth
    by allocation site (numpy >= 1.22 reports its buffers through
    tracemalloc's domain API, so np churn shows up here);
  * the RSS-minus-tracemalloc residual slope = native-side growth
    (device plugin, ctypes pool, socket buffers).

Usage: python tools/rss_attrib.py [--clients 64] [--seconds 60] [--rtf 4]
"""

from __future__ import annotations

import argparse
import json
import socket
import sys
import threading
import time
import tracemalloc
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from serve_bench import _Client, _cycle_pcm, _rss_mb  # noqa: E402

SR = 16000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--rtf", type=float, default=4.0)
    ap.add_argument("--precision", default="turbo")
    args = ap.parse_args()

    from vadc_tpu import native
    from vadc_tpu.server import VadServer

    if not native.available():
        raise SystemExit("native library unavailable (make -C native)")

    srv = VadServer(port=0, max_streams=args.clients, precision=args.precision)
    sock = socket.create_server(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    srv.pool.start()
    srv.warmup()
    threading.Thread(target=srv._accept_loop, args=(sock,), daemon=True).start()
    threading.Thread(target=srv._engine_loop, daemon=True).start()

    pcm_cycle, _ = _cycle_pcm(srv.chunk)
    cycle_s = len(pcm_cycle) / 2 / SR
    cycles = max(1, int(args.seconds * args.rtf / cycle_s))

    tracemalloc.start(10)
    samples: list[tuple[float, float, int]] = []  # (t, rss_mb, ticks)
    stop = threading.Event()

    def sampler() -> None:
        t0 = time.perf_counter()
        while not stop.is_set():
            samples.append(
                (time.perf_counter() - t0, _rss_mb(), len(srv.tick_times))
            )
            stop.wait(1.0)

    sth = threading.Thread(target=sampler, daemon=True)
    sth.start()

    clients = [
        _Client(port, pcm_cycle * cycles, 1, srv.chunk * 2, args.rtf)
        for _ in range(args.clients)
    ]
    for cl in clients:
        cl.start()
        time.sleep(0.002)

    # warm point: past the connection ramp and the first full cycle
    warm_s = min(args.seconds * 0.4, 20.0)
    time.sleep(warm_s)
    snap_warm = tracemalloc.take_snapshot()
    rss_warm = _rss_mb()
    ticks_warm = len(srv.tick_times)
    t_warm = time.perf_counter()

    for cl in clients:
        cl.join(timeout=600)
    t_end = time.perf_counter()
    snap_end = tracemalloc.take_snapshot()
    rss_end = _rss_mb()
    ticks_end = len(srv.tick_times)
    stop.set()
    sth.join(timeout=5)
    srv._stop.set()
    sock.close()

    postwarm_s = t_end - t_warm
    stats = snap_end.compare_to(snap_warm, "lineno")
    py_growth = sum(s.size_diff for s in stats) / 1e6
    rss_growth = rss_end - rss_warm
    print(f"\npost-warm window: {postwarm_s:.1f} s, "
          f"{ticks_end - ticks_warm} ticks")
    print(f"RSS growth:            {rss_growth:8.1f} MB "
          f"({rss_growth / postwarm_s:6.2f} MB/s)")
    print(f"tracemalloc (Python):  {py_growth:8.1f} MB")
    print(f"native residual:       {rss_growth - py_growth:8.1f} MB")
    print("\ntop Python growth sites:")
    for s in stats[:12]:
        if abs(s.size_diff) > 1e5:
            print(f"  {s.size_diff / 1e6:+8.2f} MB  {s.traceback}")
    print("\nRSS time series (t_s, rss_mb, ticks):")
    print(json.dumps([[round(t, 1), round(r, 1), n] for t, r, n in samples]))
    errors = [cl.error for cl in clients if cl.error]
    print(f"\nclient errors: {len(errors)}{errors[:3]}")


if __name__ == "__main__":
    main()
