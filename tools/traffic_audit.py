"""Per-family HBM traffic accounting: is each step at its fusion-traffic bound?

The round-4 turbo-gap attack (docs/PERFORMANCE.md) closed the v3 "9-11x of
light" question by accounting: the compiled step's fusion outputs must each
be written to and re-read from HBM (XLA materializes at fusion boundaries),
and write+read of just the top intermediates at the calibrated bandwidths
already exceeds the measured step time — i.e. the schedule is at or beyond
100% of the naive traffic bound and the remaining roofline gap is XLA's
fusion granularity, not scheduling slack.

This tool generalizes that audit to EVERY family x tier: compile the step,
sum ALL fusion-output bytes from the HLO, convert to a naive write+read time
at the empirically calibrated single-direction bandwidths, and compare with
the measured sustained step time. `pct_of_traffic_bound` >= ~100% means the
step is HBM-schedule-optimal at its fusion granularity; well under means
scheduling headroom exists and is worth attacking.

Run: python tools/traffic_audit.py [--families v3,v4,...] [--tiers fast,turbo] [--json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

FAM_SPECS = {
    "v3": ("silero_v31_16k.testtensor", 1536, 2048),
    "v4": ("silero_v4_16k.testtensor", 1536, 1024),
    "v4_8k": ("silero_v4_8k.testtensor", 768, 1024),
    "v5": (None, 512, 2048),
    "v5_8k": (None, 256, 2048),
}

_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8}


def fusion_output_bytes(hlo_text: str) -> tuple[int, list[tuple[int, str, str]]]:
    """Sum the output bytes of every fusion in an HLO dump.

    Fusion ROOT shapes are exactly the tensors that cross HBM between
    kernels (plus the program outputs, a small constant set)."""
    sizes = []
    for m in re.finditer(
        r"^\s*%?(fusion[.\w]*|[\w.]+) = (\((?:[^()]|\([^()]*\))*\)|\S+) fusion\(",
        hlo_text,
        re.M,
    ):
        name, shape = m.group(1), m.group(2)
        nbytes = 0
        for tm in re.finditer(r"(bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|s64|pred)\[([\d,]*)\]", shape):
            dt, dims = tm.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        sizes.append((nbytes, name, shape[:100]))
    sizes.sort(reverse=True)
    return sum(b for b, _, _ in sizes), sizes


def load_family(fam: str):
    import bench

    archive, chunk, batch = FAM_SPECS[fam]
    if archive is not None:
        family, params = bench._load_bundled(archive)
    else:
        from vadc_tpu.models.silero_v5 import silero_v5_params
        from vadc_tpu.models.synthetic import (
            random_v5_8k_archive,
            random_v5_archive,
        )

        family = fam
        arch = random_v5_archive() if fam == "v5" else random_v5_8k_archive()
        params = silero_v5_params(arch)
    return family, params, chunk, batch


def audit(fam: str, tier: str, hbm: dict, key) -> dict:
    import jax.numpy as jnp

    import bench
    from vadc_tpu.engine.runner import StreamRunner

    family, params, chunk, batch = load_family(fam)
    runner = StreamRunner(family, params, precision=tier)
    chunks = jnp.zeros((batch, chunk), jnp.float32)
    state = runner.init_state(batch)
    compiled = runner._step.lower(runner.params, chunks, state).compile()
    total_bytes, sizes = fusion_output_bytes(compiled.as_text())
    # naive bound: every fusion output is written once and read once, at the
    # calibrated single-direction rates (copy for the write stream, read for
    # the re-read) — the same arithmetic as the r4 v3 accounting
    bound_s = total_bytes / (hbm["copy_rw"] * 1e9) + total_bytes / (
        hbm["read"] * 1e9
    )
    measured = bench.steady_state_per_chunk(runner, batch, chunk, key)["median"]
    return {
        "family": fam,
        "tier": tier,
        "batch": batch,
        "n_fusions": len(sizes),
        "fusion_output_mb": round(total_bytes / 2**20, 1),
        "traffic_bound_us": round(bound_s * 1e6, 1),
        "measured_us": round(measured * 1e6, 1),
        "pct_of_traffic_bound": round(100 * bound_s / measured, 1),
        "top5_mb": [round(b / 2**20, 2) for b, _, _ in sizes[:5]],
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--families", default="v3,v4,v4_8k,v5,v5_8k")
    ap.add_argument("--tiers", default="turbo")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax

    from roofline import measure_hbm_bandwidth

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    hbm = measure_hbm_bandwidth()
    print(
        f"calibrated HBM GB/s: read {hbm['read']:.0f} copy {hbm['copy_rw']:.0f}",
        file=sys.stderr,
    )
    keys = iter(jax.random.split(jax.random.key(23), 64))
    rows = []
    for fam in args.families.split(","):
        for tier in args.tiers.split(","):
            r = audit(fam.strip(), tier.strip(), hbm, next(keys))
            rows.append(r)
            print(
                f"{r['family']:6s} {r['tier']:6s} b{r['batch']}: "
                f"{r['n_fusions']:4d} fusions, {r['fusion_output_mb']:7.1f} MB/step "
                f"-> bound {r['traffic_bound_us']:7.1f} us vs measured "
                f"{r['measured_us']:7.1f} us  = {r['pct_of_traffic_bound']:5.1f}% "
                f"of traffic bound",
                file=sys.stderr,
            )
    if args.json:
        print(json.dumps({"hbm_gbps": hbm, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
