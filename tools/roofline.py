"""Roofline: how far each family/tier step runs from the chip's speed of light.

Method (all numbers measured on the attached chip, nothing from spec sheets):

  1. Calibrate the roofline's two ceilings empirically —
       * achievable HBM bandwidth: sustained 256 MB read (reduce) and
         read+write (scaled copy) passes;
       * achievable MXU rate per precision tier: sustained large matmuls at
         the tier's `lax.Precision` / dtype.
     Using measured ceilings (not datasheet peaks) keeps the ratios honest:
     nothing on this chip will beat what the calibration kernels achieve.
     (Measured here: bf16 ~185 TFLOP/s ~= 94% of the v5e datasheet peak, so
     the calibration itself is near light.)
  2. Per family x tier: XLA's own cost analysis of the jitted per-chunk step
     gives the step's logical FLOPs; the step's unavoidable HBM traffic is
     bounded below by |arguments| + |results| (audio chunk in, weights read
     once, recurrent state in/out, probabilities out) — everything else
     could in principle stay on chip.
  3. Speed of light per step = max(flops / mxu_rate, min_traffic / hbm_bw).
     The printed ratio is measured_time / SoL: 1.0 means the step is at the
     hardware limit; the gap is the (measured) cost of intermediate HBM
     round-trips, lane padding at channel widths 16-258, and per-op
     overhead that fusion cannot remove at these shapes.

All timings use the bench.py long/short scan-difference methodology: the
~30 ms tunnel RTT per device call is a FIXED cost that single-call timing
cannot separate — naive short probes here read 4-8x slow.

The reference has no analogue (it publishes no performance numbers at all,
SURVEY.md §6); this is the TPU build's accounting of "how much faster could
this possibly get on the same chip".

Run: python tools/roofline.py [--families v3,v4,...] [--json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _materialize(x):
    return np.asarray(x)


def _per_step(make_run, args, s_short: int, s_long: int, reps: int = 5) -> float:
    """Sustained seconds per scan step via interleaved long/short scan
    differences (the bench.py methodology)."""
    run_short, run_long = make_run(s_short), make_run(s_long)
    for run in (run_short, run_long):
        _materialize(run(*args)[:2])
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _materialize(run_short(*args)[:2])
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        _materialize(run_long(*args)[:2])
        diffs.append((time.perf_counter() - t0 - t_short) / (s_long - s_short))
    return float(np.median(diffs))


def measure_hbm_bandwidth() -> dict:
    """Achievable HBM GB/s: read-only (reduce) and read+write (scaled copy)
    over a 256 MB array, scan-chained with a carry dependence so XLA cannot
    hoist the array read out of the loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 64 * 1024 * 1024  # 256 MB fp32
    x = jnp.ones((n,), jnp.float32)

    def make_read(steps):
        @jax.jit
        def run(x):
            def body(c, _):
                # x + c*1e-30 depends on the carry -> re-read every step
                return jnp.sum(x + c * 1e-30) * 1e-9, ()

            c, _ = lax.scan(body, jnp.float32(0), None, length=steps)
            return jnp.full((2,), c)

        return run

    def make_copy(steps):
        @jax.jit
        def run(x):
            def body(c, _):
                return c * 1.000001, ()

            c, _ = lax.scan(body, x, None, length=steps)
            return c[:2]  # small slice out (a trailing reshape padded 64x and OOMed)

        return run

    read = x.nbytes / _per_step(make_read, (x,), 20, 100) / 1e9
    copy = 2 * x.nbytes / _per_step(make_copy, (x,), 20, 100) / 1e9
    return {"read": read, "copy_rw": copy, "best": max(read, copy)}


def measure_mxu_rate(tier: str) -> float:
    """Achievable TFLOP/s at a precision tier: sustained large matmuls.

    The right operand is an identity matrix so the chain c <- c @ I is
    numerically stable with no elementwise work in the loop (XLA does not
    simplify a dot against a runtime identity matrix); MXU FLOPs are
    shape-based regardless of operand values. 8192x2048x2048 measures
    within noise of 8192^3 here and compiles much faster."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vadc_tpu.nn import functional as F

    prec, dtype = F.PRECISION_MODES[tier]
    m, k = 8192, 2048
    a = (jax.random.normal(jax.random.key(0), (m, k), jnp.float32) * 0.01).astype(
        dtype
    )
    b = jnp.eye(k, dtype=dtype)

    def make_run(steps):
        @jax.jit
        def run(a, b):
            def body(c, _):
                y = jnp.dot(
                    c, b, precision=prec, preferred_element_type=jnp.float32
                )
                return y.astype(dtype), ()

            c, _ = lax.scan(body, a, None, length=steps)
            return c[0]

        return run

    per = _per_step(make_run, (a, b), 20, 100)
    return 2 * m * k * k / per / 1e12


def _tree_bytes(tree) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(tree) if hasattr(x, "nbytes"))


def step_cost(runner, batch: int, chunk: int):
    """(flops, min_hbm_bytes) of one jitted chunk step via XLA cost analysis."""
    import jax.numpy as jnp

    chunks = jnp.zeros((batch, chunk), jnp.float32)
    state = runner.init_state(batch)
    lowered = runner._step.lower(runner.params, chunks, state)
    ca = lowered.compile().cost_analysis()
    flops = float(ca.get("flops", 0.0))
    # Unavoidable traffic: audio in + params in + state in/out + probs out.
    state_b = _tree_bytes(state)
    min_bytes = chunks.nbytes + _tree_bytes(runner.params) + 2 * state_b + batch * 4
    return flops, min_bytes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--families",
        default="v3,v4,v4_8k,v5,v5_8k",
        help="comma list from v3,v4,v4_8k,v5,v5_8k",
    )
    ap.add_argument("--json", action="store_true", help="emit one JSON line")
    args = ap.parse_args(argv)

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import bench
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    hbm_all = measure_hbm_bandwidth()
    hbm = hbm_all["best"]
    print(
        f"calibrated HBM bandwidth: read {hbm_all['read']:.0f}, copy "
        f"{hbm_all['copy_rw']:.0f} GB/s -> ceiling {hbm:.0f}",
        file=sys.stderr,
    )
    tiers = ("faithful", "balanced", "fast", "turbo")
    mxu = {}
    for tier in tiers:
        mxu[tier] = measure_mxu_rate(tier)
        print(
            f"calibrated MXU rate [{tier:8s}]: {mxu[tier]:7.1f} TFLOP/s",
            file=sys.stderr,
        )

    # family -> (bundled archive or synthetic, chunk, batch)
    fam_specs = {
        "v3": ("silero_v31_16k.testtensor", 1536, 2048),
        "v4": ("silero_v4_16k.testtensor", 1536, 1024),
        "v4_8k": ("silero_v4_8k.testtensor", 768, 1024),
        "v5": (None, 512, 2048),
        "v5_8k": (None, 256, 2048),
    }
    keys = iter(jax.random.split(jax.random.key(17), 64))
    rows = []
    for fam in args.families.split(","):
        fam = fam.strip()
        archive, chunk, batch = fam_specs[fam]
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
        fam_tiers = tiers if fam == "v3" else ("fast", "turbo")
        for tier in fam_tiers:
            runner = StreamRunner(family, params, precision=tier)
            flops, min_bytes = step_cost(runner, batch, chunk)
            per = bench.steady_state_per_chunk(runner, batch, chunk, next(keys))[
                "median"
            ]
            sol_c = flops / (mxu[tier] * 1e12)
            sol_m = min_bytes / (hbm * 1e9)
            sol = max(sol_c, sol_m)
            bound = "compute" if sol_c >= sol_m else "memory"
            rows.append(
                {
                    "family": fam,
                    "tier": tier,
                    "batch": batch,
                    "step_gflops": round(flops / 1e9, 3),
                    "min_traffic_mb": round(min_bytes / 1e6, 1),
                    "measured_us": round(per * 1e6, 1),
                    "sol_us": round(sol * 1e6, 1),
                    "sol_bound": bound,
                    "x_of_sol": round(per / sol, 2),
                    "achieved_tflops": round(flops / per / 1e12, 1),
                    "pct_of_mxu": round(100 * flops / per / 1e12 / mxu[tier], 1),
                }
            )
            r = rows[-1]
            print(
                f"{fam:6s} {tier:8s} b{batch}: {r['measured_us']:8.1f} us/step"
                f"  SoL {r['sol_us']:7.1f} us ({bound}-bound)"
                f"  => {r['x_of_sol']:5.2f}x of light"
                f"  [{r['achieved_tflops']:5.1f} TF/s = {r['pct_of_mxu']:4.1f}%"
                f" of tier MXU rate]"
            )
    result = {
        "hbm_gbps": {k: round(v, 1) for k, v in hbm_all.items()},
        "mxu_tflops": {k: round(v, 1) for k, v in mxu.items()},
        "rows": rows,
    }
    if args.json:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
