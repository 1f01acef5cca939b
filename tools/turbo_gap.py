"""Bounded attack on the v3 fast/turbo 9-11x-of-light gap (VERDICT r3 #2).

The roofline (docs/PERFORMANCE.md) puts the turbo step's theoretical floor
at ~50 us and blames intermediate HBM round-trips between the ~40 fused
kernels plus lane padding. Three prescribed angles, each measured with the
bench methodology (sustained long/short scan differences, median of reps):

  hlo      — rank the compiled step's intermediates by bytes (XLA buffer
             assignment + largest fusion outputs): where the HBM trips are.
  variants — barrier/reshape placements that merge or split the top
             offenders (in-process monkeypatched model variants).
  flags    — XLA flag sweep, one subprocess per flag set (flags are
             parsed at backend init).
  halves   — 2 x 1024 pipelined half-batches vs one 2048 scan.
  all      — everything except flags (those need subprocesses).

Every result is appended as one JSON line to /tmp/turbo_gap_results.jsonl
so partial sweeps survive timeouts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))  # traffic_audit (shared HLO parser)

import numpy as np

BATCH = 2048
CHUNK = 1536
RESULTS = "/tmp/turbo_gap_results.jsonl"


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _record(entry: dict):
    entry["ts"] = time.time()
    with open(RESULTS, "a") as f:
        f.write(json.dumps(entry) + "\n")
    _log(json.dumps(entry))


def _runner(precision="turbo", compiler_options=None):
    from vadc_tpu.engine.runner import StreamRunner
    from __graft_entry__ import _load_v31_params

    return StreamRunner(
        "v3",
        _load_v31_params(),
        precision=precision,
        compiler_options=compiler_options,
    )


def measure(runner, reps=5, batch=BATCH):
    import jax

    from bench import _steady_state_once, _summarize

    diffs = _steady_state_once(
        runner, batch, CHUNK, jax.random.key(0), 16, 336, reps
    )
    return _summarize(diffs)


# ---- angle 0: where do the bytes go? ------------------------------------


def cmd_hlo():
    """Compile the turbo step and rank intermediates by bytes."""
    import jax
    import jax.numpy as jnp

    runner = _runner()
    state = runner.init_state(BATCH)
    chunks = jnp.zeros((BATCH, CHUNK), jnp.float32)
    lowered = runner._step.lower(runner.params, chunks, state)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    _record({
        "angle": "hlo",
        "temp_bytes_mb": round(mem.temp_size_in_bytes / 2**20, 1),
        "argument_bytes_mb": round(mem.argument_size_in_bytes / 2**20, 1),
        "output_bytes_mb": round(mem.output_size_in_bytes / 2**20, 1),
    })
    text = compiled.as_text()
    # rank fusion ROOT shapes by byte size (the tensors that cross HBM
    # between kernels) — one parser for this, shared with traffic_audit
    from traffic_audit import fusion_output_bytes

    _total, sizes = fusion_output_bytes(text)
    n_fusions = len(sizes)
    top = [
        {"mb": round(b / 2**20, 2), "name": n, "shape": s}
        for b, n, s in sizes[:20]
    ]
    _record({"angle": "hlo", "n_fusions": n_fusions, "top_outputs": top})


# ---- angle a: barrier / reshape placement --------------------------------


class _LaxProxy:
    """lax with optimization_barrier replaced."""

    def __init__(self, real, barrier):
        self._real = real
        self._barrier = barrier

    def __getattr__(self, name):
        if name == "optimization_barrier":
            return self._barrier
        return getattr(self._real, name)


def _variants():
    from jax import lax

    from vadc_tpu.nn import functional as F

    real_lax = F.lax
    real_norm = F.adaptive_audio_normalization_nlc
    real_layer = F.transformer_layer_nlc

    def restore():
        F.lax = real_lax
        F.adaptive_audio_normalization_nlc = real_norm
        F.transformer_layer_nlc = real_layer

    def no_mag_barrier():
        F.lax = _LaxProxy(real_lax, lambda x: x)

    def barrier_after_norm():
        def norm(spect):
            return lax.optimization_barrier(real_norm(spect))

        F.adaptive_audio_normalization_nlc = norm

    def barrier_each_layer():
        def layer(x, p, *, stride):
            return lax.optimization_barrier(real_layer(x, p, stride=stride))

        F.transformer_layer_nlc = layer

    def all_barriers():
        barrier_after_norm()
        barrier_each_layer()

    return restore, [
        ("baseline", lambda: None),
        ("no_mag_barrier", no_mag_barrier),
        ("barrier_after_norm", barrier_after_norm),
        ("barrier_each_layer", barrier_each_layer),
        ("barrier_norm_plus_layers", all_barriers),
    ]


def cmd_variants():
    restore, variants = _variants()
    for name, apply in variants:
        restore()
        apply()
        try:
            runner = _runner()
            stats = measure(runner)
            _record({
                "angle": "variants",
                "variant": name,
                "ms_median": round(stats["median"] * 1e3, 4),
                "ms_iqr": round(stats["iqr"] * 1e3, 4),
                "ms_best": round(stats["best"] * 1e3, 4),
            })
        except Exception as e:
            _record({"angle": "variants", "variant": name,
                     "error": f"{type(e).__name__}: {e}"})
    restore()


# ---- angle b: XLA flag sweep ---------------------------------------------

FLAG_SETS = [
    ("scoped_vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("scoped_vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("licm_inflate", "--xla_tpu_licm_size_inflation_ratio=2.0"),
    ("no_dot_strength", "--xla_tpu_enable_dot_strength_reduction=false"),
    ("flm_cheap", "--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"),
    ("async_host", "--xla_tpu_enable_async_collective_fusion=true"),
]


def cmd_flags():
    """One subprocess per flag set (XLA_FLAGS parse at backend init).
    An unknown flag fails the subprocess — recorded, not fatal."""
    for name, flags in FLAG_SETS:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "baseline",
             "--label", f"flags:{name}"],
            env=env,
            cwd=str(REPO),
            capture_output=True,
            text=True,
            timeout=1200,
        )
        if proc.returncode != 0:
            _record({
                "angle": "flags", "flags": flags,
                "error": (proc.stderr or "")[-300:],
                "wall_s": round(time.time() - t0, 1),
            })


def cmd_baseline(label="baseline"):
    runner = _runner()
    stats = measure(runner)
    _record({
        "angle": label,
        "ms_median": round(stats["median"] * 1e3, 4),
        "ms_iqr": round(stats["iqr"] * 1e3, 4),
        "ms_best": round(stats["best"] * 1e3, 4),
    })


# ---- angle b': TPU-compiler options (the route that actually works) ------
#
# XLA_FLAGS is parsed by the LOCAL xla client, which fatally rejects every
# --xla_tpu_* flag (see the recorded `flags` angle errors): the TPU passes
# live in the remote compile service. compiler_options passed at
# .lower().compile() time DO reach it — a bogus option name fails the remote
# compile, so accepted options are parsed, not dropped.

COPTION_SETS = [
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("no_dot_strength", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("licm_inflate_2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("aggressive_fusion", {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("async_host_offload", {"xla_tpu_enable_all_experimental_scheduler_features": "true"}),
    (
        "vmem_96m_plus_licm",
        {
            "xla_tpu_scoped_vmem_limit_kib": "98304",
            "xla_tpu_licm_size_inflation_ratio": "2.0",
        },
    ),
]


def cmd_coptions():
    """In-process sweep: one StreamRunner per option set; a rejected option
    surfaces as a remote-compile error, recorded and skipped."""
    cmd_baseline("coptions:baseline")
    for name, opts in COPTION_SETS:
        try:
            runner = _runner(compiler_options=opts)
            stats = measure(runner)
            _record({
                "angle": "coptions",
                "variant": name,
                "options": opts,
                "ms_median": round(stats["median"] * 1e3, 4),
                "ms_iqr": round(stats["iqr"] * 1e3, 4),
                "ms_best": round(stats["best"] * 1e3, 4),
            })
        except Exception as e:
            _record({
                "angle": "coptions",
                "variant": name,
                "options": opts,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            })


# ---- angle d (r4): fused dot+magnitude kernel ------------------------------


def cmd_dotmag():
    """On-chip parity + whole-model A/B of the Pallas fused spectrum-dot +
    magnitude kernel (kernels/stft_dotmag.py) vs the XLA einsum path, with a
    block_rows sweep."""
    import jax
    import jax.numpy as jnp

    from vadc_tpu.kernels import stft_dotmag
    from vadc_tpu.nn import functional as F

    # parity on the chip at production shapes (bf16 operands, turbo math)
    rng = jax.random.key(3)
    frames = jax.random.normal(rng, (512, 25, 256), jnp.float32).astype(
        jnp.bfloat16
    )
    basis = jax.random.normal(jax.random.key(4), (258, 256), jnp.float32).astype(
        jnp.bfloat16
    )
    spec = jnp.einsum(
        "bfn,cn->bfc", frames, basis, preferred_element_type=jnp.float32
    )
    ref = jnp.sqrt(spec[:, :, :129] ** 2 + spec[:, :, 129:] ** 2)
    wr, wi = stft_dotmag.split_basis(basis)
    try:
        out = stft_dotmag.dot_magnitude(frames, wr, wi)
        err = float(jnp.abs(out - ref).max())
        _record({"angle": "dotmag", "check": "parity_onchip", "max_abs_err": err})
    except Exception as e:
        _record({
            "angle": "dotmag",
            "check": "parity_onchip",
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        })
        return

    cmd_baseline("dotmag:baseline_einsum")
    # rows = 2048*25 = 51200 = 2^11 * 25: 4096 does not divide it (the
    # kernel's clamp would silently fall back to 2048)
    for bm in (256, 512, 1024, 2048):
        F.STFT_DOTMAG_PALLAS = True
        import vadc_tpu.kernels.stft_dotmag as sd

        orig = sd.dot_magnitude

        def patched(fr, wr_, wi_, *, block_rows=1024, **kw):
            return orig(fr, wr_, wi_, block_rows=bm, **kw)

        sd.dot_magnitude = patched
        try:
            runner = _runner()
            stats = measure(runner)
            _record({
                "angle": "dotmag",
                "variant": f"kernel_bm{bm}",
                "ms_median": round(stats["median"] * 1e3, 4),
                "ms_iqr": round(stats["iqr"] * 1e3, 4),
                "ms_best": round(stats["best"] * 1e3, 4),
            })
        except Exception as e:
            _record({
                "angle": "dotmag",
                "variant": f"kernel_bm{bm}",
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            })
        finally:
            sd.dot_magnitude = orig
            F.STFT_DOTMAG_PALLAS = False


# ---- angle c: pipelined half-batches --------------------------------------


def cmd_halves():
    """Two 1024-stream scans dispatched back-to-back (async) vs one 2048
    scan: can alternating half-batches overlap one half's HBM writes with
    the other's compute?"""
    import jax

    from bench import _summarize

    runner = _runner()
    half = BATCH // 2
    key = jax.random.key(1)
    import jax.numpy as jnp

    def timed_full(t_len, audio):
        state = runner.init_state(BATCH)
        t0 = time.perf_counter()
        probs, _ = runner.scan(audio[:, :t_len], state)
        np.asarray(probs[:, -1])
        return time.perf_counter() - t0

    def timed_halves(t_len, audio):
        s1 = runner.init_state(half)
        s2 = runner.init_state(half)
        t0 = time.perf_counter()
        p1, _ = runner.scan(audio[:half, :t_len], s1)
        p2, _ = runner.scan(audio[half:, :t_len], s2)  # dispatched async
        np.asarray(p1[:, -1])
        np.asarray(p2[:, -1])
        return time.perf_counter() - t0

    audio = jax.jit(
        lambda k: jax.random.normal(k, (BATCH, 336, CHUNK), jnp.float32) * 0.1
    )(key)
    np.asarray(audio[0, 0, :2])
    for fn, name in ((timed_full, "full_2048"), (timed_halves, "halves_2x1024")):
        fn(16, audio)
        fn(336, audio)  # compile + warm
        fn(336, audio)
        diffs = []
        for _ in range(5):
            ts = fn(16, audio)
            tl = fn(336, audio)
            diffs.append((tl - ts) / 320)
        stats = _summarize(diffs)
        _record({
            "angle": "halves",
            "variant": name,
            "ms_median": round(stats["median"] * 1e3, 4),
            "ms_iqr": round(stats["iqr"] * 1e3, 4),
        })


def main():
    args = sys.argv[1:]
    cmd = args[0] if args else "all"
    label = "baseline"
    if "--label" in args:
        label = args[args.index("--label") + 1]
    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if cmd == "hlo":
        cmd_hlo()
    elif cmd == "variants":
        cmd_variants()
    elif cmd == "flags":
        cmd_flags()
    elif cmd == "baseline":
        cmd_baseline(label)
    elif cmd == "halves":
        cmd_halves()
    elif cmd == "coptions":
        cmd_coptions()
    elif cmd == "dotmag":
        cmd_dotmag()
    elif cmd == "all":
        cmd_hlo()
        cmd_variants()
        cmd_halves()
        cmd_coptions()
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
