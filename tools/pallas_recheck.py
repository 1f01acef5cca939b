"""Round-5 re-measurement of the fused Pallas whole-model kernels.

Round 4 switched `models/silero_v31.forward_pallas` to the 3-D kernel
(kernels/silero_v31_fused3d) on the strength of a 0.094 ms/step figure at
batch 2048 — measured with an INDEPENDENT-steps loop that passed the SAME
input buffers every call. The same kernel measured 5.8 ms/chunk inside
lax.scan, which is what bench.py reports (BENCH_r04's flagged
v3_pallas_ms_per_chunk_step 1.87 -> 5.77 regression). This script settles
which number is real:

  a) scan cost (bench methodology: long/short difference, sustained) for
     XLA fast, fused2d, fused3d;
  b) dependent-chain step loop (h/c fed back, audio VARIED per step via a
     pre-generated ring) for fused2d / fused3d;
  c) the round-4 artifact reproduction: identical-args independent loop.

If (b) for fused3d lands near 5.8 ms, the 0.094 was a measurement artifact
(identical-args loops through the remote-device tunnel can elide/replay
work) and forward_pallas must go back to fused2d.

Usage: python tools/pallas_recheck.py [--quick]
Writes one JSON line per measurement to stdout; progress on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(obj):
    print(json.dumps(obj), flush=True)


def dependent_step_loop(fwd, params, audio_ring, h, c, reps):
    """Time `reps` forward steps with h/c fed back (true dependency chain)
    and a different audio buffer each call (ring of pre-staged device
    buffers). Returns seconds/step."""
    n = audio_ring.shape[0]
    probs = None
    for i in range(3):  # warmup inside the chain
        probs, h, c = fwd(params, audio_ring[i % n], h, c)
    np.asarray(probs)
    t0 = time.perf_counter()
    for i in range(reps):
        probs, h, c = fwd(params, audio_ring[i % n], h, c)
    np.asarray(probs)  # single materialization barrier at the end
    return (time.perf_counter() - t0) / reps


def identical_args_loop(fwd, params, audio, h, c, reps):
    """The round-4 methodology under test: same buffers every call, no
    state feedback."""
    probs, hn, cn = fwd(params, audio, h, c)
    np.asarray(probs)
    t0 = time.perf_counter()
    for _ in range(reps):
        probs, hn, cn = fwd(params, audio, h, c)
    np.asarray(probs)
    return (time.perf_counter() - t0) / reps


def main():
    quick = "--quick" in sys.argv
    sys.path.insert(0, "/root/repo")

    import jax
    import jax.numpy as jnp

    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.nn import functional as F
    from __graft_entry__ import _load_v31_params
    from bench import steady_state_per_chunk

    enable_persistent_compilation_cache()
    params = _load_v31_params()
    batch = 2048
    keys = iter(jax.random.split(jax.random.key(42), 16))

    # ---- (a) scan cost, bench methodology ----
    scan_reps = 3 if quick else 5
    for name, kwargs in (
        ("xla_fast", dict(precision="fast")),
        ("pallas_current", dict(precision="fast", use_pallas=True)),
    ):
        runner = StreamRunner("v3", params, **kwargs)
        t0 = time.perf_counter()
        stats = steady_state_per_chunk(runner, batch, 1536, next(keys), reps=scan_reps)
        log(f"scan {name}: {stats['median']*1e3:.3f} ms (IQR {stats['iqr']*1e3:.3f})"
            f" [{time.perf_counter()-t0:.0f}s]")
        emit({"config": f"scan_{name}", "ms": round(stats["median"] * 1e3, 4),
              "iqr_ms": round(stats["iqr"] * 1e3, 4), "reps": stats["reps"]})

    # fused2d scan, forced (bypasses forward_pallas's 3d selection)
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d
    from vadc_tpu.kernels.silero_v31_fused3d import forward_fused3d

    class Forced:
        def __init__(self, module, fwd):
            self._m, self.forward = module, fwd

        def __getattr__(self, name):
            return getattr(self._m, name)

    from vadc_tpu.models import silero_v31 as v31mod

    def fwd2d(p, a, hh, cc):
        with F.precision_mode("fast"):
            return forward_fused2d(p, a, hh, cc, fast=True)

    def fwd3d(p, a, hh, cc):
        with F.precision_mode("fast"):
            return forward_fused3d(p, a, hh, cc, block_streams=32, fast=True)

    import functools
    from vadc_tpu.engine import runner as runner_mod

    for name, fwd in (("fused2d", fwd2d), ("fused3d", fwd3d)):
        r = StreamRunner("v3", params, precision="fast")
        forced = Forced(v31mod, fwd)
        r._scan = jax.jit(
            functools.partial(runner_mod._scan, forced, "v3"), donate_argnums=(2,)
        )
        t0 = time.perf_counter()
        stats = steady_state_per_chunk(r, batch, 1536, next(keys), reps=scan_reps)
        log(f"scan {name} (forced): {stats['median']*1e3:.3f} ms "
            f"(IQR {stats['iqr']*1e3:.3f}) [{time.perf_counter()-t0:.0f}s]")
        emit({"config": f"scan_{name}", "ms": round(stats["median"] * 1e3, 4),
              "iqr_ms": round(stats["iqr"] * 1e3, 4), "reps": stats["reps"]})

    # ---- (b)+(c) step loops ----
    ring_n, reps = (4, 20) if quick else (8, 50)
    audio_ring = jax.jit(
        lambda k: jax.random.normal(k, (ring_n, batch, 1536), jnp.float32) * 0.1
    )(next(keys))
    np.asarray(audio_ring[0, 0, :2])
    h0 = jnp.zeros((2, batch, 64), jnp.float32)
    c0 = jnp.zeros((2, batch, 64), jnp.float32)

    for name, fwd in (
        ("xla_fast", None),
        ("fused2d", fwd2d),
        ("fused3d", fwd3d),
    ):
        if fwd is None:
            def fwd(p, a, hh, cc):
                with F.precision_mode("fast"):
                    return v31mod.forward(p, a, hh, cc)
        jfwd = jax.jit(fwd)
        dep = dependent_step_loop(jfwd, params, audio_ring, h0, c0, reps)
        same = identical_args_loop(jfwd, params, audio_ring[0], h0, c0, reps)
        log(f"step {name}: dependent-chain {dep*1e3:.3f} ms/step, "
            f"identical-args {same*1e3:.3f} ms/step")
        emit({"config": f"step_{name}", "dependent_ms": round(dep * 1e3, 4),
              "identical_args_ms": round(same * 1e3, 4), "reps": reps})


if __name__ == "__main__":
    main()
