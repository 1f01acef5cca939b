"""Model runners: jitted per-chunk step functions and scan drivers.

Two execution shapes:

  * `StreamRunner.step` — one chunk per stream for a batch of B independent
    streams (the realtime serving hot path). State (h, c, v5 context) is a
    donated pytree, device-resident across calls.
  * `StreamRunner.scan` — offline: audio [B, T, chunk] scanned over T on
    device with state in the scan carry; returns probs [B, T]. This is the
    TPU-native generalization of the reference's whole-file loop
    (vadc.c:852-999) to many files at once.

  * `MinibatchRunner` — the reference driver's exact semantics for ONE
    stream: a window of N consecutive chunks flattened through the LSTM
    (process_chunks, vadc.c:56-103), used by the CLI for golden parity.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vadc_tpu.models import silero_v31, silero_v4, silero_v5

_FAMILIES = {
    "v3": silero_v31,
    "v4": silero_v4,
    "v4_8k": silero_v4.v4_8k,
    "v5": silero_v5,
    "v5_8k": silero_v5.v5_8k,
}


def get_family_module(family: str):
    try:
        return _FAMILIES[family]
    except KeyError:
        raise ValueError(f"unknown model family {family!r}") from None


@jax.tree_util.register_pytree_node_class
@dataclass
class StreamState:
    """Per-stream recurrent state: the complete resumable inference state of
    a batch of streams (reference analogue: silero.h:36-37, vadc.c:124)."""

    h: jax.Array  # [L, B, H]
    c: jax.Array  # [L, B, H]
    context: jax.Array | None = None  # [B, 64] v5 only

    def tree_flatten(self):
        return (self.h, self.c, self.context), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_streams(self) -> int:
        return self.h.shape[1]


def init_stream_state(family: str, n_streams: int) -> StreamState:
    mod = get_family_module(family)
    h, c = mod.init_state(n_streams)
    # v5 families carry a raw-audio context tail between chunks
    ctx = mod.init_context(n_streams) if hasattr(mod, "init_context") else None
    return StreamState(h, c, ctx)


class StreamRunner:
    """Batched independent-stream inference for one model family.

    precision selects the matmul tier (functional.PRECISION_MODES):
      * 'faithful' (default) — full-fp32, the golden-fidelity contract;
      * 'balanced' — bf16_3x matmuls, ~2e-5 max probability deviation
        (still inside the 1e-4 per-op tier);
      * 'fast' — single-pass bf16, ~4e-4 deviation (decision-compatible
        with the CLI hysteresis);
      * 'turbo' — fast + bf16-resident encoder activations, ~4e-4.
    Measured throughput per tier: docs/PERFORMANCE.md headline table.
    fast_math=True is shorthand for precision='fast'."""

    def __init__(
        self,
        family: str,
        params: dict,
        *,
        fast_math: bool = False,
        precision: str | None = None,
        use_pallas: bool = False,
        scan_block_chunks: int | None = None,
        compiler_options: dict | None = None,
    ):
        if precision is None:
            precision = "fast" if fast_math else "faithful"
        self.family = family
        self.params = params
        self.precision = precision
        # any tier whose matmuls run bf16 single-pass (fast AND turbo)
        self.fast_math = precision in ("fast", "turbo")
        self.scan_block_chunks = scan_block_chunks
        self.module = get_family_module(family)
        module = self.module
        if use_pallas:
            if not hasattr(module, "forward_pallas"):
                raise ValueError(f"family {family!r} has no Pallas forward")
            module = _PallasForward(module)
        step = functools.partial(_step, module, family)
        scan = functools.partial(_scan, module, family)
        fns = {"step": step, "scan": scan}
        if scan_block_chunks:
            fns["scan_tblock"] = functools.partial(
                _scan_tblock, module, family, scan_block_chunks
            )
        if precision != "faithful":
            from vadc_tpu.nn import functional as F

            def wrap(fn):
                @functools.wraps(fn)
                def inner(*args):
                    with F.precision_mode(precision):
                        return fn(*args)

                return inner

            fns = {k: wrap(fn) for k, fn in fns.items()}
        # State buffers are donated: the step/scan output (hn, cn, context)
        # aliases the input buffers on device instead of copying — the XLA
        # equivalent of the reference's in-place h/c rotation (vadc.c:83-84).
        # Callers must treat the passed-in state as consumed.
        self._step = jax.jit(fns["step"], donate_argnums=(2,))
        self._scan = jax.jit(fns["scan"], donate_argnums=(2,))
        self._scan_tblock = (
            jax.jit(fns["scan_tblock"], donate_argnums=(2,))
            if "scan_tblock" in fns
            else None
        )
        if compiler_options:
            # Route the compile through .lower().compile(compiler_options=)
            # — the only channel that reaches the TPU compiler's own flags on
            # this backend: XLA_FLAGS is parsed by the LOCAL client, which
            # fatally rejects every --xla_tpu_* name (the TPU passes live in
            # the remote compile service). Used by tools/turbo_gap.py's flag
            # sweep and available in production should a flag ever win.
            self._step = _JitWithOptions(self._step, compiler_options)
            self._scan = _JitWithOptions(self._scan, compiler_options)
            if self._scan_tblock is not None:
                self._scan_tblock = _JitWithOptions(
                    self._scan_tblock, compiler_options
                )

    def init_state(self, n_streams: int) -> StreamState:
        return init_stream_state(self.family, n_streams)

    def step(self, chunks: jax.Array, state: StreamState) -> tuple[jax.Array, StreamState]:
        """chunks: [B, chunk_samples] new audio -> (probs [B], new state)."""
        return self._step(self.params, chunks, state)

    def scan(self, chunks: jax.Array, state: StreamState) -> tuple[jax.Array, StreamState]:
        """chunks: [B, T, chunk_samples] -> (probs [B, T], final state).

        With scan_block_chunks set and T a multiple of it, the chunk-blocked
        scan runs instead (identical results, front-end batched over
        B*scan_block_chunks chunks per step)."""
        tb = self.scan_block_chunks
        if self._scan_tblock is not None and tb and chunks.shape[1] % tb == 0:
            return self._scan_tblock(self.params, chunks, state)
        return self._scan(self.params, chunks, state)


class _JitWithOptions:
    """jit wrapper that compiles with backend compiler_options, caching one
    executable per abstract input signature (donation metadata from the
    wrapped jit carries through lower/compile unchanged)."""

    def __init__(self, jitfn, options: dict):
        self._jit = jitfn
        self._options = dict(options)
        self._cache: dict = {}

    def __call__(self, *args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        key = (
            treedef,
            tuple(
                (getattr(x, "shape", None), str(getattr(x, "dtype", type(x))))
                for x in leaves
            ),
        )
        compiled = self._cache.get(key)
        if compiled is None:
            compiled = self._jit.lower(*args).compile(
                compiler_options=self._options
            )
            self._cache[key] = compiled
        return compiled(*args)


class _PallasForward:
    """Module proxy whose forward is the family's Pallas fast path."""

    def __init__(self, module):
        self._module = module
        self.forward = module.forward_pallas

    def __getattr__(self, name):
        return getattr(self._module, name)


def _step(module, family: str, params: dict, chunks: jax.Array, state: StreamState):
    if state.context is not None:
        inp, new_ctx = module.attach_context(chunks, state.context)
    else:
        inp, new_ctx = chunks, None
    probs, hn, cn = module.forward(params, inp, state.h, state.c)
    return probs, StreamState(hn, cn, new_ctx)


def _scan(module, family: str, params: dict, chunks: jax.Array, state: StreamState):
    def body(st, chunk_t):
        probs, new_st = _step(module, family, params, chunk_t, st)
        return new_st, probs

    final_state, probs = lax.scan(body, state, chunks.transpose(1, 0, 2))
    return probs.transpose(1, 0), final_state


def _decode(module, family: str, params: dict, out: jax.Array) -> jax.Array:
    from vadc_tpu.nn import functional as F

    if family == "v3":
        return F.decoder_v3_nlc(out, params["dec_w"], params["dec_b"])
    return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"])


def _scan_tblock(
    module, family: str, tblock: int, params: dict, chunks: jax.Array, state: StreamState
):
    """Chunk-blocked scan: the TPU-native observation that only the LSTM has
    a cross-chunk dependency — the whole front-end (STFT, adaptive norm,
    encoder) is chunk-independent, so `tblock` consecutive chunks of every
    stream are flattened into one [B*tblock] encoder batch per scan step
    (amortizing per-op overheads that dominate at small channel widths), and
    only the LSTM+decoder walk the chunks in order. Numerics are the plain
    scan's: the per-chunk math is identical, state threads identically (the
    LSTM sees the same [tblock*frames] sequence it would see chunk by
    chunk). The reference cannot express this shape at all — its chunk
    minibatching serializes the LSTM per window of ONE stream (vadc.c:56-103).
    """
    from vadc_tpu.nn import functional as F

    B, T, S = chunks.shape
    if state.context is not None:
        # attach every chunk's carried-context prefix up front (chunk t's
        # prefix is chunk t-1's tail; chunk 0 takes the carry) — the
        # front-end then has zero cross-chunk dependencies
        ctx = state.context
        nctx = ctx.shape[-1]
        tails = jnp.concatenate([ctx[:, None, :], chunks[:, :-1, -nctx:]], axis=1)
        inputs = jnp.concatenate([tails, chunks], axis=-1)
        new_context = chunks[:, -1, -nctx:]
    else:
        inputs, new_context = chunks, None

    encode = getattr(module, "encode_nlc", None) or module.encode
    nblk = T // tblock
    blocks = inputs.reshape(B, nblk, tblock, inputs.shape[-1]).transpose(1, 0, 2, 3)

    def body(carry, blk):  # blk: [B, tblock, S']
        h, c = carry
        feats = encode(params, blk.reshape(B * tblock, blk.shape[-1]))
        frames, width = feats.shape[1], feats.shape[2]
        seq = feats.reshape(B, tblock * frames, width)
        out, hn, cn = F.lstm(seq, h, c, params["lstm_w"], params["lstm_b"])
        probs = _decode(
            module, family, params, out.reshape(B * tblock, frames, width)
        ).reshape(B, tblock)
        return (hn, cn), probs

    (hn, cn), probs = lax.scan(body, (state.h, state.c), blocks)
    probs = probs.transpose(1, 0, 2).reshape(B, T)
    return probs, StreamState(hn, cn, new_context)


class MinibatchRunner:
    """Reference-parity single-stream driver: batches of consecutive chunks
    flattened through the LSTM, state rotated between batches."""

    def __init__(
        self,
        family: str,
        params: dict,
        *,
        batch_size: int,
        chunk_samples: int,
        precision: str = "faithful",
    ):
        self.family = family
        self.params = params
        self.precision = precision
        self.module = get_family_module(family)
        self.batch_size = batch_size
        self.chunk_samples = chunk_samples
        mod = self.module
        self.h, self.c = mod.init_state(1)
        self.context = mod.init_context(1) if hasattr(mod, "init_context") else None
        fwd = self._forward
        if precision != "faithful":
            from vadc_tpu.nn import functional as F

            def fwd(*args, _inner=self._forward):
                with F.precision_mode(precision):
                    return _inner(*args)

        # h/c/context are donated (rotated in place on device, vadc.c:83-84)
        self._fwd = jax.jit(fwd, donate_argnums=(2, 3, 4))

    def _forward(self, params, chunks, h, c, context):
        if context is not None:
            # Per-chunk context prefix: chunk i gets the tail of chunk i-1;
            # chunk 0 gets the carried context (process_chunks_v5,
            # vadc.c:105-162). 64 samples at 16 kHz, 32 at 8 kHz.
            ctx_samples = self.module.CONTEXT_SAMPLES
            prev_tails = jnp.concatenate(
                [context, chunks[:-1, -ctx_samples:]], axis=0
            )
            inp = jnp.concatenate([prev_tails, chunks], axis=-1)
            new_context = chunks[-1:, -ctx_samples:]
            probs, hn, cn = self.module.forward_minibatched(params, inp, h, c)
            return probs, hn, cn, new_context
        probs, hn, cn = self.module.forward_minibatched(params, chunks, h, c)
        return probs, hn, cn, context

    def process_window(self, samples) -> list[float]:
        """Process a window of samples (zero-padded multiple of chunk size),
        returning one probability per chunk in the window."""
        n_chunks = samples.shape[0] // self.chunk_samples
        chunks = jnp.asarray(samples).reshape(n_chunks, self.chunk_samples)
        probs_out: list[float] = []
        for off in range(0, n_chunks, self.batch_size):
            batch = chunks[off : off + self.batch_size]
            if batch.shape[0] < self.batch_size:
                batch = jnp.pad(
                    batch, ((0, self.batch_size - batch.shape[0]), (0, 0))
                )
            probs, self.h, self.c, self.context = self._fwd(
                self.params, batch, self.h, self.c, self.context
            )
            # one bulk device->host transfer; element-wise float(p) would
            # sync per probability (up to batch_size syncs per window)
            probs_out.extend(np.asarray(probs).tolist())
        # A short final batch is zero-padded up to batch_size; the padded
        # entries advance LSTM state (reference stale-probability semantics,
        # vadc.c:88-99) but are NOT probabilities of real chunks — never
        # return more than one probability per chunk in the window.
        return probs_out[:n_chunks]
