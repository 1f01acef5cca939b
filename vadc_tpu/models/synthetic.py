"""Synthetic (random-weight) v5 archives, official shapes.

No official v5 weights exist in this build environment (the reference
exports them offline from the upstream jit model, silero_vad.py:380-392),
so the v5 architecture is validated and benchmarked with random weights of
the exact official shapes. Lives in the package (not tests/) so bench.py
and tools can build them WITHOUT importing tests.conftest — importing that
module switches jax to the CPU backend as a side effect, which silently
moves any subsequent TPU benchmark onto the host CPU.
"""

from __future__ import annotations

import numpy as np


def _random_v5(seed: int, n_fft: int, extra: dict | None) -> dict:
    """Shared builder: 4 reparam k3 convs, 1x128 LSTM, 1-logit decoder.
    The sample rate only changes the STFT geometry (n_fft and therefore the
    basis and first-conv input width = n_fft//2 + 1)."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.3):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    cutoff = n_fft // 2 + 1
    shapes = [(128, cutoff, 3), (64, 128, 3), (64, 64, 3), (128, 64, 3)]
    archive = {"forward_basis_buffer": r(2 * cutoff, 1, n_fft, scale=0.1)}
    archive.update(extra or {})
    for i, s in enumerate(shapes, 1):
        archive[f"enc{i}.weight"] = r(*s)
        archive[f"enc{i}.bias"] = r(s[0], scale=0.1)
    archive["weights"] = r(1, 512, 256, scale=0.15)
    archive["biases"] = r(1, 512, scale=0.1)
    archive["decoder_weights"] = r(1, 128, 1)
    archive["decoder_biases"] = r(1, scale=0.1)
    return archive


def random_v5_archive(seed: int = 0) -> dict:
    """16 kHz v5: n_fft 256, hop 128."""
    return _random_v5(seed, 256, None)


def random_v5_8k_archive(seed: int = 1) -> dict:
    """8 kHz v5 branch: half-rate STFT (n_fft 128), same encoder/LSTM."""
    return _random_v5(
        seed, 128, {"meta.sample_rate": np.asarray([8000.0], np.float32)}
    )
