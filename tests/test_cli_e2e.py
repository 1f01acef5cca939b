"""End-to-end CLI test on synthetic speech-like audio.

Locks down the full stdin -> segments pipeline (ingest, windowing,
minibatched model, FSM, pad/merge, stdout protocol, EOF error report) the
way a user drives it — the in-repo equivalent of the reference running
vadc.exe on a real file (reference vadc.c:670-1035). The synthetic signal
(harmonic stack with a 3 Hz syllabic envelope) reliably drives Silero v3.1
to p~0.95 voiced / ~0.0 silence, giving stable segment timestamps.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess runs with fresh jit compiles

SR = 16000


def _voiced(dur: float, f0: float = 120.0) -> np.ndarray:
    t = np.arange(int(dur * SR)) / SR
    sig = np.zeros_like(t)
    for k in range(1, 25):
        f = k * f0
        w = (
            np.exp(-(((f - 500) / 400) ** 2))
            + 0.7 * np.exp(-(((f - 1500) / 500) ** 2))
            + 0.3 * np.exp(-(((f - 2500) / 700) ** 2))
        )
        sig += w * np.sin(2 * np.pi * f * t + k)
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return 0.3 * sig / np.abs(sig).max()


def _silence(dur: float) -> np.ndarray:
    return 0.001 * np.random.default_rng(1).normal(size=int(dur * SR))


@pytest.fixture(scope="module")
def synthetic_pcm(tmp_path_factory) -> Path:
    audio = np.concatenate(
        [_silence(2), _voiced(3), _silence(2), _voiced(3, 180), _silence(2)]
    )
    path = tmp_path_factory.mktemp("e2e") / "synthetic.s16le"
    np.clip(audio * 32768, -32768, 32767).astype("<i2").tofile(path)
    return path


def _run_cli(pcm: Path, *args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # The suite's conftest exports an 8-virtual-device XLA_FLAGS for the
    # sharding tests; inheriting it would make this single-stream subprocess
    # allocate 8 CPU devices' worth of buffers (flaky under full-suite load).
    env.pop("XLA_FLAGS", None)
    with open(pcm, "rb") as f:
        return subprocess.run(
            [sys.executable, "-m", "vadc_tpu.cli.main", *args],
            stdin=f,
            capture_output=True,
            text=True,
            timeout=1500,  # headroom for first-run jit compile on a cold cache
            env=env,
            cwd=Path(__file__).parent.parent,
        )


def test_cli_segments_on_synthetic_speech(synthetic_pcm):
    r = _run_cli(synthetic_pcm)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 2, r.stdout
    seg1 = tuple(float(x) for x in lines[0].split(","))
    seg2 = tuple(float(x) for x in lines[1].split(","))
    # Boundaries are chunk-quantized (96 ms); the voiced regions are
    # [2, 5] and [7, 10] seconds, padded +-30 ms by the FSM. One end sits
    # on a borderline chunk, so allow one chunk of slack on each boundary.
    assert abs(seg1[0] - 1.99) < 0.10, lines
    assert abs(seg1[1] - 5.16) < 0.10, lines
    assert abs(seg2[0] - 6.98) < 0.10, lines
    assert abs(seg2[1] - 10.21) < 0.10, lines
    # clean EOF is reported to stderr exactly like the reference
    # (vadc.c:920-923)
    assert "Error: BS_Error_EndOfFile" in r.stderr


def test_cli_centiseconds_and_filter_script(synthetic_pcm):
    r = _run_cli(synthetic_pcm, "--output_centi_seconds")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 2
    # integer centiseconds (vadc.c:244-258)
    for ln in lines:
        a, b = ln.split(",")
        assert a.isdigit() and b.isdigit(), ln

    from vadc_tpu.cli.filter_script import build_filterscript, parse_segments

    seconds = _run_cli(synthetic_pcm).stdout.strip().splitlines()
    script = build_filterscript(parse_segments(seconds))
    assert script.startswith("asetpts=N/SR/TB, aselect='between(t,")
    assert script.count("between") == 2


def test_cli_raw_probabilities_bimodal(synthetic_pcm):
    r = _run_cli(synthetic_pcm, "--raw_probabilities")
    assert r.returncode == 0, r.stderr
    probs = np.asarray([float(x) for x in r.stdout.split()])
    assert len(probs) == 125  # 12 s at 96 ms per chunk
    # voiced center chunks confident, silence chunks quiet
    assert probs[25:45].min() > 0.5
    assert probs[:15].max() < 0.2
