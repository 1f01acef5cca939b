"""Smoke tests for the repo tools (fidelity report, tensor image dump)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_tensor_image_factoring():
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import tensor_image
    finally:
        sys.path.pop(0)

    assert tensor_image.near_square_factors(12) == (3, 4)
    assert tensor_image.near_square_factors(7) == (1, 7)
    img = tensor_image.to_image(np.arange(12.0).reshape(3, 4))
    assert img.shape == (3, 4) and img.dtype == np.uint8
    assert img[0, 0] == 0 and img[-1, -1] == 255
    flat = tensor_image.to_image(np.arange(12.0))
    assert flat.shape == (3, 4)


def test_tensor_image_cli(tmp_path, testdata):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "tensor_image.py"),
         str(testdata / "softmax_test.testtensor"), "input", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    pgm = tmp_path / "input.pgm"
    assert pgm.exists()
    header = pgm.read_bytes()[:20]
    assert header.startswith(b"P5\n100 100\n255\n")


def test_pack_cli(tmp_path, testdata):
    out = subprocess.run(
        [sys.executable, "-m", "vadc_tpu.export.pack",
         str(testdata / "decoder_test.testtensor"), str(tmp_path / "e.py")],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "e.py").exists()
