"""Dump tensors as grayscale images for visual debugging.

The reference dumps failing tensors as HDR images via stb_image_write with
automatic near-square shape factoring (test.c:1296-1318). This is the
dependency-free equivalent: any .testtensor archive (or a single tensor in
it) is written as PGM images with the same auto-factoring, viewable in any
image tool.

Usage:
    python tools/tensor_image.py fixture.testtensor [tensor_name] [outdir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def near_square_factors(n: int) -> tuple[int, int]:
    """Factor n into (h, w) with h <= w, as close to square as possible
    (the reference's aspect-ratio factoring, test.c:1296-1318)."""
    best = (1, n)
    for h in range(1, int(n**0.5) + 1):
        if n % h == 0:
            best = (h, n // h)
    return best


def to_image(arr: np.ndarray) -> np.ndarray:
    """Normalize any tensor into a uint8 2-D image."""
    flat = np.asarray(arr, np.float64).ravel()
    if flat.size == 0:
        return np.zeros((1, 1), np.uint8)
    lo, hi = float(flat.min()), float(flat.max())
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    img = ((flat - lo) * scale).astype(np.uint8)
    if arr.ndim >= 2:
        h, w = int(np.prod(arr.shape[:-1])), arr.shape[-1]
    else:
        h, w = near_square_factors(flat.size)
    return img.reshape(h, w)


def write_pgm(path: Path, img: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    from vadc_tpu.io.testtensor import load_testtensor

    tensors = load_testtensor(argv[0])
    name = argv[1] if len(argv) > 1 else None
    outdir = Path(argv[2] if len(argv) > 2 else ".")
    outdir.mkdir(parents=True, exist_ok=True)
    selected = {name: tensors[name]} if name else tensors
    for tname, arr in selected.items():
        safe = tname.replace("/", "_").replace(".", "_")
        path = outdir / f"{safe}.pgm"
        write_pgm(path, to_image(arr))
        print(f"{path}  {arr.shape} -> {to_image(arr).shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
