"""RMSE quality metric vs the Cycles ground truth.

Mirrors the reference's acceptance test (`scripts/rmse.py:14-60` in the
reference tree): images are loaded as 8-bit sRGB, normalized to [0,1],
per-pixel RMSE is the sqrt of the channel-mean squared error, and the
scene score is the mean over pixels. The bundled ground truth is the
Blender Cycles render of the same Cornell box at 2048 spp
(`scripts/cycles_2048.png`; see `scripts/bpy_set_samples.py:14-31`).

Also provides the quality *gate* used by tests and docs: our render must
score below the documented comparator renders shipped with the reference
(`scenes/pbrt-output.png` RMSE 0.1976 vs Cycles; Cycles self-consistency
floor 0.0079).
"""

from __future__ import annotations

import numpy as np

from .imageio import read_png


def load_unit_rgb(path: str) -> np.ndarray:
    """Load an image file → float64 RGB in [0,1] (reference rmse.py:9-11)."""
    img = read_png(path)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return img.astype(np.float64) / float(np.iinfo(img.dtype).max)


def rmse_image(img: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Per-pixel RMSE map (reference rmse.py:14-18)."""
    diff = np.asarray(img, np.float64) - np.asarray(ref, np.float64)
    return np.sqrt(np.mean(diff**2, axis=2))


def mean_rmse(img: np.ndarray, ref: np.ndarray) -> float:
    """Scene score: mean over the per-pixel RMSE map (rmse.py:52-53)."""
    if img.shape != ref.shape:
        raise ValueError(f"shape mismatch: {img.shape} vs {ref.shape}")
    return float(rmse_image(img, ref).mean())


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="mean RMSE between two images")
    ap.add_argument("image")
    ap.add_argument("reference")
    ap.add_argument("--save-rmse", default=None)
    args = ap.parse_args(argv)
    img = load_unit_rgb(args.image)
    ref = load_unit_rgb(args.reference)
    r = rmse_image(img, ref)
    if args.save_rmse:
        from .imageio import write_png

        m = r / r.max() if r.max() > 0 else r
        write_png(args.save_rmse, (m * 255).astype(np.uint8))
    print(mean_rmse(img, ref))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
