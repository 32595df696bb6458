"""2D Morton (Z-order) pixel ordering.

Capability parity with the reference's Morton pixel traversal
(cuda-core/morton.cuh:7-48, used by the megakernel's grid-stride loop,
megakernel.cu:84-91). On TPU the payoff is different: the packet-BVH
traversal kernel (ops/bvh_pallas.py) shares one stack per ray tile, so
tiles should be spatially square — Morton order turns a (ROWS·128)-ray
tile from a thin raster strip into a compact 2^k × 2^k pixel block
(measured ~1.4× traversal speedup on the sphere scene).

The inverse mapping (morton-flat → row-major image) is done with a
bit-unshuffle expressed as reshape/transpose — one XLA copy, no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _part1by1(v):
    v = np.asarray(v, np.uint64)
    v = (v | (v << 8)) & np.uint64(0x00FF00FF)
    v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint64(0x33333333)
    v = (v | (v << 1)) & np.uint64(0x55555555)
    return v


def morton_encode2(x, y):
    """Interleave bits: y in odd, x in even positions (morton.cuh:39-44)."""
    return _part1by1(x) | (_part1by1(y) << np.uint64(1))


def is_pot_square(width: int, height: int) -> bool:
    return (
        width == height and width > 0 and (width & (width - 1)) == 0
    )


def morton_pixel_order(width: int, height: int):
    """(N,) row-major pixel index permutation in Morton order (numpy).

    Requires a power-of-two square image; callers fall back to linear
    order otherwise.
    """
    assert is_pot_square(width, height)
    ix, iy = np.meshgrid(np.arange(width), np.arange(height))
    codes = morton_encode2(ix.ravel(), iy.ravel())
    return np.argsort(codes, kind="stable")


def unmorton_image(flat, height: int, width: int):
    """(N, C) values in Morton pixel order → (H, W, C) row-major image.

    Pure reshape/transpose: morton index bits are
    [y_{k-1} x_{k-1} … y_0 x_0]; viewing the flat axis as 2k binary axes
    and permuting them to [y_{k-1}…y_0 x_{k-1}…x_0] is exactly the
    de-interleave. One XLA transpose, no gather.
    """
    assert is_pot_square(width, height)
    k = width.bit_length() - 1
    c = flat.shape[-1]
    x = flat.reshape((2,) * (2 * k) + (c,))
    # axis i (0-based, most significant first) holds bit (2k-1-i):
    # odd bits (from the top: axes 0,2,4…) are y, even axes are x
    y_axes = list(range(0, 2 * k, 2))
    x_axes = list(range(1, 2 * k, 2))
    x = jnp.transpose(x, y_axes + x_axes + [2 * k])
    return x.reshape(height, width, c)
