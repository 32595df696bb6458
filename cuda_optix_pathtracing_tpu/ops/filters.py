"""Pixel reconstruction filters (reference core-render.cuh:160-286,
cudautils-filter.cuh): Mitchell-Netravali B=C=1/3 radius 2, plus a
tabulated inverse-CDF FilterSampler for filter importance sampling.

With filter importance sampling every camera sample has weight sign(f)
(|f|/pdf = const), so the film stays a plain average — exactly how the
reference integrates it (evalTile → FilterSampler → film.addSample).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .distrib import Piecewise2D, make_piecewise_2d, sample_piecewise_2d


def mitchell_1d(x, b: float = 1.0 / 3.0, c: float = 1.0 / 3.0):
    """Mitchell-Netravali kernel on radius-2 support (|x| in filter units)."""
    x = jnp.abs(jnp.asarray(x)) * 2.0  # map radius 2 → canonical |x|<2? no:
    # canonical Mitchell is defined on |x|<2 with unit spacing; the
    # reference evaluates mitchell1D(x/radius*2) likewise.
    x1 = ((12 - 9 * b - 6 * c) * x**3 + (-18 + 12 * b + 6 * c) * x**2 + (6 - 2 * b)) / 6
    x2 = (
        (-b - 6 * c) * x**3
        + (6 * b + 30 * c) * x**2
        + (-12 * b - 48 * c) * x
        + (8 * b + 24 * c)
    ) / 6
    return jnp.where(x < 1.0, x1, jnp.where(x < 2.0, x2, 0.0))


def mitchell_2d(x, y, radius: float = 2.0):
    return mitchell_1d(x / radius) * mitchell_1d(y / radius)


class FilterSampler(NamedTuple):
    dist: Piecewise2D
    radius: float
    table: jnp.ndarray  # (R, R) signed filter values on the sample grid


def make_filter_sampler(radius: float = 2.0, resolution: int = 32) -> FilterSampler:
    """Tabulate |f| on a resolution² grid over [-r, r]² (reference
    FilterSampler, core-render.cuh:177-231)."""
    xs = (np.arange(resolution) + 0.5) / resolution * 2 * radius - radius
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    f = np.asarray(mitchell_2d(jnp.asarray(gx), jnp.asarray(gy), radius))
    dist = make_piecewise_2d(np.abs(f))
    return FilterSampler(dist, radius, jnp.asarray(f, jnp.float32))


def sample_filter(fs: FilterSampler, u1, u2):
    """(u1,u2) → (dx, dy, weight): film-plane offset in pixels and the
    sample weight sign(f) (|f|/pdf is a constant folded into the average)."""
    from .gather import onehot_gather

    x01, y01, _pdf = sample_piecewise_2d(fs.dist, u1, u2)
    res = fs.table.shape[0]
    cx = jnp.clip((x01 * res).astype(jnp.int32), 0, res - 1)
    cy = jnp.clip((y01 * res).astype(jnp.int32), 0, res - 1)
    w = jnp.sign(
        onehot_gather(fs.table.reshape(res * res, 1), cy * res + cx)[..., 0]
    )
    dx = x01 * 2 * fs.radius - fs.radius
    dy = y01 * 2 * fs.radius - fs.radius
    return dx, dy, w
