"""Piecewise-constant 1D/2D distributions (reference core-math.h:146-204).

The sampling backbone for the HDR environment map and filter importance
sampling. Tables are precomputed (host/numpy or jnp) as CDFs; sampling is
a vectorized ``searchsorted`` — O(log n) per lane, branch-free, TPU-friendly.
All functions are batched over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Piecewise1D(NamedTuple):
    func: jnp.ndarray  # (N,) non-negative function values
    cdf: jnp.ndarray  # (N+1,) cumulative, cdf[-1] == 1 (or 0 if empty)
    func_int: jnp.ndarray  # () integral of func over [0,1]


def make_piecewise_1d(func) -> Piecewise1D:
    func = jnp.abs(jnp.asarray(func, jnp.float32))
    n = func.shape[-1]
    integral = jnp.sum(func, axis=-1) / n
    safe = jnp.where(integral > 0, integral, 1.0)
    cdf = jnp.concatenate(
        [jnp.zeros(func.shape[:-1] + (1,)), jnp.cumsum(func / (n * safe[..., None]), axis=-1)],
        axis=-1,
    )
    # force exact 1 at the end (uniform if integral was 0)
    uniform = jnp.linspace(0.0, 1.0, n + 1)
    cdf = jnp.where(integral[..., None] > 0, cdf, uniform)
    cdf = cdf.at[..., -1].set(1.0)
    return Piecewise1D(func, cdf, integral)


def sample_piecewise_1d(d: Piecewise1D, u):
    """u ∈ [0,1) → (x ∈ [0,1), pdf, index)."""
    n = d.func.shape[-1]
    idx = jnp.clip(jnp.searchsorted(d.cdf, u, side="right") - 1, 0, n - 1)
    c0 = d.cdf[idx]
    c1 = d.cdf[idx + 1]
    denom = jnp.maximum(c1 - c0, 1e-12)
    du = (u - c0) / denom
    x = (idx.astype(jnp.float32) + du) / n
    safe_int = jnp.where(d.func_int > 0, d.func_int, 1.0)
    pdf = jnp.where(d.func_int > 0, d.func[idx] / safe_int, 1.0)
    return x, pdf, idx


def pdf_piecewise_1d(d: Piecewise1D, x):
    n = d.func.shape[-1]
    idx = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
    safe_int = jnp.where(d.func_int > 0, d.func_int, 1.0)
    return jnp.where(d.func_int > 0, d.func[idx] / safe_int, 1.0)


class Piecewise2D(NamedTuple):
    """Row-major (H rows = y/v, W cols = x/u) 2D distribution: a marginal
    over rows + per-row conditionals, all stored dense."""

    func: jnp.ndarray  # (H, W)
    cond_cdf: jnp.ndarray  # (H, W+1) conditional CDFs per row
    cond_int: jnp.ndarray  # (H,) per-row integrals
    marg_cdf: jnp.ndarray  # (H+1,)
    func_int: jnp.ndarray  # ()


def make_piecewise_2d(func) -> Piecewise2D:
    func = np.abs(np.asarray(func, np.float32))
    h, w = func.shape
    cond_int = func.sum(axis=1) / w
    safe_row = np.where(cond_int > 0, cond_int, 1.0)
    cond_cdf = np.concatenate(
        [np.zeros((h, 1), np.float32), np.cumsum(func / (w * safe_row[:, None]), axis=1)],
        axis=1,
    )
    uniform = np.linspace(0.0, 1.0, w + 1, dtype=np.float32)[None, :]
    cond_cdf = np.where(cond_int[:, None] > 0, cond_cdf, uniform)
    cond_cdf[:, -1] = 1.0

    func_int = cond_int.sum() / h
    safe_int = func_int if func_int > 0 else 1.0
    marg_cdf = np.concatenate(
        [[0.0], np.cumsum(cond_int / (h * safe_int))]
    ).astype(np.float32)
    if func_int <= 0:
        marg_cdf = np.linspace(0.0, 1.0, h + 1, dtype=np.float32)
    marg_cdf[-1] = 1.0
    return Piecewise2D(
        jnp.asarray(func),
        jnp.asarray(cond_cdf),
        jnp.asarray(cond_int),
        jnp.asarray(marg_cdf),
        jnp.asarray(func_int, jnp.float32),
    )


# below this table area, row gathers run as one-hot matmuls (MXU) and
# in-row element picks as iota-masked sums — no generic gathers
_SMALL_2D = 64 * 64


def sample_piecewise_2d(d: Piecewise2D, u1, u2):
    """(u1,u2) → ((x,y) ∈ [0,1)², pdf) with pdf in unit-square measure."""
    from .gather import onehot_gather

    h, w = d.func.shape
    small = h * w <= _SMALL_2D
    # marginal over rows (y) from u2
    row = jnp.clip(jnp.searchsorted(d.marg_cdf, u2, side="right") - 1, 0, h - 1)
    if small:
        mm = onehot_gather(
            jnp.stack([d.marg_cdf[:-1], d.marg_cdf[1:]], axis=1), row
        )
        m0, m1 = mm[..., 0], mm[..., 1]
    else:
        m0 = d.marg_cdf[row]
        m1 = d.marg_cdf[row + 1]
    dv = (u2 - m0) / jnp.maximum(m1 - m0, 1e-12)
    y = (row.astype(jnp.float32) + dv) / h
    # conditional over columns (x) from u1, row-gathered CDF
    if small:
        ccdf = onehot_gather(d.cond_cdf, row)  # (N, W+1) via MXU
    else:
        ccdf = d.cond_cdf[row]
    col = jnp.clip(
        jax_searchsorted_rows(ccdf, u1) - 1, 0, w - 1
    )
    if small:
        lane = jnp.arange(w + 1, dtype=jnp.int32)[None, :]
        c0 = jnp.sum(jnp.where(lane == col[..., None], ccdf, 0.0), axis=-1)
        c1 = jnp.sum(jnp.where(lane == (col + 1)[..., None], ccdf, 0.0), axis=-1)
        f = onehot_gather(d.func.reshape(h * w, 1), row * w + col)[..., 0]
    else:
        c0 = jnp.take_along_axis(ccdf, col[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(ccdf, (col + 1)[..., None], axis=-1)[..., 0]
        f = d.func[row, col]
    du = (u1 - c0) / jnp.maximum(c1 - c0, 1e-12)
    x = (col.astype(jnp.float32) + du) / w
    safe_int = jnp.where(d.func_int > 0, d.func_int, 1.0)
    pdf = jnp.where(d.func_int > 0, f / safe_int, 1.0)
    return x, y, pdf


def jax_searchsorted_rows(cdf_rows, u):
    """Per-row searchsorted: cdf_rows (N, K), u (N,) → (N,) insertion idx."""
    return jnp.sum((cdf_rows <= u[..., None]).astype(jnp.int32), axis=-1)


def pdf_piecewise_2d(d: Piecewise2D, x, y):
    from .gather import onehot_gather

    h, w = d.func.shape
    col = jnp.clip((x * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((y * h).astype(jnp.int32), 0, h - 1)
    f = onehot_gather(d.func.reshape(h * w, 1), row * w + col)[..., 0]
    safe_int = jnp.where(d.func_int > 0, d.func_int, 1.0)
    return jnp.where(d.func_int > 0, f / safe_int, 1.0)
