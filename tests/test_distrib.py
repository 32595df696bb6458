"""Piecewise-constant 1D/2D distribution tests (VERDICT r2 ask #7;
reference behaviour: core-math.h:146-204 PiecewiseConstant1D/2D).

Checks: sample→pdf agreement with the standalone pdf functions, inverse-
CDF correctness via chi² against the normalized function, and the
degenerate (all-zero) uniform fallback — on BOTH gather paths (one-hot
MXU below 64×64, generic above).
"""

import numpy as np
import pytest
from scipy import stats

import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.ops.distrib import (
    make_piecewise_1d,
    make_piecewise_2d,
    pdf_piecewise_1d,
    pdf_piecewise_2d,
    sample_piecewise_1d,
    sample_piecewise_2d,
)


def _stratified(n, rng):
    return (np.arange(n) + rng.random(n)) / n


def test_piecewise_1d_sample_pdf_agree(rng):
    func = rng.random(17).astype(np.float32) + 0.05
    d = make_piecewise_1d(func)
    u = jnp.asarray(rng.random(4096), jnp.float32)
    x, pdf, idx = sample_piecewise_1d(d, u)
    np.testing.assert_allclose(pdf, pdf_piecewise_1d(d, x), rtol=1e-5)
    # x lands in the bin reported by idx
    np.testing.assert_array_equal(
        np.clip((np.asarray(x) * 17).astype(int), 0, 16), np.asarray(idx)
    )


def test_piecewise_1d_chi_square(rng):
    n = 16
    func = rng.random(n).astype(np.float32) + 0.02
    d = make_piecewise_1d(func)
    u = jnp.asarray(_stratified(1 << 15, rng), jnp.float32)
    x, _, _ = sample_piecewise_1d(d, u)
    counts = np.bincount(
        np.clip((np.asarray(x) * n).astype(int), 0, n - 1), minlength=n
    )
    expected = func / func.sum() * len(u)
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # stratified sampling beats iid, so the iid 99.9% quantile is generous
    assert chi2 < stats.chi2.ppf(0.999, n - 1), chi2


def test_piecewise_1d_zero_function_uniform():
    d = make_piecewise_1d(np.zeros(8, np.float32))
    u = jnp.linspace(0.01, 0.99, 64)
    x, pdf, _ = sample_piecewise_1d(d, u)
    np.testing.assert_allclose(x, u, atol=1e-6)
    np.testing.assert_allclose(pdf, 1.0)


@pytest.mark.parametrize("shape", [(8, 12), (80, 96)])  # one-hot / generic
def test_piecewise_2d_sample_pdf_agree(rng, shape):
    func = rng.random(shape).astype(np.float32) + 0.01
    d = make_piecewise_2d(func)
    u1 = jnp.asarray(rng.random(4096), jnp.float32)
    u2 = jnp.asarray(rng.random(4096), jnp.float32)
    x, y, pdf = sample_piecewise_2d(d, u1, u2)
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(pdf_piecewise_2d(d, x, y)), rtol=1e-4
    )
    assert float(jnp.min(x)) >= 0 and float(jnp.max(x)) < 1
    assert float(jnp.min(y)) >= 0 and float(jnp.max(y)) < 1


@pytest.mark.parametrize("shape", [(6, 8), (80, 96)])
def test_piecewise_2d_chi_square(rng, shape):
    h, w = shape
    func = rng.random(shape).astype(np.float32) + 0.05
    d = make_piecewise_2d(func)
    n = 1 << 16
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    x, y, _ = sample_piecewise_2d(d, u1, u2)
    col = np.clip((np.asarray(x) * w).astype(int), 0, w - 1)
    row = np.clip((np.asarray(y) * h).astype(int), 0, h - 1)
    counts = np.bincount(row * w + col, minlength=h * w)
    expected = (func / func.sum()).reshape(-1) * n
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    assert chi2 < stats.chi2.ppf(0.999, h * w - 1), chi2


def test_piecewise_2d_pdf_integrates_to_one(rng):
    """∫∫ pdf dx dy over the unit square == 1 (unit-square measure)."""
    func = rng.random((9, 13)).astype(np.float32)
    d = make_piecewise_2d(func)
    h, w = func.shape
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    X, Y = np.meshgrid(xs, ys)
    pdf = np.asarray(
        pdf_piecewise_2d(
            d, jnp.asarray(X.ravel(), jnp.float32), jnp.asarray(Y.ravel(), jnp.float32)
        )
    )
    np.testing.assert_allclose(pdf.mean(), 1.0, rtol=1e-5)
