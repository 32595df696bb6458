"""Mitchell filter + filter-importance-sampling tests (VERDICT r2 ask #7;
reference behaviour: core-render.cuh:160-286 FilterSampler)."""

import numpy as np
from scipy import stats

import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.ops.filters import (
    make_filter_sampler,
    mitchell_1d,
    mitchell_2d,
    sample_filter,
)


def test_mitchell_1d_values():
    # canonical Mitchell B=C=1/3: M(0) = (6-2B)/6 = 8/9·…  exact:
    # (6 - 2/3)/6 = 16/18 = 8/9; M(1) via second piece? first piece at 1:
    # (12-9B-6C)·1 + (-18+12B+6C)·1 + (6-2B) all /6 → with B=C=1/3:
    # (12-3-2) + (-18+4+2) + (6-2/3) = 7 - 12 + 16/3 = 1/3 → /6 = 1/18
    assert abs(float(mitchell_1d(0.0)) - 8.0 / 9.0) < 1e-6
    assert abs(float(mitchell_1d(0.5)) - 1.0 / 18.0) < 1e-6  # x=0.5 → canonical 1
    assert float(mitchell_1d(1.0)) == 0.0  # canonical 2 = support edge


def test_mitchell_2d_integrates_to_one():
    r = 2.0
    n = 2048
    xs = (np.arange(n) + 0.5) / n * 2 * r - r
    w1 = np.asarray(mitchell_1d(jnp.asarray(xs / r)))
    # ∫_{-r}^{r} m1(x/r) dx = 1  (canonical Mitchell integrates to 1)
    assert abs(w1.sum() * (2 * r / n) - 1.0) < 1e-3
    # separable ⇒ 2D integral is the square
    gx, gy = np.meshgrid(xs[::16], xs[::16])
    f = np.asarray(mitchell_2d(jnp.asarray(gx), jnp.asarray(gy), r))
    cell = (2 * r / (n / 16)) ** 2
    assert abs(f.sum() * cell - 1.0) < 5e-3


def test_sample_filter_density_matches_abs_f(rng):
    fs = make_filter_sampler()
    res = fs.table.shape[0]
    n = 1 << 16
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    dx, dy, w = sample_filter(fs, u1, u2)
    assert set(np.unique(np.asarray(w))) <= {-1.0, 1.0}
    # histogram of samples over the table grid ∝ |f|
    cx = np.clip(
        ((np.asarray(dx) + fs.radius) / (2 * fs.radius) * res).astype(int), 0, res - 1
    )
    cy = np.clip(
        ((np.asarray(dy) + fs.radius) / (2 * fs.radius) * res).astype(int), 0, res - 1
    )
    counts = np.bincount(cy * res + cx, minlength=res * res).astype(np.float64)
    absf = np.abs(np.asarray(fs.table)).reshape(-1).astype(np.float64)
    expected = absf / absf.sum() * n
    live = expected > 5
    chi2 = float(
        (((counts - expected) ** 2 / np.maximum(expected, 1e-9))[live]).sum()
    )
    assert chi2 < stats.chi2.ppf(0.999, live.sum() - 1), chi2


def test_sample_filter_weight_unbiased(rng):
    """E[sign(f)]·∫|f| == ∫f: the signed weights reproduce the filter's
    unit DC gain (negative lobes included)."""
    fs = make_filter_sampler()
    n = 1 << 16
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    _, _, w = sample_filter(fs, u1, u2)
    table = np.asarray(fs.table, np.float64)
    ratio_ref = table.sum() / np.abs(table).sum()  # ∫f / ∫|f|
    assert abs(float(np.mean(np.asarray(w))) - ratio_ref) < 5e-3
