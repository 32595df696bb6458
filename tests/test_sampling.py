import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import sampling as S
from cuda_optix_pathtracing_tpu.ops import vecmath as vm


def _uniforms(n, rng):
    u = rng.random((2, n)).astype(np.float32)
    return jnp.asarray(u[0]), jnp.asarray(u[1])


def test_disk_in_unit_circle(rng):
    u1, u2 = _uniforms(4096, rng)
    x, y = S.sample_uniform_disk(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # concentric map is area-preserving: mean radius^2 = 1/2
    assert abs(r2.mean() - 0.5) < 0.02


def test_sphere_unit_and_mean_zero(rng):
    u1, u2 = _uniforms(4096, rng)
    d = S.sample_uniform_sphere(u1, u2)
    np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-5)
    assert np.abs(np.asarray(d).mean(0)).max() < 0.05


def test_cos_hemisphere_distribution(rng):
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8192, 1))
    u1, u2 = _uniforms(8192, rng)
    d, pdf = S.sample_cos_hemisphere(n, u1, u2)
    cos = np.asarray(d)[:, 2]
    assert (cos >= -1e-6).all()
    np.testing.assert_allclose(np.asarray(pdf), cos / np.pi, atol=1e-5)
    # E[cos] for pdf = cos/pi is 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


def test_uniform_cone(rng):
    axis = vm.normalize(jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32))
    n = jnp.tile(axis, (4096, 1))
    u1, u2 = _uniforms(4096, rng)
    omc = jnp.full((4096,), 0.2, jnp.float32)
    d, cos_t, pdf, delta = S.sample_uniform_cone(n, omc, u1, u2)
    assert not np.asarray(delta).any()
    cos_axis = np.asarray(vm.dot(d, n))
    assert (cos_axis >= 0.8 - 1e-5).all()
    np.testing.assert_allclose(np.asarray(cos_t), cos_axis, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (2 * np.pi * 0.2), rtol=1e-5)
    # degenerate cone → delta
    _, _, pdf0, delta0 = S.sample_uniform_cone(n, jnp.zeros(4096), u1, u2)
    assert np.asarray(delta0).all() and (np.asarray(pdf0) == 1.0).all()


def test_ray_sphere_intersect():
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    c = jnp.asarray([[5.0, 0.0, 0.0]] * 3, jnp.float32)
    hit, t, p = S.ray_sphere_intersect(o, d, 0.0, 1e30, c, jnp.asarray([1.0, 1.0, 1.0]))
    assert bool(hit[0]) and not bool(hit[1]) and not bool(hit[2])
    assert abs(float(t[0]) - 4.0) < 1e-4
    np.testing.assert_allclose(np.asarray(p[0]), [4.0, 0.0, 0.0], atol=1e-4)


def test_map_to_sphere_range(rng):
    u1, u2 = _uniforms(512, rng)
    d = S.sample_uniform_sphere(u1, u2)
    u, v = S.map_to_sphere(d)
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (u <= 1).all() and (v >= 0).all() and (v <= 1).all()


def test_disk_azimuth_uniform(rng):
    """Concentric-disk azimuth must be uniform — regression for the
    Shirley–Chiu second-branch bug (φ = 3π/4·ratio instead of
    π/2 − π/4·ratio) that folded azimuth density 2:1 by quadrant."""
    from scipy import stats

    u1, u2 = _uniforms(1 << 16, rng)
    x, y = S.sample_uniform_disk(u1, u2)
    phi = np.arctan2(np.asarray(y), np.asarray(x))
    counts, _ = np.histogram(phi, bins=16, range=(-np.pi, np.pi))
    expected = len(phi) / 16
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < stats.chi2.ppf(0.999, 15), (chi2, counts / expected)


def test_cos_hemisphere_azimuth_uniform(rng):
    from scipy import stats

    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (1 << 16, 1))
    u1, u2 = _uniforms(1 << 16, rng)
    d, _ = S.sample_cos_hemisphere(n, u1, u2)
    phi = np.arctan2(np.asarray(d)[:, 1], np.asarray(d)[:, 0])
    counts, _ = np.histogram(phi, bins=16, range=(-np.pi, np.pi))
    expected = len(phi) / 16
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < stats.chi2.ppf(0.999, 15), (chi2, counts / expected)
