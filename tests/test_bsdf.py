import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import vecmath as vm


def _mat(d, n):
    table = B.make_material_table([d])
    return table.gather(jnp.zeros((n,), jnp.int32))


def _up(n):
    return jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))


def _wo(n, cos=0.7):
    s = np.sqrt(1 - cos**2)
    return jnp.tile(jnp.asarray([[s, 0.0, cos]], jnp.float32), (n, 1))


def _uniforms(n, rng):
    u = rng.random((3, n)).astype(np.float32)
    return jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2])


def test_lambert_weight_is_albedo(rng):
    n = 4096
    albedo = (0.25, 0.5, 0.75)
    mat = _mat(B.lambert(albedo), n)
    u1, u2, uc = _uniforms(n, rng)
    s = B.sample_bsdf(mat, _wo(n), _up(n), _up(n), u1, u2, uc)
    w = np.asarray(s.f_cos) / np.asarray(s.pdf)[:, None]
    np.testing.assert_allclose(w.mean(0), albedo, atol=1e-5)


def test_lambert_eval_matches_closed_form(rng):
    n = 512
    mat = _mat(B.lambert((0.8, 0.8, 0.8)), n)
    u1, u2, _ = _uniforms(n, rng)
    from cuda_optix_pathtracing_tpu.ops.sampling import sample_cos_hemisphere

    wi, _ = sample_cos_hemisphere(_up(n), u1, u2)
    f, pdf = B.eval_bsdf(mat, _wo(n), wi, _up(n), _up(n))
    cos = np.asarray(wi)[:, 2]
    np.testing.assert_allclose(np.asarray(pdf), cos / np.pi, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f)[:, 0], 0.8 * cos / np.pi, atol=1e-5)


def test_oren_nayar_sigma0_is_lambert(rng):
    n = 1024
    on = _mat(B.oren_nayar((0.6, 0.6, 0.6), 0.0), n)
    lam = _mat(B.lambert((0.6, 0.6, 0.6)), n)
    u1, u2, uc = _uniforms(n, rng)
    s_on = B.sample_bsdf(on, _wo(n), _up(n), _up(n), u1, u2, uc)
    s_lam = B.sample_bsdf(lam, _wo(n), _up(n), _up(n), u1, u2, uc)
    np.testing.assert_allclose(
        np.asarray(s_on.f_cos), np.asarray(s_lam.f_cos), atol=1e-4
    )


def test_oren_nayar_energy_bounded(rng):
    n = 8192
    mat = _mat(B.oren_nayar((1.0, 1.0, 1.0), 1.2), n)
    u1, u2, uc = _uniforms(n, rng)
    s = B.sample_bsdf(mat, _wo(n, 0.9), _up(n), _up(n), u1, u2, uc)
    w = np.asarray(s.f_cos[:, 0]) / np.asarray(s.pdf)
    e = w.mean()
    assert 0.5 < e <= 1.02, e  # white ON albedo: near but not above 1


def test_fresnel_dielectric_normal_incidence():
    f, cos_t = B.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.5]))
    np.testing.assert_allclose(float(f[0]), ((0.5 / 2.5) ** 2), atol=1e-6)
    np.testing.assert_allclose(float(cos_t[0]), 1.0, atol=1e-6)
    # total internal reflection from the dense side
    f_tir, _ = B.fresnel_dielectric(jnp.asarray([0.3]), jnp.asarray([1.0 / 1.5]))
    assert float(f_tir[0]) == 1.0


def test_fresnel_conductor_reasonable():
    eta = jnp.asarray([[0.2, 0.4, 1.4]])
    k = jnp.asarray([[3.4, 2.3, 1.8]])
    f = B.fresnel_conductor(jnp.asarray([1.0]), eta, k)
    f = np.asarray(f)[0]
    # closed form at normal incidence: ((η-1)²+k²)/((η+1)²+k²)
    expected = ((eta[0] - 1) ** 2 + k[0] ** 2) / ((eta[0] + 1) ** 2 + k[0] ** 2)
    np.testing.assert_allclose(f, np.asarray(expected), atol=1e-5)
    assert (f > 0.2).all() and (f <= 1.0).all()


def test_energy_tables_sane():
    e, eavg = B.ggx_energy_tables()
    e, eavg = np.asarray(e), np.asarray(eavg)
    assert e.shape == (32, 32) and eavg.shape == (32,)
    assert (e > 0).all() and (e <= 1.0 + 1e-6).all()
    # smooth surface (alpha→0) loses no energy away from exact grazing
    # (at cosθ≈0 half the VNDF-reflected directions dip below the horizon)
    np.testing.assert_allclose(e[1:, 0], 1.0, atol=5e-2)
    assert eavg[0] > 0.97
    # rougher → less single-scatter energy on average
    assert eavg[-1] < eavg[0]


def test_ggx_conductor_furnace_with_ms_compensation(rng):
    # perfect mirror-ish conductor (F ≈ 1): multiple-scattering compensation
    # should bring total energy close to 1 even at high roughness
    n = 16384
    mat = _mat(B.ggx_conductor((0.01, 0.01, 0.01), (8.0, 8.0, 8.0), 0.0, 0.7, 0.7), n)
    u1, u2, uc = _uniforms(n, rng)
    s = B.sample_bsdf(mat, _wo(n, 0.6), _up(n), _up(n), u1, u2, uc)
    pdf = np.asarray(s.pdf)
    w = np.where(pdf > 0, np.asarray(s.f_cos[:, 0]) / np.maximum(pdf, 1e-12), 0.0)
    e = w.mean()
    assert 0.85 < e < 1.15, e


def test_ggx_sample_eval_consistency(rng):
    n = 2048
    mat = _mat(B.ggx_conductor((0.2, 0.4, 1.4), (3.4, 2.3, 1.8), 0.0, 0.4, 0.4), n)
    u1, u2, uc = _uniforms(n, rng)
    wo = _wo(n, 0.8)
    s = B.sample_bsdf(mat, wo, _up(n), _up(n), u1, u2, uc)
    f, pdf = B.eval_bsdf(mat, wo, s.wi, _up(n), _up(n))
    m = np.asarray(s.pdf) > 1e-3
    np.testing.assert_allclose(np.asarray(pdf)[m], np.asarray(s.pdf)[m], rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(f)[m], np.asarray(s.f_cos)[m], rtol=2e-2, atol=1e-4
    )


def test_ggx_dielectric_refraction_flags(rng):
    n = 4096
    mat = _mat(
        B.ggx_dielectric((1.0, 1.0, 1.0), (1.0, 1.0, 1.0), 0.0, 1.5, 0.2, 0.2), n
    )
    u1, u2, uc = _uniforms(n, rng)
    s = B.sample_bsdf(mat, _wo(n, 0.8), _up(n), _up(n), u1, u2, uc)
    refr = np.asarray(s.refract)
    assert refr.any() and (~refr).any()  # both lobes exercised
    wi_z = np.asarray(s.wi)[:, 2]
    ok = np.asarray(s.pdf) > 0
    assert (wi_z[refr & ok] < 0).all()  # transmitted below surface
    assert (wi_z[~refr & ok] > 0).all()
    np.testing.assert_allclose(np.asarray(s.eta)[refr], 1.5, atol=1e-5)


def test_delta_ggx_mirror(rng):
    n = 256
    mat = _mat(B.ggx_conductor((0.01, 0.01, 0.01), (8.0, 8.0, 8.0), 0.0, 0.0, 0.0), n)
    u1, u2, uc = _uniforms(n, rng)
    wo = _wo(n, 0.7)
    s = B.sample_bsdf(mat, wo, _up(n), _up(n), u1, u2, uc)
    assert np.asarray(s.delta).all()
    # mirror direction
    expected = np.asarray(vm.reflect(wo, _up(n)))
    np.testing.assert_allclose(np.asarray(s.wi), expected, atol=1e-5)
    # delta lobes never appear in eval
    f, pdf = B.eval_bsdf(mat, wo, s.wi, _up(n), _up(n))
    assert (np.asarray(pdf) == 0).all()
