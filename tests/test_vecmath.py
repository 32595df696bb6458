import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import vecmath as vm


def test_normalize_unit(rng):
    v = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(vm.length(n)), 1.0, atol=1e-5)


def test_normalize_zero_safe():
    n = vm.normalize(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(n)))


def test_gram_schmidt_orthonormal(rng):
    n = vm.normalize(jnp.asarray(rng.normal(size=(128, 3)), jnp.float32))
    t, b = vm.gram_schmidt(n)
    np.testing.assert_allclose(np.asarray(vm.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(b, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(t)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(b)), 1.0, atol=1e-5)
    # near-diagonal normals exercise the second branch
    nd = vm.normalize(jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32))
    t2, b2 = vm.gram_schmidt(nd)
    assert np.isfinite(np.asarray(t2)).all() and abs(float(vm.length(t2)[0]) - 1) < 1e-5
    assert abs(float(vm.dot(t2, nd)[0])) < 1e-5 and abs(float(vm.dot(b2, nd)[0])) < 1e-5


def test_reflect():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vm.normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    r = vm.reflect(wo, n)
    np.testing.assert_allclose(np.asarray(r[0]), [-wo[0, 0], 0.0, wo[0, 2]], atol=1e-6)


def test_face_forward():
    n = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    f = vm.face_forward(n, v)
    assert f[0, 2] == -1.0 and f[1, 2] == 1.0


def test_offset_ray_origin_moves_off_surface():
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    err = jnp.full((1, 3), 1e-5)
    ng = jnp.asarray([[0.0, 0.0, 1.0]])
    up = vm.offset_ray_origin(p, err, ng, jnp.asarray([[0.0, 0.0, 1.0]]))
    dn = vm.offset_ray_origin(p, err, ng, jnp.asarray([[0.0, 0.0, -1.0]]))
    assert float(up[0, 2]) > 3.0
    assert float(dn[0, 2]) < 3.0


def test_smoothstep_edges():
    assert float(vm.smoothstep(0.0, 1.0, -1.0)) == 0.0
    assert float(vm.smoothstep(0.0, 1.0, 2.0)) == 1.0
    assert abs(float(vm.smoothstep(0.0, 1.0, 0.5)) - 0.5) < 1e-6


def test_transform_point_translation():
    m = vm.make_translation([1.0, 2.0, 3.0])
    p = vm.transform_point(m, jnp.asarray([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [1.0, 2.0, 3.0])
