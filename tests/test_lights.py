import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import lights as L


def _gather(light_dict, n):
    lt = L.make_light_table([light_dict])
    return lt.gather(jnp.zeros((n,), jnp.int32))


def _setup(n, rng):
    pos = jnp.asarray(np.tile([[0.0, 0.0, 0.0]], (n, 1)), jnp.float32)
    normal = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
    u = rng.random((2, n)).astype(np.float32)
    return pos, normal, jnp.asarray(u[0]), jnp.asarray(u[1])


def test_point_light_direction_and_falloff(rng):
    n = 1024
    lt = _gather(L.point_light((3.0, 3.0, 3.0), (0.0, 0.0, 2.0), 1e-3), n)
    pos, normal, u1, u2 = _setup(n, rng)
    ht = jnp.zeros((n,), bool)
    ls = L.sample_light(lt, pos, u1, u2, ht, normal)
    d = np.asarray(ls.direction)
    np.testing.assert_allclose(d[:, 2], 1.0, atol=1e-2)  # points up at light
    np.testing.assert_allclose(np.asarray(ls.distance), 2.0, atol=2e-3)
    le = np.asarray(L.eval_light(lt, ls))
    np.testing.assert_allclose(le[:, 0], 3.0 / 4.0, rtol=1e-2)
    # tiny radius at distance 2 → effectively delta
    assert np.asarray(ls.delta).all()
    assert (np.asarray(ls.pdf) == 1.0).all()


def test_point_light_soft_when_radius_large(rng):
    n = 4096
    lt = _gather(L.point_light((1.0, 1.0, 1.0), (0.0, 0.0, 2.0), 0.5), n)
    pos, normal, u1, u2 = _setup(n, rng)
    ls = L.sample_light(lt, pos, u1, u2, jnp.zeros((n,), bool), normal)
    assert not np.asarray(ls.delta).any()
    # directions spread within the sphere cone: cos to axis ≥ sqrt(1-(r/d)²)
    cos_axis = np.asarray(ls.direction)[:, 2]
    assert (cos_axis >= np.sqrt(1 - 0.0625) - 1e-3).all()
    assert np.asarray(ls.distance).std() > 1e-3  # distances vary on sphere


def test_spot_light_cone_attenuation(rng):
    n = 4
    lt = _gather(
        L.spot_light((1.0, 1.0, 1.0), (0.0, 0.0, 2.0), (0.0, 0.0, -1.0),
                     np.cos(np.pi / 6), np.cos(np.pi / 3), 1e-3),
        n,
    )
    # points: directly below (inside cone), far to the side (outside)
    pos = jnp.asarray(
        [[0.0, 0.0, 0.0], [5.0, 0.0, 1.9], [0.5, 0.0, 0.0], [0.0, 0.0, 0.0]],
        jnp.float32,
    )
    normal = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
    u = rng.random((2, n)).astype(np.float32)
    ls = L.sample_light(lt, pos, jnp.asarray(u[0]), jnp.asarray(u[1]),
                        jnp.zeros((n,), bool), normal)
    f = np.asarray(ls.factor)
    assert f[0] > 0.99  # straight down: full intensity
    assert np.asarray(ls.pdf)[1] == 0.0 or f[1] == 0.0  # sideways: cut off


def test_env_light_uniform(rng):
    n = 2048
    lt = _gather(L.environment_light((0.5, 0.5, 0.5)), n)
    pos, normal, u1, u2 = _setup(n, rng)
    ls = L.sample_light(lt, pos, u1, u2, jnp.zeros((n,), bool), normal)
    np.testing.assert_allclose(np.asarray(ls.pdf), 1.0 / (4 * np.pi), rtol=1e-5)
    le = np.asarray(L.eval_light(lt, ls))
    np.testing.assert_allclose(le, 0.5, atol=1e-6)  # no distance falloff
    assert (np.asarray(ls.distance) > 1e30).all()


def test_directional_light(rng):
    n = 256
    lt = _gather(L.directional_light((2.0, 2.0, 2.0), (0.0, 0.0, -1.0), 0.0), n)
    pos, normal, u1, u2 = _setup(n, rng)
    ls = L.sample_light(lt, pos, u1, u2, jnp.zeros((n,), bool), normal)
    # shading point → light is opposite the light's travel direction
    np.testing.assert_allclose(np.asarray(ls.direction)[:, 2], 1.0, atol=1e-6)
    assert np.asarray(ls.delta).all()
    le = np.asarray(L.eval_light(lt, ls))
    np.testing.assert_allclose(le, 2.0, atol=1e-6)


def test_eval_infinite():
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 4, jnp.float32)
    le, pdf = L.eval_infinite_light(jnp.asarray([0.1, 0.2, 0.3]), d)
    np.testing.assert_allclose(np.asarray(le)[0], [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi), atol=1e-7)
