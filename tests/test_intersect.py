import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import intersect as I


def _tri_arrays(tris):
    """tris: list of (p0,p1,p2) → v0,e0,e1 SoA."""
    p = np.asarray(tris, np.float32)  # (T,3,3)
    v0 = p[:, 0]
    e0 = p[:, 1] - p[:, 0]
    e1 = p[:, 2] - p[:, 0]
    return jnp.asarray(v0), jnp.asarray(e0), jnp.asarray(e1)


def test_single_triangle_hit_and_miss():
    v0, e0, e1 = _tri_arrays([[(0, 0, 0), (1, 0, 0), (0, 1, 0)]])
    o = jnp.asarray([[0.2, 0.2, -1.0], [2.0, 2.0, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    h = I.intersect_closest(o, d, v0, e0, e1)
    assert bool(h.hit[0]) and not bool(h.hit[1])
    assert abs(float(h.t[0]) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(h.pos[0]), [0.2, 0.2, 0.0], atol=1e-5)
    # normal flipped against the ray (+z ray → normal has -z)
    assert float(h.normal[0, 2]) < 0.0


def test_closest_of_two():
    v0, e0, e1 = _tri_arrays(
        [
            [(0, 0, 5), (1, 0, 5), (0, 1, 5)],
            [(0, 0, 2), (1, 0, 2), (0, 1, 2)],
        ]
    )
    o = jnp.asarray([[0.1, 0.1, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h = I.intersect_closest(o, d, v0, e0, e1)
    assert bool(h.hit[0]) and int(h.tri[0]) == 1
    assert abs(float(h.t[0]) - 2.0) < 1e-5


def test_degenerate_triangle_rejected():
    v0, e0, e1 = _tri_arrays([[(0, 0, 0), (0, 0, 0), (0, 0, 0)]])
    o = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h = I.intersect_closest(o, d, v0, e0, e1)
    assert not bool(h.hit[0])


def test_tmin_cutoff_self_intersection():
    v0, e0, e1 = _tri_arrays([[(0, 0, 0), (1, 0, 0), (0, 1, 0)]])
    # origin exactly on the triangle: t=0 rejected by t > 1e-4
    o = jnp.asarray([[0.2, 0.2, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h = I.intersect_closest(o, d, v0, e0, e1)
    assert not bool(h.hit[0])


def test_any_hit_occlusion():
    v0, e0, e1 = _tri_arrays([[(-5, -5, 1), (5, -5, 1), (0, 5, 1)]])
    o = jnp.zeros((2, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], jnp.float32)
    occ = I.intersect_any(o, d, v0, e0, e1, t_max=10.0)
    assert bool(occ[0]) and not bool(occ[1])
    # occluder beyond t_max does not block
    occ2 = I.intersect_any(o, d, v0, e0, e1, t_max=0.5)
    assert not bool(occ2[0])


def test_many_rays_chunked_padding(rng):
    # 300 triangles (not a multiple of chunk), 64 rays
    tris = []
    for i in range(300):
        z = 1.0 + i * 0.01
        tris.append([(-10, -10, z), (10, -10, z), (0, 10, z)])
    v0, e0, e1 = _tri_arrays(tris)
    o = jnp.asarray(np.c_[rng.random(64) - 0.5, rng.random(64) - 0.5, np.zeros(64)], jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (64, 1))
    h = I.intersect_closest(o, d, v0, e0, e1, chunk=128)
    assert np.asarray(h.hit).all()
    # closest plane is the first one
    assert (np.asarray(h.tri) == 0).all()
    np.testing.assert_allclose(np.asarray(h.t), 1.0, atol=1e-4)
