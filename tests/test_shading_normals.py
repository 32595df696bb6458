"""Shading normals: barycentric interpolation + alignment in the
integrator (reference computeSmoothNormals + ns/ng split,
core-trianglemesh.cpp, core-render.cpp:183-269)."""

import numpy as np
import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    _shading_normal,
    render,
)
from cuda_optix_pathtracing_tpu.ops.intersect import intersect_closest
from cuda_optix_pathtracing_tpu.scene.procedural import generate_sphere
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host
from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import lights as L
from cuda_optix_pathtracing_tpu.native import smooth_normals


def _sphere_scene(with_normals: bool):
    from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig

    hs = HostScene()
    hs.camera = CameraConfig(width=48, height=48)
    tris = np.stack(generate_sphere((0.0, 2.0, 0.0), 0.8, 8, 16))
    ns = smooth_normals(tris) if with_normals else None
    hs.add_model(list(tris), 0, normals=(list(ns) if ns is not None else None))
    hs.materials = [B.oren_nayar((0.7, 0.7, 0.7), 0.0)]
    hs.lights = [L.point_light((6.0, 6.0, 6.0), (1.5, 0.2, 1.5), 1e-3)]
    return scene_from_host(hs)


def test_interpolated_normal_matches_analytic_sphere():
    """At hit points on a coarse sphere, the interpolated shading normal is
    much closer to the analytic radial normal than the facet normal is."""
    scene = _sphere_scene(True)
    n = 64
    rng = np.random.default_rng(3)
    # rays from origin toward the sphere at (0,2,0)
    target = rng.normal(size=(n, 3)) * 0.25 + np.array([0.0, 2.0, 0.0])
    o = np.zeros((n, 3), np.float32)
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit = intersect_closest(
        jnp.asarray(o), jnp.asarray(d), scene.tri_v0, scene.tri_e0,
        scene.tri_e1,
    )
    assert bool(np.asarray(hit.hit).all())
    ns = np.asarray(_shading_normal(scene, hit))
    ng = np.asarray(hit.normal)
    pos = np.asarray(hit.pos)
    radial = pos - np.array([0.0, 2.0, 0.0])
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    # hit.normal is flipped toward the incident ray → compare |cos|
    cos_s = np.abs(np.sum(ns * radial, axis=1))
    cos_g = np.abs(np.sum(ng * radial, axis=1))
    assert cos_s.mean() > cos_g.mean()  # strictly better than faceted
    assert cos_s.min() > 0.995  # 8×16 sphere: interpolation ≈ analytic
    # unit length
    np.testing.assert_allclose(np.linalg.norm(ns, axis=1), 1.0, atol=1e-5)


def test_flat_scene_passthrough():
    """Scenes without authored normals shade exactly as before (ns = ng)."""
    scene = _sphere_scene(False)
    assert scene.tri_ns is None
    n = 8
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    hit = intersect_closest(
        jnp.asarray(o), jnp.asarray(d), scene.tri_v0, scene.tri_e0,
        scene.tri_e1,
    )
    ns = _shading_normal(scene, hit)
    np.testing.assert_array_equal(np.asarray(ns), np.asarray(hit.normal))


def test_smooth_render_differs_and_is_finite():
    cfg = MegakernelConfig(max_depth=2, remat=False, backend="xla")
    img_s = np.asarray(
        render(_sphere_scene(True), 48, 48, 2, cfg=cfg, kspp=2).mean
    )
    img_f = np.asarray(
        render(_sphere_scene(False), 48, 48, 2, cfg=cfg, kspp=2).mean
    )
    assert np.isfinite(img_s).all() and np.isfinite(img_f).all()
    assert np.abs(img_s - img_f).max() > 1e-3  # shading actually changed
