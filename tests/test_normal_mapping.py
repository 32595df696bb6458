"""Normal mapping: tangent-space perturbation of the shading normal
(reference materialShadingNormal, core-material.cpp:403; remap
core-texture.h:188-290)."""

import numpy as np
import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    _normal_mapped,
    _shading_normal,
    render,
)
from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import lights as L
from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
from cuda_optix_pathtracing_tpu.ops.intersect import intersect_closest
from cuda_optix_pathtracing_tpu.ops.gather import onehot_gather
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host


def _plane_scene(tilt_xy, with_map=True):
    """Ground plane (z = 0, facing +z) with a CONSTANT normal map that
    tilts the normal by (tx, ty) in tangent space."""
    hs = HostScene()
    hs.camera = CameraConfig(
        width=32, height=32, position=(0.0, -0.01, 2.5),
        direction=(0.0, 0.004, -1.0),
    )
    quad = [
        np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0]], np.float32),
        np.array([[-2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32),
    ]
    uvs = [
        np.array([[0, 0], [1, 0], [1, 1]], np.float32),
        np.array([[0, 0], [1, 1], [0, 1]], np.float32),
    ]
    hs.add_model(quad, 0, uvs=uvs)
    tx, ty = tilt_xy
    tz = float(np.sqrt(max(1.0 - tx * tx - ty * ty, 0.0)))
    texel = (np.array([tx, ty, tz], np.float32) + 1.0) / 2.0
    tex = np.broadcast_to(texel, (8, 8, 3)).copy()
    tid = hs.add_texture(tex)
    mat = B.oren_nayar((0.8, 0.8, 0.8), 0.0)
    if with_map:
        mat["normal_tex"] = tid
    hs.materials = [mat]
    hs.lights = [L.point_light((20.0, 20.0, 20.0), (1.5, 1.5, 2.0), 1e-3)]
    return scene_from_host(hs)


def _first_hits(scene, n=32):
    rng = np.random.default_rng(0)
    target = np.concatenate(
        [rng.uniform(-1.5, 1.5, (n, 2)), np.zeros((n, 1))], axis=1
    )
    o = np.broadcast_to(np.array([0.0, -0.01, 2.5]), (n, 3)).astype(np.float32)
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return intersect_closest(
        jnp.asarray(o), jnp.asarray(d),
        scene.tri_v0, scene.tri_e0, scene.tri_e1,
    )


def test_normal_map_matches_analytic_tilt():
    """For a +z plane with identity-aligned UVs, a tangent-space texel
    (tx, ty, tz) must produce exactly the world normal (±tx, ±ty, tz)
    with the sign fixed by the UV-derived tangent frame — here UVs align
    +u→+x, +v→+y, so the map is the identity rotation."""
    tilt = (0.4, 0.2)
    scene = _plane_scene(tilt)
    hit = _first_hits(scene)
    assert bool(np.asarray(hit.hit).all())
    ns = _shading_normal(scene, hit)
    mat = scene.materials.gather(onehot_gather(scene.tri_mat, hit.tri))
    n_pert = np.asarray(
        _normal_mapped(scene, mat, hit, ns, jnp.zeros(hit.u.shape[0]))
    )
    tz = np.sqrt(1.0 - tilt[0] ** 2 - tilt[1] ** 2)
    expect = np.array([tilt[0], tilt[1], tz], np.float32)
    np.testing.assert_allclose(n_pert, np.broadcast_to(expect, n_pert.shape),
                               atol=2e-2)


def test_normal_map_changes_render():
    """The same scene with/without its normal map renders measurably
    differently (lighting responds to the perturbed normal), and the
    normal-mapped render is darker on the side tilted away from the
    light exactly as an analytically-tilted plane would be."""
    cfg = MegakernelConfig(max_depth=2, remat=False, backend="xla",
                           pixel_order="linear")
    img_flat = np.asarray(
        render(_plane_scene((0.0, 0.0)), 32, 32, 8, cfg=cfg).mean
    )
    img_map = np.asarray(
        render(_plane_scene((0.5, 0.0)), 32, 32, 8, cfg=cfg).mean
    )
    # the flat map (0,0,1) must be a no-op vs no texture at all
    img_none = np.asarray(
        render(_plane_scene((0.0, 0.0), with_map=False), 32, 32, 8, cfg=cfg).mean
    )
    np.testing.assert_allclose(img_flat, img_none, atol=1e-5)
    # a +x tilt turns the surface TOWARD the light at (1.5, 1.5, 2.0)
    # for the bulk of the plane (x < light.x) → mean brightness rises
    delta = img_map.mean() - img_flat.mean()
    assert abs(img_map - img_flat).max() > 0.05
    assert delta > 0.0
