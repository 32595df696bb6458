"""Instancing: shared-base-mesh ray-transform traversal (reference
Instance + per-instance BVH/TLAS, core-trianglemesh.h:84-99,
core-bvh-builder.cpp:225-498 — re-imagined as a per-instance
object-space traversal loop; Scene.instances docs)."""

import json

import numpy as np
import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_sample_batch,
)
from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import lights as L
from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
from cuda_optix_pathtracing_tpu.scene.parser import load_scene
from cuda_optix_pathtracing_tpu.scene.procedural import generate_sphere
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host

CFG = dict(remat=False, backend="xla", pixel_order="linear")


def _grid_transforms(n_side=4, spacing=1.2, z=0.0):
    mats = []
    for i in range(n_side):
        for j in range(n_side):
            m = np.eye(4, dtype=np.float32)
            m[0, 3] = (i - (n_side - 1) / 2.0) * spacing
            m[1, 3] = 3.0 + j * spacing
            m[2, 3] = z
            mats.append(m)
    return np.stack(mats)


def _base_scene(instanced: bool):
    tris = np.stack(generate_sphere((0.0, 0.0, 0.0), 0.45, 6, 12))
    mats = _grid_transforms()
    hs = HostScene()
    hs.camera = CameraConfig(width=32, height=32)
    if instanced:
        hs.add_model(list(tris), 0)
        hs.instance_transforms = mats
    else:
        from cuda_optix_pathtracing_tpu.native import transform_tris

        for m in mats:
            hs.add_model(list(transform_tris(tris, m)), 0)
    hs.materials = [B.oren_nayar((0.8, 0.6, 0.4), 0.4)]
    hs.lights = [L.point_light((40.0, 40.0, 40.0), (0.0, 1.0, 3.0), 1e-3)]
    return scene_from_host(hs, use_bvh=True)


def test_sixteen_instances_one_mesh_of_memory():
    """16 placements cost ONE base mesh (+BVH): the triangle arrays of
    the instanced scene are 16× smaller than the baked equivalent."""
    s_inst = _base_scene(True)
    s_bake = _base_scene(False)
    assert s_inst.instances is not None
    assert s_inst.instances.world_from_obj.shape[0] == 16
    assert s_bake.tri_v0.shape[0] >= 10 * s_inst.tri_v0.shape[0]


def test_instanced_render_matches_baked():
    """The instanced traversal renders the same image as the baked scene
    (same geometry, same estimator — only the intersection plumbing
    differs)."""
    import jax

    w = h = 32
    cfg = MegakernelConfig(max_depth=2, **CFG)
    # scenes built OUTSIDE jit (argument path): constant folding must
    # not mask precision bugs in the transform pipeline (r5 bf16 matmul
    # finding, docs/quality.md)
    f = jax.jit(lambda s: render_sample_batch(s, cfg, w, h, jnp.uint32(0)))
    a = np.asarray(f(_base_scene(True)))
    b = np.asarray(f(_base_scene(False)))
    assert np.isfinite(a).all()
    assert a.max() > 0.01  # spheres are actually lit/visible
    # identical estimator, fp-level intersection differences only
    assert np.abs(a - b).mean() < 1e-4
    assert (np.abs(a - b).max(-1) > 1e-2).mean() < 0.01


def test_instanced_rotation_scale():
    """Non-uniform placements: rotated + scaled instances intersect and
    shade consistently with the baked version (exercises the
    inverse-transpose normal transform and shared-t parameterization)."""
    import jax

    tris = np.stack(generate_sphere((0.0, 0.0, 0.0), 0.5, 6, 12))
    mats = []
    rng = np.random.default_rng(0)
    for k in range(4):
        ang = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array(
            [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32
        ) * (0.6 + 0.3 * k)
        m[:3, 3] = (k - 1.5, 3.0, 0.0)
        mats.append(m)

    def mk(instanced):
        hs = HostScene()
        hs.camera = CameraConfig(width=24, height=24)
        if instanced:
            hs.add_model(list(tris), 0)
            hs.instance_transforms = np.stack(mats)
        else:
            from cuda_optix_pathtracing_tpu.native import transform_tris

            for m in mats:
                hs.add_model(list(transform_tris(tris, m)), 0)
        hs.materials = [B.oren_nayar((0.7, 0.7, 0.7), 0.2)]
        hs.lights = [L.point_light((30.0, 30.0, 30.0), (1.0, 0.5, 2.0), 1e-3)]
        return scene_from_host(hs, use_bvh=True)

    cfg = MegakernelConfig(max_depth=2, **CFG)
    f = jax.jit(lambda s: render_sample_batch(s, cfg, 24, 24, jnp.uint32(0)))
    a = np.asarray(f(mk(True)))
    b = np.asarray(f(mk(False)))
    assert np.abs(a - b).mean() < 1e-4


def test_parser_world_instances_without_duplication(tmp_path):
    """A world section placing ONE object under many transforms loads the
    mesh once and fills Scene.instances (no triangle duplication)."""
    doc = {
        "camera": {},
        "film": {"resolutionX": 16, "resolutionY": 16},
        "materials": [{"name": "white", "diffuse": [0.8, 0.8, 0.8]}],
        "objects": [
            {"name": "ball", "type": "primitive", "shape": "sphere",
             "material": "white"},
        ],
        "lights": [],
        "transforms": [
            {"name": f"t{k}", "srt": {"translation-vector": [k, 3, 0]}}
            for k in range(4)
        ],
        "world": {f"t{k}": {"instances": ["ball"]} for k in range(4)},
    }
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(doc))
    scene, _ = load_scene(str(p))
    assert scene.instances is not None
    assert scene.instances.world_from_obj.shape[0] == 4
    base = np.stack(generate_sphere((0.0, 0.0, 0.0), 0.5, 8, 16)).shape[0]
    # one base mesh only (possibly BVH-padded, never 4x)
    assert scene.tri_v0.shape[0] < 2 * base


def test_multi_mesh_groups_match_baked():
    """r5 (VERDICT r4 next-4): TWO distinct base meshes x several
    instances each, PLUS baked geometry, render identically to the
    fully-baked scene. Exercises per-mesh BVH tables, global tri-index
    offsets, the per-instance world-AABB cull and sorted dispatch."""
    import jax

    sph = np.stack(generate_sphere((0.0, 0.0, 0.0), 0.5, 6, 12))
    # mesh 2: a unit tetrahedron
    tet = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[0, 0, 0], [1, 0, 0], [0, 0, 1]],
            [[0, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        ],
        np.float32,
    )
    floor = np.array(
        [
            [[-4, -0.6, -4], [4, -0.6, -4], [4, -0.6, 6]],
            [[-4, -0.6, -4], [4, -0.6, 6], [-4, -0.6, 6]],
        ],
        np.float32,
    )

    def mats_at(positions, scale=1.0):
        out = []
        for p in positions:
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] *= scale
            m[:3, 3] = p
            out.append(m)
        return np.stack(out)

    sph_mats = mats_at([(-1.2, 2.6, 0), (1.2, 2.6, 0), (0, 3.8, 0)])
    tet_mats = mats_at([(-1.5, 1.2, 0.5), (1.0, 1.2, 0.5)], scale=0.8)

    def mk(grouped):
        hs = HostScene()
        hs.camera = CameraConfig(width=24, height=24)
        hs.materials = [
            B.oren_nayar((0.8, 0.6, 0.4), 0.4),
            B.oren_nayar((0.4, 0.6, 0.8), 0.2),
            B.oren_nayar((0.7, 0.7, 0.7), 0.5),
        ]
        hs.lights = [
            L.point_light((40.0, 40.0, 40.0), (0.0, 1.0, 3.0), 1e-3)
        ]
        if grouped:
            hs.add_model(list(floor), 2)  # baked geometry coexists
            hs.add_instance_group(sph, 0, sph_mats)
            hs.add_instance_group(tet, 1, tet_mats)
        else:
            from cuda_optix_pathtracing_tpu.native import transform_tris

            hs.add_model(list(floor), 2)
            for m in sph_mats:
                hs.add_model(list(transform_tris(sph, m)), 0)
            for m in tet_mats:
                hs.add_model(list(transform_tris(tet, m)), 1)
        return scene_from_host(hs, use_bvh=True)

    s_g = mk(True)
    assert s_g.instances is not None
    assert s_g.instances.world_from_obj.shape[0] == 6  # identity + 3 + 2
    # memory: global arrays hold each mesh ONCE
    assert s_g.tri_v0.shape[0] < mk(False).tri_v0.shape[0] / 1.5

    cfg = MegakernelConfig(max_depth=2, **CFG)
    import jax

    f = jax.jit(lambda s: render_sample_batch(s, cfg, 24, 24, jnp.uint32(0)))
    a = np.asarray(f(mk(True)))
    b = np.asarray(f(mk(False)))
    assert np.isfinite(a).all()
    assert a.max() > 0.01
    assert np.abs(a - b).mean() < 1e-4
    assert (np.abs(a - b).max(-1) > 1e-2).mean() < 0.01


def test_group_restrictions_raise():
    """Emissive materials / textures are explicit errors in grouped
    scenes (NEE would sample object-space geometry)."""
    import pytest

    sph = np.stack(generate_sphere((0.0, 0.0, 0.0), 0.5, 4, 8))
    hs = HostScene()
    hs.camera = CameraConfig(width=8, height=8)
    hs.materials = [B.diffuse_light((5.0, 5.0, 5.0))]
    hs.add_instance_group(sph, 0, np.stack([np.eye(4, dtype=np.float32)]))
    with pytest.raises(ValueError, match="emissive"):
        scene_from_host(hs, use_bvh=False)


def test_parser_mixed_instanced_and_baked_world(tmp_path):
    """r5: a world that places one object under 4 transforms AND another
    object once gets an instance group for the repeated object and bakes
    the singleton — the grouped build's identity-instance carries the
    baked geometry."""
    doc = {
        "camera": {},
        "film": {"resolutionX": 16, "resolutionY": 16},
        "materials": [{"name": "white", "diffuse": [0.8, 0.8, 0.8]}],
        "objects": [
            {"name": "ball", "type": "primitive", "shape": "sphere",
             "material": "white"},
            {"name": "slab", "type": "primitive", "shape": "cube",
             "material": "white"},
        ],
        "lights": [],
        "transforms": [
            {"name": f"t{k}", "srt": {"translation-vector": [k, 3, 0]}}
            for k in range(4)
        ] + [{"name": "tslab", "srt": {"translation-vector": [0, 0, 0]}}],
        "world": {
            **{f"t{k}": {"instances": ["ball"]} for k in range(4)},
            "tslab": {"instances": ["slab"]},
        },
    }
    p = tmp_path / "mixed.json"
    p.write_text(json.dumps(doc))
    scene, _ = load_scene(str(p))
    assert scene.instances is not None
    # 4 ball placements + 1 identity instance for the baked slab
    assert scene.instances.world_from_obj.shape[0] == 5
    ball = np.stack(generate_sphere((0.0, 0.0, 0.0), 0.5, 8, 16)).shape[0]
    # global arrays: one ball mesh + one cube (12 tris), never 4 balls
    assert scene.tri_v0.shape[0] < 2 * ball
