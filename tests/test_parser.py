"""JSON scene parser end-to-end on the bundled scenes
(reference core-parser.cpp:1344 schema) + shading-normal plumbing."""

import os

import numpy as np
import pytest

from cuda_optix_pathtracing_tpu.scene.parser import (
    SceneParseError,
    load_scene,
    parse_scene,
)

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def test_scene_example_parses():
    scene, parsed = load_scene(os.path.join(SCENES, "scene_example.json"))
    assert parsed.width == 256 and parsed.height == 256
    assert scene.num_triangles == 12  # one cube instance
    assert scene.num_lights >= 1


def test_fbx_example_parses_with_normals():
    scene, parsed = load_scene(os.path.join(SCENES, "fbx_example.json"))
    assert scene.num_triangles == 480
    # FBX authored normals survive transform + BVH-less path
    assert scene.tri_ns is not None
    n = np.asarray(scene.tri_ns).reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)


def test_scene_test_parses_fast_and_textured():
    import time

    t0 = time.perf_counter()
    scene, parsed = load_scene(os.path.join(SCENES, "scene_test.json"))
    dt = time.perf_counter() - t0
    assert scene.num_triangles > 10_000  # instanced teapots + floor
    assert scene.textures is not None  # chippedPaint maps resolved
    assert scene.tri_uv is not None
    assert scene.bvh is not None  # above BVH_THRESHOLD
    assert dt < 15.0, f"scene_test.json load took {dt:.1f}s"  # VERDICT r2 #6
    # world transforms actually moved the instances apart
    v0 = np.asarray(scene.tri_v0)
    valid = np.isfinite(v0).all(axis=1)
    assert (v0[valid].max(0) - v0[valid].min(0)).max() > 1.0


def test_unknown_key_raises():
    import json

    doc = {"camera": {"focalLength": 20, "bogus-key": 1}}
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as f:
        json.dump(doc, f)
        path = f.name
    with pytest.raises(SceneParseError, match="bogus-key"):
        parse_scene(path)
    os.unlink(path)


def test_fbx_example_renders_nonenv(tmp_path):
    """End-to-end: the sphere occupies pixels and specular highlights
    appear (catches silent all-miss regressions)."""
    import dataclasses

    import jax

    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render,
    )
    from cuda_optix_pathtracing_tpu.scene.types import scene_from_host

    hs, parsed = parse_scene(os.path.join(SCENES, "fbx_example.json"))
    hs.camera = dataclasses.replace(hs.camera, width=64, height=64)
    scene = scene_from_host(hs)
    cfg = MegakernelConfig(max_depth=2, remat=False, backend="xla")
    film = render(scene, 64, 64, 2, cfg=cfg, kspp=2)
    img = np.asarray(film.mean)
    assert np.isfinite(img).all()
    nonenv = (np.abs(img - 0.05).max(-1) > 0.005).sum()
    assert nonenv > 200  # sphere covers a good chunk of the frame
