"""Mesh import goldens (reference core-mesh-parser.cpp capability):
binary FBX 7.x, ASCII FBX, OBJ — on the bundled assets."""

import os

import numpy as np
import pytest

from cuda_optix_pathtracing_tpu.scene import meshio

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def test_sphere_fbx_golden():
    tris, uvs, ns = meshio.load_fbx_full(os.path.join(SCENES, "sphere.fbx"))
    assert tris.shape == (480, 3, 3)  # reference import yields 480 tris
    assert uvs is not None and uvs.shape == (480, 3, 2)
    assert ns is not None and ns.shape == (480, 3, 3)
    # authored normals are unit and roughly radial for a unit sphere
    n = ns.reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
    c = tris.reshape(-1, 3).mean(axis=0)
    r = tris.reshape(-1, 3) - c
    r /= np.maximum(np.linalg.norm(r, axis=1, keepdims=True), 1e-9)
    cos = np.abs(np.sum(r * n, axis=1))
    # corner-mean center estimate is rough near the poles — median radial
    assert np.median(cos) > 0.98 and cos.min() > 0.5


def test_teapot_fbx_golden():
    tris, uvs, ns = meshio.load_fbx_full(
        os.path.join(SCENES, "res", "fbx", "teapot.fbx")
    )
    assert tris.shape == (9216, 3, 3)  # reference import yields 9216 tris
    assert ns is not None and ns.shape == (9216, 3, 3)
    assert np.isfinite(tris).all()


def test_teapot_ascii_fbx_is_corrupt_upstream():
    """The reference's own teapot-ascii.fbx contains a malformed float
    literal ("0.6351.18075633049011") in its Vertices array; the loader
    must fail with a clear diagnosis, not an IndexError."""
    with pytest.raises(ValueError, match="malformed number"):
        meshio.load_fbx_full(
            os.path.join(SCENES, "res", "fbx", "teapot-ascii.fbx")
        )


def test_ascii_fbx_wellformed(tmp_path):
    """A well-formed ASCII FBX parses (quad → 2 fan triangles)."""
    p = tmp_path / "quad.fbx"
    p.write_text(
        "; FBX 7.3.0 project file\n"
        "Objects: {\n"
        "  Geometry: 123, \"Geometry::quad\", \"Mesh\" {\n"
        "    Vertices: *12 {\n"
        "      a: 0,0,0, 1,0,0, 1,1,0, 0,1,0\n"
        "    }\n"
        "    PolygonVertexIndex: *4 {\n"
        "      a: 0,1,2,-4\n"
        "    }\n"
        "  }\n"
        "}\n"
    )
    tris, uvs, ns = meshio.load_fbx_full(str(p))
    assert tris.shape == (2, 3, 3)
    np.testing.assert_allclose(tris[0][0], [0, 0, 0])
    np.testing.assert_allclose(tris[1][2], [0, 1, 0])


def test_obj_roundtrip(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
    )
    tris, uvs, ns = meshio.load_obj_full(str(p))
    assert tris.shape == (2, 3, 3)  # quad fan → 2 tris
    assert uvs.shape == (2, 3, 2)
    assert ns.shape == (2, 3, 3)
    np.testing.assert_allclose(ns, np.broadcast_to([0, 0, 1.0], (2, 3, 3)))


def test_obj_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    tris = meshio.load_obj(str(p))
    assert tris.shape == (1, 3, 3)
    np.testing.assert_allclose(tris[0][1], [1, 0, 0])
