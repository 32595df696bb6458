"""Render the EWA-vs-trilinear comparison pair for docs/quality.md:
a checkerboard ground plane viewed at a grazing angle. EWA keeps the
check contrast far into the distance where trilinear's isotropic
footprint has blurred to gray (reference EWAFormula's motivating case,
core-texture.cu:563-731).

Run: PYTHONPATH=/root/repo python scripts/ewa_compare.py
"""
import numpy as np
import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render,
)
from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import lights as L
from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
from cuda_optix_pathtracing_tpu.ops.film import srgb_encode, to_uint8
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host
from cuda_optix_pathtracing_tpu.utils.imageio import write_png


def checker_scene(w, h):
    hs = HostScene()
    # camera low above the plane looking forward: grazing view
    hs.camera = CameraConfig(
        width=w, height=h, position=(0.0, 0.0, 0.35),
        direction=(0.0, 1.0, -0.12),
    )
    quad = [
        np.array([[-8, 0, 0], [8, 0, 0], [8, 40, 0]], np.float32),
        np.array([[-8, 0, 0], [8, 40, 0], [-8, 40, 0]], np.float32),
    ]
    uvs = [
        np.array([[0, 0], [16, 0], [16, 40]], np.float32),
        np.array([[0, 0], [16, 40], [0, 40]], np.float32),
    ]
    hs.add_model(quad, 0, uvs=uvs)
    checker = np.zeros((64, 64, 3), np.float32)
    checker[:32, :32] = checker[32:, 32:] = 0.9
    checker[:32, 32:] = checker[32:, :32] = 0.08
    tid = hs.add_texture(checker)
    mat = B.oren_nayar((1.0, 1.0, 1.0), 0.0)
    mat["albedo_tex"] = tid
    hs.materials = [mat]
    hs.lights = [L.point_light((900.0, 900.0, 900.0), (0.0, 10.0, 14.0), 1e-3)]
    hs.env_color = (0.15, 0.15, 0.18)
    return scene_from_host(hs)


def main():
    w = h = 192
    scene = checker_scene(w, h)
    for filt in ("trilinear", "ewa"):
        cfg = MegakernelConfig(
            max_depth=1, remat=False, texture_filter=filt,
            pixel_order="linear",
        )
        film = render(scene, w, h, 32, cfg=cfg, kspp=32)
        img = np.asarray(to_uint8(srgb_encode(film.mean)))
        out = f"docs/ewa_{filt}.png"
        write_png(out, img)
        print("wrote", out)


if __name__ == "__main__":
    main()
