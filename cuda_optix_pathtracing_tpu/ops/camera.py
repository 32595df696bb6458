"""Perspective camera (reference: cuda-core/private/extra_math.cu:43-97).

Conventions (matched to the reference for image parity):
- raster origin top-left, pixel centers at +0.5
- physical sensor model: focal length and sensor height in millimetres,
  sensor width derived from aspect; camera looks down +z in camera space
- world: +z up; ``world_from_camera`` builds (right, up, forward) with
  right = normalize(forward × worldUp)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .vecmath import normalize, transform_point, transform_vector


@dataclass(frozen=True)
class CameraConfig:
    position: tuple = (0.0, 0.0, 0.0)
    direction: tuple = (0.0, 1.0, 0.0)
    width: int = 256
    height: int = 256
    focal_length_mm: float = 20.0
    sensor_height_mm: float = 36.0


def camera_from_raster(focal_mm, sensor_h_mm, x_res, y_res):
    """4x4 matrix mapping raster (px, py, 0) → camera-space sensor point."""
    sensor_w_mm = sensor_h_mm * float(x_res) / float(y_res)
    mm = 1e-3
    f, sh, sw = focal_mm * mm, sensor_h_mm * mm, sensor_w_mm * mm
    px_x = sw / float(x_res)
    px_y = sh / float(y_res)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = px_x
    m[1, 1] = -px_y
    m[0, 3] = -0.5 * sw + 0.5 * px_x
    m[1, 3] = 0.5 * sh - 0.5 * px_y
    m[2, 3] = f
    return jnp.asarray(m)


def world_from_camera(direction, position):
    """4x4 camera→world from viewing direction + position (world up = +z)."""
    d = np.asarray(direction, dtype=np.float64)
    forward = d / np.linalg.norm(d)
    right = np.cross(forward, np.array([0.0, 0.0, 1.0]))
    right = right / np.linalg.norm(right)
    up = np.cross(right, forward)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = up
    m[:3, 2] = forward
    m[:3, 3] = np.asarray(position, dtype=np.float64)
    return jnp.asarray(m)


def generate_rays(p_film, cam_from_raster, world_from_cam):
    """Rays through film points ``p_film`` (…,2) → (origins, directions).

    Reference getCameraRay (extra_math.cu:31-42): origin is the camera
    position; direction is the normalized world-space sensor vector.
    """
    zeros = jnp.zeros_like(p_film[..., :1])
    p_raster = jnp.concatenate([p_film, zeros], axis=-1)
    p_camera = transform_point(cam_from_raster, p_raster)
    o = transform_point(world_from_cam, jnp.zeros_like(p_camera))
    d = normalize(transform_vector(world_from_cam, p_camera))
    return o, d


def pixel_centers(width: int, height: int):
    """(H*W, 2) array of pixel indices as float centers at +0.5 jitter base."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)
