"""HDR environment light with 2D importance sampling.

Capability parity with the reference's EnvLight (core-light.h:76-89,
core-light.cpp:106-460): equirectangular radiance image + piecewise-
constant 2D distribution over luminance·sinθ + orientation.

Direction ↔ (u,v) uses the reference's ``mapToSphere`` convention
(sampling.cu:31-49): u = ½ − atan2(x,y)/2π, v = 1 − acos(z)/π.
A constant-color environment is a 1-pixel-wide map; because the sampling
table is sinθ-weighted, its importance sampling degrades gracefully to
uniform-sphere with an exact (table-consistent) pdf.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .distrib import (
    Piecewise2D,
    make_piecewise_2d,
    pdf_piecewise_2d,
    sample_piecewise_2d,
)
from .sampling import map_to_sphere
from .vecmath import PI, safe_sqrt

TWO_PI = 2.0 * PI


class EnvMap(NamedTuple):
    image: jnp.ndarray  # (H, W, 3) radiance
    dist: Piecewise2D  # over luminance·sinθ
    rotation: jnp.ndarray  # (3,3) world-from-env rotation
    scale: jnp.ndarray  # () radiance multiplier


def make_envmap(image, rotation=None, scale: float = 1.0) -> EnvMap:
    img = np.asarray(image, np.float32)
    if img.ndim == 1:  # constant color
        img = np.broadcast_to(img, (32, 1, 3)).copy()
    h, w = img.shape[:2]
    lum = img @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    # rows: v=0 at row 0 per our lookup; θ = (1 − v)·π evaluated at centers
    v = (np.arange(h, dtype=np.float32) + 0.5) / h
    sin_theta = np.sin((1.0 - v) * np.pi)
    dist = make_piecewise_2d(lum * sin_theta[:, None])
    rot = np.eye(3, dtype=np.float32) if rotation is None else np.asarray(rotation, np.float32)
    return EnvMap(
        jnp.asarray(img), dist, jnp.asarray(rot), jnp.asarray(scale, jnp.float32)
    )


def constant_envmap(color) -> EnvMap:
    return make_envmap(np.asarray(color, np.float32))


def _uv_to_dir(u, v):
    theta = (1.0 - v) * PI
    z = jnp.cos(theta)
    r = safe_sqrt(1.0 - z * z)
    phi = (0.5 - u) * TWO_PI  # φ = atan2(x, y)
    x = r * jnp.sin(phi)
    y = r * jnp.cos(phi)
    return jnp.stack([x, y, z], axis=-1)


def _lookup(env: EnvMap, u, v):
    from .gather import onehot_gather

    h, w = env.image.shape[:2]
    col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    # one-hot MXU gather for small maps, generic gather above the threshold
    texel = onehot_gather(env.image.reshape(h * w, 3), row * w + col)
    return texel * env.scale


def sample_envmap(env: EnvMap, u1, u2):
    """(u1,u2) → (world dir, radiance (N,3), solid-angle pdf)."""
    u, v, pdf_uv = sample_piecewise_2d(env.dist, u1, u2)
    d_env = _uv_to_dir(u, v)
    # explicit f32 mul-adds (einsum runs at bf16 matmul precision on TPU
    # — see vecmath.transform_point)
    r = env.rotation
    d = jnp.stack(
        [
            r[i, 0] * d_env[..., 0]
            + r[i, 1] * d_env[..., 1]
            + r[i, 2] * d_env[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )
    radiance = _lookup(env, u, v)
    sin_theta = jnp.maximum(jnp.sin((1.0 - v) * PI), 1e-6)
    pdf = pdf_uv / (2.0 * PI * PI * sin_theta)
    return d, radiance, pdf


def eval_envmap(env: EnvMap, d_world):
    """World direction → (radiance (N,3), solid-angle pdf of sampling it)."""
    r = env.rotation  # inverse rotation = transpose; explicit f32 mul-adds
    d = jnp.stack(
        [
            r[0, i] * d_world[..., 0]
            + r[1, i] * d_world[..., 1]
            + r[2, i] * d_world[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )
    u, v = map_to_sphere(d)
    radiance = _lookup(env, u, v)
    pdf_uv = pdf_piecewise_2d(env.dist, u, v)
    sin_theta = jnp.maximum(jnp.sin((1.0 - v) * PI), 1e-6)
    pdf = pdf_uv / (2.0 * PI * PI * sin_theta)
    return radiance, pdf
