"""Sampling primitives (reference: cuda-core/private/sampling.cu).

All functions are batched over leading dims; 2D uniforms ``u`` are a pair of
arrays or a trailing-dim-2 array. Directions taking a normal return
world-space vectors built on the ``gram_schmidt`` frame, like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import (
    INV_PI,
    PI,
    dot,
    gram_schmidt,
    length2,
    safe_sqrt,
    safe_acos,
    sin_sqr_to_one_minus_cos,
    sqr,
)


def sample_uniform_disk(u1, u2):
    """Concentric disk mapping (reference sampling.cu:137-157)."""
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    a_dom = jnp.abs(a) > jnp.abs(b)
    rho = jnp.where(a_dom, a, b)
    # guard 0/0 at the origin
    ratio = jnp.where(a_dom, b / jnp.where(a == 0.0, 1.0, a), a / jnp.where(b == 0.0, 1.0, b))
    # Shirley–Chiu: φ = (π/4)(b/a) in the |a|-dominant wedges,
    # φ = π/2 − (π/4)(a/b) otherwise. (An earlier version used
    # (3π/4)·(a/b) for the second branch, which folds azimuth density
    # 2:1 by quadrant — caught by the envmap φ-histogram test.)
    phi = jnp.where(a_dom, (PI / 4.0) * ratio, PI / 2.0 - (PI / 4.0) * ratio)
    zero = (a == 0.0) & (b == 0.0)
    x = jnp.where(zero, 0.0, rho * jnp.cos(phi))
    y = jnp.where(zero, 0.0, rho * jnp.sin(phi))
    return x, y


def sample_uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return 0.25 * INV_PI


def sample_cos_hemisphere(n, u1, u2):
    """Cosine-weighted hemisphere around ``n`` → (dir, pdf)."""
    x, y = sample_uniform_disk(u1, u2)
    cos_theta = safe_sqrt(1.0 - (x * x + y * y))
    t, b = gram_schmidt(n)
    d = x[..., None] * t + y[..., None] * b + cos_theta[..., None] * n
    return d, cos_theta * INV_PI


def cos_hemisphere_pdf(n, d):
    c = dot(n, d)
    return jnp.where(c > 0.0, c * INV_PI, 0.0)


def sample_uniform_hemisphere(n, u1, u2):
    z = u1
    r = safe_sqrt(1.0 - sqr(z))
    phi = 2.0 * PI * u2
    t, b = gram_schmidt(n)
    d = (r * jnp.cos(phi))[..., None] * t + (r * jnp.sin(phi))[..., None] * b + z[..., None] * n
    return d, jnp.full_like(z, 0.5 * INV_PI)


def sample_uniform_cone(n, one_minus_cos, u1, u2):
    """Uniform direction in the cone around ``n``.

    Returns (dir, cos_theta, pdf, delta). When the cone is degenerate
    (``one_minus_cos <= 0``) the sample is ``n`` itself with pdf 1 and
    ``delta`` true (reference sampling.cu:88-120).
    """
    x, y = sample_uniform_disk(u1, u2)
    r2 = x * x + y * y
    cone = one_minus_cos > 0.0
    cos_theta = jnp.where(cone, 1.0 - r2 * one_minus_cos, 1.0)
    scale = safe_sqrt(r2 * one_minus_cos * (2.0 - r2 * one_minus_cos))
    denom = jnp.maximum(one_minus_cos, 1e-8)
    pdf = jnp.where(cone, 0.5 / (PI * denom), 1.0)
    t, b = gram_schmidt(n)
    d_cone = (x * scale)[..., None] * t + (y * scale)[..., None] * b + cos_theta[..., None] * n
    d = jnp.where(cone[..., None], d_cone, n)
    return d, cos_theta, pdf, ~cone


def sphere_light_pdf(dist_sqr, radius_sqr, n, ray_d, had_transmission):
    """Solid-angle pdf of sampling a sphere light (sampling.cu:21-29)."""
    inv_2pi = 0.5 * INV_PI
    outside = inv_2pi / jnp.maximum(
        sin_sqr_to_one_minus_cos(radius_sqr / jnp.maximum(dist_sqr, 1e-20)), 1e-8
    )
    inside = jnp.where(had_transmission, inv_2pi * 0.5, cos_hemisphere_pdf(n, ray_d))
    return jnp.where(dist_sqr > radius_sqr, outside, inside)


def map_to_sphere(co):
    """Unit direction → (u, v) spherical map (sampling.cu:31-49)."""
    l2 = length2(co)
    x, y, z = co[..., 0], co[..., 1], co[..., 2]
    u = jnp.where(
        (x == 0.0) & (y == 0.0), 0.0, 0.5 - jnp.arctan2(x, y) * (0.5 * INV_PI)
    )
    v = 1.0 - safe_acos(z / jnp.maximum(jnp.sqrt(l2), 1e-20)) * INV_PI
    zero = l2 <= 0.0
    return jnp.where(zero, 0.0, u), jnp.where(zero, 0.0, v)


def ray_sphere_intersect(ray_o, ray_d, t_min, t_max, center, radius):
    """Ray-sphere hit (reference sampling.cu:52-85, after Cycles).

    Returns (hit_mask, t, p).
    """
    d_vec = center - ray_o
    r_sq = radius * radius
    d_sq = length2(d_vec)
    d_cos = dot(d_vec, ray_d)
    away = (d_sq > r_sq) & (d_cos < 0.0)
    sin_sq = length2(d_vec - d_cos[..., None] * ray_d)
    outside_ray = sin_sq > r_sq
    t = d_cos - jnp.copysign(safe_sqrt(r_sq - sin_sq), d_sq - r_sq)
    hit = (~away) & (~outside_ray) & (t > t_min) & (t < t_max)
    p = ray_o + ray_d * t[..., None]
    return hit, t, p
