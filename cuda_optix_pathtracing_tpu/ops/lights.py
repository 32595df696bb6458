"""Light library: point (sphere), spot, directional, constant environment.

Capability parity with the reference's 32-byte tagged-union Light and its
sampling dispatch (cuda-core/light.cuh:8-121, light.cu:13-332), vectorized
over rays: each ray carries its (gathered) light parameters and all light
types are evaluated as masked dense code.

Deviations from the reference (documented, intentional):
- constant-environment pdf is 1/(4π) (the reference's evalInfiniteLight
  returns π/4, light.cu:322-331 — a typo its integrators never consume);
- spot angular attenuation uses a correct smoothstep (the reference's is
  saturated to 1 by a min/max swap, common_math.cuh:484-489).

HDR environment maps importance-sampled from a 2D distribution live in
``envmap.py``; the light *tree* (Conty/Kulla) in ``light_tree.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from .sampling import (
    cos_hemisphere_pdf,
    ray_sphere_intersect,
    sample_cos_hemisphere,
    sample_uniform_cone,
    sample_uniform_sphere,
)
from .vecmath import (
    INV_PI,
    dot,
    length,
    normalize,
    safe_sqrt,
    smoothstep,
    sqr,
)

POINT = 0
SPOT = 1
ENV = 2
DIRECTIONAL = 3
AREA = 4  # emissive triangle set (net-new vs the reference's Gen-2 set;
# capability parity with PBRT AreaLightSource used by the reference's
# own verification scene, scenes/cornell-box.pbrt:37-43)

BIG_DIST = 3.0e38


class LightTable(NamedTuple):
    """SoA light parameters; rows indexed by light id."""

    ltype: jnp.ndarray  # (L,) i32
    color: jnp.ndarray  # (L,3) intensity
    pos: jnp.ndarray  # (L,3)
    direction: jnp.ndarray  # (L,3) unit (spot/directional)
    cos_theta0: jnp.ndarray  # (L,) spot max-intensity cosine
    cos_theta_e: jnp.ndarray  # (L,) spot penumbra cosine
    radius: jnp.ndarray  # (L,) nucleus radius
    one_minus_cos: jnp.ndarray  # (L,) directional spread

    def gather(self, idx):
        from .gather import onehot_gather_pytree

        return onehot_gather_pytree(self, idx)


def point_light(color, position, radius: float = 1e-3) -> dict:
    return dict(ltype=POINT, color=color, pos=position, radius=radius)


def spot_light(color, position, direction, cos_theta0, cos_theta_e, radius) -> dict:
    d = np.asarray(direction, np.float64)
    return dict(
        ltype=SPOT,
        color=color,
        pos=position,
        direction=(d / np.linalg.norm(d)).astype(np.float32),
        cos_theta0=float(cos_theta0),
        cos_theta_e=float(cos_theta_e),
        radius=float(radius),
    )


def directional_light(color, direction, one_minus_cos: float = 0.0) -> dict:
    d = np.asarray(direction, np.float64)
    return dict(
        ltype=DIRECTIONAL,
        color=color,
        direction=(d / np.linalg.norm(d)).astype(np.float32),
        one_minus_cos=float(one_minus_cos),
    )


def environment_light(color) -> dict:
    return dict(ltype=ENV, color=color)


def area_light() -> dict:
    """One table row representing the whole emissive-triangle set; the
    geometry lives in the scene's EmissiveTable."""
    return dict(ltype=AREA, color=(0.0, 0.0, 0.0))


class EmissiveTable(NamedTuple):
    """Flattened emissive-triangle set for area-light NEE."""

    v0: jnp.ndarray  # (K,3)
    e0: jnp.ndarray  # (K,3)
    e1: jnp.ndarray  # (K,3)
    rad: jnp.ndarray  # (K,3) one-sided radiance from the front face
    cdf: jnp.ndarray  # (K+1,) area-weighted selection CDF
    area: jnp.ndarray  # () total area


def make_emissive_table(v0, e0, e1, rad) -> EmissiveTable:
    v0 = np.asarray(v0, np.float32)
    e0 = np.asarray(e0, np.float32)
    e1 = np.asarray(e1, np.float32)
    rad = np.asarray(rad, np.float32)
    areas = 0.5 * np.linalg.norm(np.cross(e0, e1), axis=1)
    total = max(float(areas.sum()), 1e-12)
    cdf = np.concatenate([[0.0], np.cumsum(areas / total)]).astype(np.float32)
    cdf[-1] = 1.0
    return EmissiveTable(
        jnp.asarray(v0), jnp.asarray(e0), jnp.asarray(e1), jnp.asarray(rad),
        jnp.asarray(cdf), jnp.asarray(total, jnp.float32),
    )


def sample_area_light(em: EmissiveTable, position, u1, u2):
    """Uniform-by-area sample of the emissive set from ``position``.

    Returns (p (N,3), dir (N,3), dist (N,), pdf_solid (N,), le (N,3)).
    Emission is **two-sided** (Cycles mesh-emitter semantics — also makes
    mixed-winding light meshes like the reference's own
    scenes/cornell-box.pbrt quad behave).
    """
    from .gather import onehot_gather_pytree

    k = em.v0.shape[0]
    tri = jnp.clip(jnp.searchsorted(em.cdf, u1, side="right") - 1, 0, k - 1)
    # re-stratify u1 within the chosen triangle's cdf span
    c0c1 = onehot_gather_pytree(
        (jnp.stack([em.cdf[:-1], em.cdf[1:]], axis=1),), tri
    )[0]
    du = (u1 - c0c1[..., 0]) / jnp.maximum(c0c1[..., 1] - c0c1[..., 0], 1e-12)
    tv0, te0, te1, trad = onehot_gather_pytree(
        (em.v0, em.e0, em.e1, em.rad), tri
    )
    # uniform barycentrics from (du, u2)
    su = safe_sqrt(du)
    b1 = 1.0 - su
    b2 = u2 * su
    p = tv0 + b1[..., None] * te0 + b2[..., None] * te1
    n_e = jnp.cross(te0, te1)
    n_len = jnp.maximum(length(n_e), 1e-12)
    n_e = n_e / n_len[..., None]
    to_p = p - position
    dist_sqr = jnp.maximum(jnp.sum(to_p * to_p, axis=-1), 1e-12)
    dist = jnp.sqrt(dist_sqr)
    d = to_p / dist[..., None]
    cos_l = jnp.abs(dot(d, n_e))  # two-sided emission
    pdf_solid = dist_sqr / jnp.maximum(cos_l * em.area, 1e-12)
    le = jnp.where((cos_l > 1e-6)[..., None], trad, 0.0)
    pdf_solid = jnp.where(cos_l > 1e-6, pdf_solid, 0.0)
    return p, d, dist, pdf_solid, le


def area_light_hit_pdf(em_area, pos, hit_p, d, n_e):
    """Solid-angle pdf that area-NEE would have generated the bsdf-ray
    hit at ``hit_p`` (for MIS weighting of directly-hit emitters)."""
    to_p = hit_p - pos
    dist_sqr = jnp.maximum(jnp.sum(to_p * to_p, axis=-1), 1e-12)
    cos_l = jnp.abs(dot(d, n_e))
    return dist_sqr / jnp.maximum(cos_l * em_area, 1e-12)


_DEFAULTS = dict(
    ltype=POINT,
    color=(1.0, 1.0, 1.0),
    pos=(0.0, 0.0, 0.0),
    direction=(0.0, 0.0, -1.0),
    cos_theta0=1.0,
    cos_theta_e=0.0,
    radius=1e-3,
    one_minus_cos=0.0,
)


def make_light_table(lights: Sequence[dict]) -> LightTable:
    rows = []
    for l in lights:
        d = dict(_DEFAULTS)
        d.update(l)
        rows.append(d)

    def col(name, width):
        if width == 1:
            return jnp.asarray([r[name] for r in rows], jnp.float32)
        return jnp.asarray([np.broadcast_to(r[name], (3,)) for r in rows], jnp.float32)

    return LightTable(
        ltype=jnp.asarray([r["ltype"] for r in rows], jnp.int32),
        color=col("color", 3),
        pos=col("pos", 3),
        direction=col("direction", 3),
        cos_theta0=col("cos_theta0", 1),
        cos_theta_e=col("cos_theta_e", 1),
        radius=col("radius", 1),
        one_minus_cos=col("one_minus_cos", 1),
    )


class LightSample(NamedTuple):
    p_light: jnp.ndarray  # (N,3) sampled point (or direction for env/dir)
    direction: jnp.ndarray  # (N,3) shading point → light
    pdf: jnp.ndarray  # (N,) solid-angle pdf (0 = invalid)
    delta: jnp.ndarray  # (N,) bool
    distance: jnp.ndarray  # (N,)
    factor: jnp.ndarray  # (N,) angular attenuation (spot)


def _sphere_nucleus_sample(lpos, radius, position, normal, u1, u2, had_transmission):
    """Shared point/spot nucleus sampling (light.cu:13-81): cone toward the
    sphere from outside, cosine-hemisphere (or uniform sphere after
    transmission) from inside. Returns (dir, cos_theta, pdf, delta,
    dist, dist_sqr, radius_sqr, light_n).
    """
    radius_sqr = sqr(radius)
    to_p = position - lpos
    dist_sqr = jnp.maximum(jnp.sum(to_p * to_p, axis=-1), 1e-20)
    dist = jnp.sqrt(dist_sqr)
    light_n = to_p / dist[..., None]
    outside = dist_sqr > radius_sqr
    effectively_delta = (radius / dist) < 1e-3

    from .vecmath import sin_sqr_to_one_minus_cos

    omc = sin_sqr_to_one_minus_cos(radius_sqr / dist_sqr)
    d_out, cos_out, pdf_out, delta_out = sample_uniform_cone(-light_n, omc, u1, u2)

    d_sphere = sample_uniform_sphere(u1, u2)
    d_hemi, pdf_hemi = sample_cos_hemisphere(normal, u1, u2)
    d_in = jnp.where(had_transmission[..., None], d_sphere, d_hemi)
    pdf_in = jnp.where(had_transmission, 0.25 * INV_PI, pdf_hemi)
    cos_in = -dot(d_in, light_n)

    d = jnp.where(outside[..., None], d_out, d_in)
    cos_theta = jnp.where(outside, cos_out, cos_in)
    pdf = jnp.where(outside, pdf_out, pdf_in)
    delta = outside & (delta_out | effectively_delta)
    pdf = jnp.where(delta, 1.0, pdf)
    return d, cos_theta, pdf, delta, dist, dist_sqr, radius_sqr, light_n


def _law_of_cosines_distance(dist, cos_theta, radius_sqr, dist_sqr):
    """Distance from shading point to the sphere surface along the sample
    direction (light.cu:55-60)."""
    return dist * cos_theta - jnp.copysign(
        safe_sqrt(radius_sqr - dist_sqr + dist_sqr * sqr(cos_theta)),
        dist_sqr - radius_sqr,
    )


def sample_light(
    lt: LightTable, position, u1, u2, had_transmission, normal
) -> LightSample:
    """Sample per-ray gathered lights ``lt`` from ``position`` (N,3)."""
    n = position.shape[0]

    # ---- point/spot nucleus ----
    d, cos_theta, pdf, delta, dist, dist_sqr, radius_sqr, light_n = (
        _sphere_nucleus_sample(
            lt.pos, lt.radius, position, normal, u1, u2, had_transmission
        )
    )
    distance = _law_of_cosines_distance(dist, cos_theta, radius_sqr, dist_sqr)
    p_light = position + d * distance[..., None]
    factor = jnp.ones((n,), jnp.float32)

    # ---- spot extras (light.cu:110-206) ----
    is_spot = lt.ltype == SPOT
    spot_dir = lt.direction
    outside = dist_sqr > radius_sqr
    omc_spread = 1.0 - lt.cos_theta_e
    from .vecmath import sin_sqr_to_one_minus_cos

    omc_sphere = sin_sqr_to_one_minus_cos(radius_sqr / dist_sqr)
    toward_apex = omc_sphere < omc_spread
    # sample spread cone instead of sphere cone when the cone is tighter
    d_cone, cos_cone, pdf_cone, delta_cone = sample_uniform_cone(
        -spot_dir, omc_spread, u1, u2
    )
    hit_s, t_s, p_s = ray_sphere_intersect(
        position, d_cone, 0.0, BIG_DIST, lt.pos, lt.radius
    )
    use_cone = is_spot & outside & ~toward_apex
    d = jnp.where(use_cone[..., None], d_cone, d)
    pdf = jnp.where(use_cone, jnp.where(hit_s, pdf_cone, 0.0), pdf)
    delta = jnp.where(use_cone, delta_cone & hit_s, delta)
    distance = jnp.where(use_cone, t_s, distance)
    p_light = jnp.where(use_cone[..., None], p_s, p_light)

    # spot angular attenuation: reference builds a light-space ray
    # {position, -direction} and attenuates on its d.z = dot(-d, forward)
    # (light.cu:163-170)
    cos_spot = dot(-d, spot_dir)
    att = smoothstep(lt.cos_theta_e, lt.cos_theta0, cos_spot)
    factor = jnp.where(is_spot, att, factor)
    pdf = jnp.where(is_spot & (att <= 0.0), 0.0, pdf)
    # effectively-delta spots
    eff_delta = is_spot & ((lt.radius / dist) < 1e-3) & (pdf > 0.0)
    delta = jnp.where(eff_delta, True, delta)
    pdf = jnp.where(eff_delta, 1.0, pdf)
    # re-project onto the sphere + fix direction (light.cu:186-198)
    spot_like = is_spot & (pdf > 0.0)
    ng = normalize(p_light - lt.pos)
    p_proj = ng * lt.radius[..., None] + lt.pos
    new_dir = p_proj - position
    new_dist = length(new_dir)
    proj_ok = spot_like & (new_dist > 1e-8)
    d = jnp.where(proj_ok[..., None], new_dir / jnp.maximum(new_dist, 1e-8)[..., None], d)
    distance = jnp.where(proj_ok, new_dist, distance)
    p_light = jnp.where(proj_ok[..., None], p_proj, p_light)

    # ---- environment (uniform sphere) ----
    is_env = lt.ltype == ENV
    d_env = sample_uniform_sphere(u1, u2)
    d = jnp.where(is_env[..., None], d_env, d)
    pdf = jnp.where(is_env, 0.25 * INV_PI, pdf)
    delta = jnp.where(is_env, False, delta)
    distance = jnp.where(is_env, BIG_DIST, distance)
    p_light = jnp.where(is_env[..., None], d_env, p_light)
    factor = jnp.where(is_env, 1.0, factor)

    # ---- directional (cone of spread around -direction) ----
    is_dir = lt.ltype == DIRECTIONAL
    d_dir, _, pdf_dir, delta_dir = sample_uniform_cone(
        lt.direction, lt.one_minus_cos, u1, u2
    )
    d = jnp.where(is_dir[..., None], -d_dir, d)
    pdf = jnp.where(is_dir, pdf_dir, pdf)
    delta = jnp.where(is_dir, True, delta)
    distance = jnp.where(is_dir, BIG_DIST, distance)
    p_light = jnp.where(is_dir[..., None], d_dir, p_light)
    factor = jnp.where(is_dir, 1.0, factor)

    return LightSample(p_light, d, pdf, delta, distance, factor)


def eval_light(lt: LightTable, ls: LightSample):
    """Radiance arriving along the sample (light.cu:309-320): intensity ×
    angular factor, with inverse-square falloff for point/spot."""
    le = lt.color * ls.factor[..., None]
    finite = (lt.ltype == POINT) | (lt.ltype == SPOT)
    atten = 1.0 / jnp.maximum(sqr(ls.distance), 1e-12)
    return jnp.where(finite[..., None], le * atten[..., None], le)


def eval_infinite_light(color, direction):
    """Constant environment emission + its uniform-sphere pdf."""
    n = direction.shape[0]
    pdf = jnp.full((n,), 0.25 * INV_PI, jnp.float32)
    return jnp.broadcast_to(color, (n, 3)), pdf
