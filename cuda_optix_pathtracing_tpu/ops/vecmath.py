"""Vector math primitives, batched over arbitrary leading dimensions.

Vectors are jnp arrays with a trailing dimension of 3 (or 2). All functions
are shape-polymorphic over leading dims and differentiable where meaningful.

Conventions follow the reference renderer (behavioural parity, new code):
- left-handed camera space, world up is +z
  (reference: examples/triangles/cuda-core/private/extra_math.cu:43-80)
- ``gram_schmidt`` builds a tangent frame with the reference's branch-free
  formula (reference: cuda-core/public/cuda-core/common_math.cuh:453-465)
- ``offset_ray_origin`` implements watertight shadow-ray offsetting with
  error bounds (reference: cuda-core/public/cuda-core/extra_math.cuh:31-59)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INV_PI = 1.0 / jnp.pi
PI = jnp.pi


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length2(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length2(v))


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def sqr(x):
    return x * x


def normalize(v, eps: float = 0.0):
    l2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jnp.where(l2 > eps, jax_rsqrt(l2), 0.0)


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(jnp.maximum(x, 1e-38))


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def average3(v):
    return jnp.mean(v, axis=-1)


def luminance(rgb):
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def max_component(v):
    return jnp.max(v, axis=-1)


def smoothstep01(x):
    x = jnp.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def smoothstep(a, b, x):
    """Correct smoothstep between edges ``a`` and ``b``.

    Note: the reference's ``smoothstep(a,b,x)`` (common_math.cuh:484-489)
    has min/max swapped, so it always evaluates to 1; the hard spot-cone
    cutoff there comes from cone sampling instead. We implement the correct
    falloff (matches the Cycles/PBRT behaviour the scene was authored for).
    """
    t = (x - a) / (b - a)
    return smoothstep01(t)


def sin_sqr_to_one_minus_cos(s_sq):
    """1 - sqrt(1 - s^2), Taylor-stabilized for small angles.

    Reference: common_math.cuh:439-443.
    """
    return jnp.where(s_sq > 0.0004, 1.0 - safe_sqrt(1.0 - s_sq), 0.5 * s_sq)


def sin_from_cos(c):
    return safe_sqrt(1.0 - sqr(c))


def gram_schmidt(n):
    """Branch-free tangent frame around unit normal ``n`` → (T, B).

    Matches the reference's construction (common_math.cuh:453-465): cross
    with (1,1,1) normally, (-1,1,1) when n is near the (1,1,1) diagonal.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    near_diag = (jnp.abs(nx - ny) <= 1e-3) & (jnp.abs(nx - nz) <= 1e-3)
    a = jnp.where(
        near_diag[..., None],
        jnp.stack([nz - ny, nx + nz, -ny - nx], axis=-1),
        jnp.stack([nz - ny, nx - nz, ny - nx], axis=-1),
    )
    t = normalize(a)
    b = cross(n, t)
    return t, b


def orthonormal_tangent(n, t):
    """Frame (X, Y) from normal ``n`` and (non-unit) tangent hint ``t``.

    Reference: common_math.cuh:466-472.
    """
    b = normalize(cross(n, t))
    a = cross(b, n)
    return a, b


def face_forward(n, v):
    """Flip ``n`` so it lies in the hemisphere of ``v``."""
    return jnp.where(dot(n, v, keepdims=True) < 0.0, -n, n)


def reflect(wo, n):
    return 2.0 * dot(wo, n, keepdims=True) * n - wo


def refract_angle(incident, normal, cos_theta_t, inv_eta):
    """Refracted direction given precomputed transmitted cosine (Snell).

    ``incident`` points *away* from the surface, ``normal`` oriented to its
    side (dot > 0), ``inv_eta = η_i/η_t``. At normal incidence this returns
    ``-normal``. Note: the reference's refractAngle (bsdf.cu:358-365) has
    the cosθt sign flipped, sending transmitted rays back out of the
    surface — a bug we do not reproduce.
    """
    c = inv_eta * dot(incident, normal, keepdims=True) - cos_theta_t[..., None]
    return c * normal - inv_eta * incident


# ---------------------------------------------------------------------------
# Watertight ray offsetting (error-bound based)
# ---------------------------------------------------------------------------

# np (not jnp): a module-level jnp scalar would initialise the XLA
# backend at import, breaking jax.distributed.initialize ordering
_MACHINE_EPS = np.float32(5.960464477539063e-08)  # 2^-24


def float_gamma(n: int):
    """PBRT gamma(n) = n*eps / (1 - n*eps) for fp32 rounding-error bounds."""
    ne = n * _MACHINE_EPS
    return ne / (1.0 - ne)


def error_from_triangle_intersection(u, v, p0, p1, p2):
    """Intersection-point error bound (reference: extra_math.cuh:31-34)."""
    g = float_gamma(7)
    w = (1.0 - u - v)[..., None]
    return g * (
        jnp.abs(u[..., None] * p0) + jnp.abs(v[..., None] * p1) + jnp.abs(w * p2)
    )


def next_float_toward_inf(x, positive):
    """nextafter(x, ±inf) selected elementwise by sign flag ``positive``.

    The ULP nudge is a purely numerical detail (watertightness), so gradients
    pass through as identity: ``nextafter`` has no JAX differentiation rule,
    and d(nextafter(x))/dx == 1 almost everywhere anyway.
    """
    import jax.lax as lax

    up = jnp.nextafter(lax.stop_gradient(x), jnp.inf)
    dn = jnp.nextafter(lax.stop_gradient(x), -jnp.inf)
    nudged = jnp.where(positive, up, dn)
    return x + lax.stop_gradient(nudged - lax.stop_gradient(x))


def offset_ray_origin(p, error, ng, w):
    """Offset ray origin off the surface along ±ng by the error bound, then
    round each component away from the surface (reference extra_math.cuh:36-59).

    The entire offset (error-bound shift + ULP rounding) is detached from the
    autodiff graph: it exists only to avoid self-intersection, and its
    magnitude must not contribute gradients (it is O(ulp) and its derivative
    is meaningless). Gradients flow through ``p`` with identity.
    """
    import jax.lax as lax

    d = dot(jnp.abs(ng), error, keepdims=True)
    offset = ng * d
    offset = jnp.where(dot(w, ng, keepdims=True) < 0.0, -offset, offset)
    po = p + lax.stop_gradient(offset)
    return next_float_toward_inf(po, lax.stop_gradient(offset) > 0.0)


# ---------------------------------------------------------------------------
# 4x4 affine transforms (row-vector free; we store standard math convention:
# y = M @ x with column vectors, matching the reference's column-major data)
# ---------------------------------------------------------------------------


def transform_point(m, p):
    """Apply 4x4 matrix ``m`` (…,4,4) to points ``p`` (…,3).

    Explicit f32 multiply-adds, NOT einsum: XLA's default matmul
    precision computes f32 contractions at bf16 on TPU, which
    quantizes transformed rays to a ~2^-9 relative grid (r5 finding —
    it displaced instanced shadow origins by ~1e-3 and self-shadowed
    spheres; camera rays ran through this same path)."""
    return jnp.stack(
        [
            m[..., i, 0] * p[..., 0]
            + m[..., i, 1] * p[..., 1]
            + m[..., i, 2] * p[..., 2]
            + m[..., i, 3]
            for i in range(3)
        ],
        axis=-1,
    )


def transform_vector(m, v):
    return jnp.stack(
        [
            m[..., i, 0] * v[..., 0]
            + m[..., i, 1] * v[..., 1]
            + m[..., i, 2] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def make_translation(t):
    m = jnp.eye(4)
    return m.at[:3, 3].set(jnp.asarray(t))


def make_scale(s):
    return jnp.diag(jnp.asarray([s[0], s[1], s[2], 1.0]))
