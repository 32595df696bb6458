"""Fully-fused Pallas path-tracing megakernel.

This is the TRUE TPU megakernel (reference pathTraceMegakernel,
megakernel.cu:53-322): the *entire* path loop — closest hit, NEE with a
shadow ray, BSDF evaluation + sampling, Russian roulette — runs inside
ONE Pallas kernel per sample batch. Path state lives in vector registers
/ VMEM for the whole depth loop; nothing round-trips HBM between bounces.

Why: the XLA-fused integrator (models/megakernel.py) compiles to ~870
sequential fusions per sample pass; profiling (docs/perf_notes.md) shows
per-fusion overhead plus HBM traffic of intermediate path state dominate
— the program runs ~17× above its bandwidth floor. Fusing the loop by
hand removes both.

Scope (statically checked, falls back to the XLA integrator otherwise):
- brute-force triangle sweep (Cornell-class scenes below BVH_THRESHOLD,
  the reference megakernel's scope) OR in-kernel packet-BVH traversal
  (r4; ops/bvh_pallas.tile_traverse — mesh scenes, auto-policy still
  prefers the re-sorting XLA wavefront for these, see resolve_fused)
- materials: Oren-Nayar (multiscatter), GGX dielectric
  (reflection/transmission, anisotropy, delta case, Kulla-Conty energy
  compensation via the polynomial E/Eavg fits from ops/bsdf.py), and
  GGX conductor (r4: RGB conductor Fresnel + F82-tint multiscatter)
- lights: point/spot rows + AREA rows (r4: emissive-triangle NEE by
  area-weighted CDF with one-sample power-heuristic MIS, and
  direct-emitter-hit MIS via carried prev_pdf/prev_delta — the
  cornell-box.pbrt class), uniform 1/L selection (no light tree, no
  envmap NEE)
- constant environment on miss
- hash (pcg4d) OR Owen-scrambled Halton sampler (r5) — identical
  keying to ops/rng.py, so images agree with the XLA integrator up to
  float reassociation; halton Python-unrolls the depth loop for static
  prime-base selection (envmap NEE stays XLA-side: the 2-D CDF walk
  needs per-lane gathers Mosaic doesn't have — docs/perf_notes.md r5
  deferral)

Layout: rays in lanes, (BLOCK_ROWS, 128) tiles; vectors are component
tuples (x, y, z) of such planes (inside a kernel there is no XLA layout
assignment, so hand-SoA is correct here — see docs/perf_notes.md).
Triangles and material/light tables stream from SMEM as scalars
broadcast against the whole tile (the intersect_pallas.py pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.bsdf import (
    DELTA_ALPHA,
    GGX_CONDUCTOR,
    GGX_DIELECTRIC,
    OREN_NAYAR,
    THROUGHPUT_EPS,
    _e_poly_coeffs,
)
from ..ops.bvh_pallas import (
    DRAIN,
    LEAF_STACK_DEPTH,
    STACK_DEPTH,
    degen_tables,
    tile_traverse,
    tri_rows_pack,
)
from ..ops.intersect import BIG_T, MT_TOLERANCE, T_MIN
from ..scene.types import Scene

LANES = 128
BLOCK_ROWS = 64  # rays per program = 8192: big tiles amortize the scalar
# SMEM triangle streaming of the brute-force sweep
BLOCK_ROWS_BVH = 8  # packet traversal wants SMALL tiles: a shared stack
# descends the union frustum, so fewer rays per tile = tighter culling

U32 = jnp.uint32
_DEBUG_SKIP_SHADOW = False  # perf attribution only: drops the in-kernel
# shadow traversal (image is wrong); see scripts/sorted_fused_perf.py
PI = 3.14159265358979
INV_PI = 1.0 / PI
GAMMA7 = float(7 * 5.960464477539063e-08 / (1.0 - 7 * 5.960464477539063e-08))
BIG_DIST = 3.0e38


# ---------------------------------------------------------------------------
# component-tuple vector helpers ((R,128) planes)
# ---------------------------------------------------------------------------


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vneg(a):
    return (-a[0], -a[1], -a[2])


def vwhere(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def vnormalize(a):
    # NOT lax.rsqrt: Mosaic lowers it to the approximate VPU rsqrt
    # (~2^-12 relative error), which systematically biases bounce
    # direction lengths and measurably brightens the image; 1/sqrt is
    # exact (measured +1.5% radiance bias with rsqrt, none with sqrt)
    inv = 1.0 / jnp.sqrt(jnp.maximum(vdot(a, a), 1e-20))
    return vscale(a, inv)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def sqr(x):
    return x * x


def _copysign(mag, sign):
    return jnp.where(sign < 0.0, -mag, mag)


def gram_schmidt(n):
    """Branch-free tangent frame (vecmath.gram_schmidt parity)."""
    nx, ny, nz = n
    near_diag = (jnp.abs(nx - ny) <= 1e-3) & (jnp.abs(nx - nz) <= 1e-3)
    ax = nz - ny
    ay = jnp.where(near_diag, nx + nz, nx - nz)
    az = jnp.where(near_diag, -ny - nx, ny - nx)
    t = vnormalize((ax, ay, az))
    b = vcross(n, t)
    return t, b


def sample_uniform_disk(u1, u2):
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    a_dom = jnp.abs(a) > jnp.abs(b)
    rho = jnp.where(a_dom, a, b)
    ratio = jnp.where(
        a_dom,
        b / jnp.where(a == 0.0, 1.0, a),
        a / jnp.where(b == 0.0, 1.0, b),
    )
    # Shirley–Chiu second branch: π/2 − (π/4)·ratio (keep in sync with
    # ops/sampling.py sample_uniform_disk)
    phi = jnp.where(a_dom, (PI / 4.0) * ratio, PI / 2.0 - (PI / 4.0) * ratio)
    zero = (a == 0.0) & (b == 0.0)
    x = jnp.where(zero, 0.0, rho * jnp.cos(phi))
    y = jnp.where(zero, 0.0, rho * jnp.sin(phi))
    return x, y


def sample_uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u2
    return (r * jnp.cos(phi), r * jnp.sin(phi), z)


def sample_cos_hemisphere(n, u1, u2):
    x, y = sample_uniform_disk(u1, u2)
    cos_theta = safe_sqrt(1.0 - (x * x + y * y))
    t, b = gram_schmidt(n)
    d = vadd(vadd(vscale(t, x), vscale(b, y)), vscale(n, cos_theta))
    return d, cos_theta * INV_PI


def sample_uniform_cone(n, one_minus_cos, u1, u2):
    x, y = sample_uniform_disk(u1, u2)
    r2 = x * x + y * y
    cone = one_minus_cos > 0.0
    cos_theta = jnp.where(cone, 1.0 - r2 * one_minus_cos, 1.0)
    scale = safe_sqrt(r2 * one_minus_cos * (2.0 - r2 * one_minus_cos))
    pdf = jnp.where(cone, 0.5 / (PI * jnp.maximum(one_minus_cos, 1e-8)), 1.0)
    t, b = gram_schmidt(n)
    d_cone = vadd(
        vadd(vscale(t, x * scale), vscale(b, y * scale)),
        vscale(n, cos_theta),
    )
    d = vwhere(cone, d_cone, n)
    return d, cos_theta, pdf, ~cone


def smoothstep(a, b, x):
    t = jnp.clip((x - a) / (b - a), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def sin_sqr_to_one_minus_cos(s_sq):
    return jnp.where(s_sq > 0.0004, 1.0 - safe_sqrt(1.0 - s_sq), 0.5 * s_sq)


# ---------------------------------------------------------------------------
# RNG (ops/rng.py pcg4d parity)
# ---------------------------------------------------------------------------


def pcg4d(a, b, c, d):
    x = a * U32(1664525) + U32(1013904223)
    y = b * U32(1664525) + U32(1013904223)
    z = c * U32(1664525) + U32(1013904223)
    w = d * U32(1664525) + U32(1013904223)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> U32(16))
    y = y ^ (y >> U32(16))
    z = z ^ (z >> U32(16))
    w = w ^ (w >> U32(16))
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def u32_to_float01(u):
    # Mosaic has no u32→f32 cast; >>8 makes the value < 2^24 so an i32
    # bitcast-then-convert is exact (ops/rng.py u32_to_float01 parity)
    top = lax.bitcast_convert_type(u >> U32(8), jnp.int32)
    return top.astype(jnp.float32) * jnp.float32(5.9604645e-08)


def rng_2d(px, py, sample_seed, dim):
    x, y, _, _ = pcg4d(px, py, sample_seed, dim)
    return u32_to_float01(x), u32_to_float01(y)


def rng_1d(px, py, sample_seed, dim):
    x, _, _, _ = pcg4d(px, py, sample_seed, dim)
    return u32_to_float01(x)


# --- Owen-scrambled Halton, kernel-safe (ops/rng.py parity; r5) -------------
# Differences from ops/rng.py are Mosaic-only mechanics: u32→f32 goes
# through the bitcast trick, the digit loop is Python-unrolled (static
# n_digits), and inv_mult advances as a host float. The math — pixel
# seed keying, Laine–Karras base-2 Owen scramble, per-digit prefix-hash
# permutation in odd prime bases — is identical (rng.cu:96-231 is the
# reference ancestor; keying matches ops/rng.halton_owen_sample).

_PRIMES = (
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
    59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131,
)
_N_DIGITS = {2: 32, 3: 20, 5: 14, 7: 12, 11: 10, 13: 9}


def _rev_bits32(v):
    v = ((v >> U32(1)) & U32(0x55555555)) | ((v & U32(0x55555555)) << U32(1))
    v = ((v >> U32(2)) & U32(0x33333333)) | ((v & U32(0x33333333)) << U32(2))
    v = ((v >> U32(4)) & U32(0x0F0F0F0F)) | ((v & U32(0x0F0F0F0F)) << U32(4))
    v = ((v >> U32(8)) & U32(0x00FF00FF)) | ((v & U32(0x00FF00FF)) << U32(8))
    return (v >> U32(16)) | (v << U32(16))


def _lk_perm(x, seed):
    x = x + seed
    x = x ^ (x * U32(0x6C50B47C))
    x = x ^ (x * U32(0xB82F1E52))
    x = x ^ (x * U32(0xC7AFE638))
    x = x ^ (x * U32(0x8D22F6E6))
    return x


def _pcg_hash_k(seed):
    state = seed * U32(747796405) + U32(2891336453)
    word = (
        (state >> ((state >> U32(28)) + U32(4))) ^ state
    ) * U32(277803737)
    return (word >> U32(22)) ^ word


def _small_u32_to_f32(u):
    """Exact u32→f32 for values < 2^24 (digits/hashes mod base)."""
    return lax.bitcast_convert_type(u, jnp.int32).astype(jnp.float32)


def halton_1d(px, py, sample_raw, dim: int, seed: int):
    """Owen-scrambled Halton for STATIC dim (prime base selection),
    decorrelated per pixel — bit-parity with ops/rng.halton_owen_sample."""
    base = _PRIMES[int(dim) % len(_PRIMES)]
    pixel_seed, _, _, _ = pcg4d(
        px, py,
        jnp.full(px.shape, U32(int(dim))),
        jnp.full(px.shape, U32(seed)),
    )
    if base == 2:
        return u32_to_float01(_rev_bits32(_lk_perm(sample_raw, pixel_seed)))
    n_digits = _N_DIGITS.get(base, 8)
    base_u = U32(base)
    idx = sample_raw
    value = jnp.zeros(px.shape, jnp.float32)
    prefix = jnp.zeros(px.shape, U32)
    inv_mult = 1.0 / base
    for _ in range(n_digits):
        quot = idx // base_u
        digit = idx - quot * base_u
        h = _pcg_hash_k(prefix * U32(0x9E3779B9) ^ pixel_seed)
        sdigit = (digit + h) % base_u
        value = value + _small_u32_to_f32(sdigit) * jnp.float32(inv_mult)
        prefix = prefix * base_u + digit + U32(1)
        idx = quot
        inv_mult *= 1.0 / base
    return jnp.minimum(value, jnp.float32(1.0 - 1e-7))


# ---------------------------------------------------------------------------
# GGX pieces (ops/bsdf.py parity, component style)
# ---------------------------------------------------------------------------


def ggx_lambda_from_sqr_alpha_tan(s):
    return 0.5 * (jnp.sqrt(1.0 + s) - 1.0)


def ggx_d(alpha2, cos_nh):
    cos2 = jnp.minimum(sqr(cos_nh), 1.0)
    return alpha2 / (PI * sqr((1.0 - cos2) + alpha2 * cos2))


def ggx_lambda(alpha2, cos_n):
    s = alpha2 * jnp.maximum(0.0, 1.0 / jnp.maximum(sqr(cos_n), 1e-12) - 1.0)
    return ggx_lambda_from_sqr_alpha_tan(s)


def ggx_aniso_d(ax, ay, hx, hy, hz):
    rx = hx / ax
    ry = hy / ay
    len2 = rx * rx + ry * ry + hz * hz
    return INV_PI / jnp.maximum(ax * ay * sqr(len2), 1e-20)


def ggx_aniso_lambda(ax, ay, vx, vy, vz):
    s = (sqr(ax * vx) + sqr(ay * vy)) / jnp.maximum(sqr(vz), 1e-12)
    return ggx_lambda_from_sqr_alpha_tan(s)


def fresnel_conductor_c(cos_i, e, k):
    """Single-channel conductor Fresnel (ops/bsdf.py fresnel_conductor,
    reference bsdf.cuh:205-224); all args broadcastable planes/scalars."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    e2 = e * e
    k2 = k * k
    t0 = e2 - k2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * cos_i * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def fresnel_dielectric(cos_i, eta):
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_i = safe_sqrt(1.0 - sqr(cos_i))
    sin_t = sin_i / eta
    tir = sin_t >= 1.0
    cos_t = safe_sqrt(1.0 - sqr(sin_t))
    r_parl = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    f = 0.5 * (sqr(r_parl) + sqr(r_perp))
    return jnp.where(tir, 1.0, f), cos_t


def _poly_e(coef2d, deg, cos_no, alpha2):
    x = jnp.clip(cos_no, 0.0, 1.0)
    y = jnp.clip(alpha2, 0.0, 1.0)
    acc = jnp.zeros_like(x)
    for i in range(deg, -1, -1):
        row = jnp.zeros_like(x)
        for j in range(deg, -1, -1):
            row = row * y + float(coef2d[i, j])
        acc = acc * x + row
    return jnp.clip(acc, 1e-3, 1.0)


def _poly_eavg(coef1d, deg, alpha2):
    y = jnp.clip(alpha2, 0.0, 1.0)
    acc = jnp.zeros_like(y)
    for i in range(deg, -1, -1):
        acc = acc * y + float(coef1d[i])
    return jnp.clip(acc, 1e-3, 1.0)


def sample_ggx_vndf(lo, u1, u2, ax, ay):
    """Heitz VNDF in tangent space; lo = (x,y,z) local view. Returns local h."""
    v = vnormalize((ax * lo[0], ay * lo[1], lo[2]))
    lensq = sqr(v[0]) + sqr(v[1])
    inv_len = lax.rsqrt(jnp.maximum(lensq, 1e-14))
    use_frame = lensq > 1e-7
    t1 = (
        jnp.where(use_frame, -v[1] * inv_len, 1.0),
        jnp.where(use_frame, v[0] * inv_len, 0.0),
        jnp.zeros_like(v[0]),
    )
    c = vcross(v, t1)
    t2 = (
        jnp.where(use_frame, c[0], 0.0),
        jnp.where(use_frame, c[1], 1.0),
        jnp.where(use_frame, c[2], 0.0),
    )
    dx, dy = sample_uniform_disk(u1, u2)
    dy = safe_sqrt(1.0 - sqr(dx)) + (dy - safe_sqrt(1.0 - sqr(dx))) * (
        0.5 * (1.0 + v[2])
    )
    dz = safe_sqrt(1.0 - sqr(dx) - sqr(dy))
    nh = vadd(vadd(vscale(t1, dx), vscale(t2, dy)), vscale(v, dz))
    return vnormalize((ax * nh[0], ay * nh[1], jnp.maximum(nh[2], 0.0)))


def _acos_poly(x):
    """acos for x in [0,1]: Abramowitz-Stegun 4.4.45 7-term fit,
    |err| < 2e-8 (Mosaic has no acos lowering)."""
    x = jnp.clip(x, 0.0, 1.0)
    p = jnp.float32(-0.0012624911)
    p = p * x + jnp.float32(0.0066700901)
    p = p * x + jnp.float32(-0.0170881256)
    p = p * x + jnp.float32(0.0308918810)
    p = p * x + jnp.float32(-0.0501743046)
    p = p * x + jnp.float32(0.0889789874)
    p = p * x + jnp.float32(-0.2145988016)
    p = p * x + jnp.float32(1.5707963050)
    return p * safe_sqrt(1.0 - x)


def oren_nayar_g(cos_theta):
    pm = PI / 2.0 - 2.0 / 3.0
    small = cos_theta < 1e-6
    c = jnp.where(small, 0.5, cos_theta)
    sin_t = safe_sqrt(1.0 - sqr(c))
    theta = _acos_poly(c)
    main = sin_t * (theta - 2.0 / 3.0 - sin_t * c) + (2.0 / 3.0) * (
        sin_t / c
    ) * (1.0 - sqr(sin_t) * sin_t)
    return jnp.where(small, pm - cos_theta, main)


# ---------------------------------------------------------------------------
# kernel-side material fetch
# ---------------------------------------------------------------------------

# material table rows (f32): mtype, albedo xyz, on_sigma, alphax, alphay,
# phi0, eta, refl xyz, trans xyz, cond_eta xyz, cond_k xyz, emission xyz
MAT_ROWS = 24


def _fetch_material(mat_tab, mat_id, n_mats):
    """One-hot select of per-ray material params from the SMEM table."""
    out = [jnp.zeros_like(mat_id, dtype=jnp.float32) for _ in range(MAT_ROWS)]
    for m in range(n_mats):
        is_m = mat_id == m
        for r in range(MAT_ROWS):
            out[r] = jnp.where(is_m, mat_tab[r, m], out[r])
    return out


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _pt_kernel(
    use_bvh: bool,
    use_cond: bool,  # scene has GGX-conductor rows (static specialization)
    n_tris: int,
    n_mats: int,
    n_lights: int,
    n_emissive: int,  # 0 = scene has no area-light triangles
    max_depth: int,
    rr_start_depth: int,
    e_coeffs,  # (coef2d np, coef1d np, deg) baked as Python constants
    depth0,  # None = full in-kernel path loop; int = SINGLE-depth mode:
    # one bounce at this static depth with path state streamed in/out so
    # the host can re-sort rays between depths (trace_paths_fused_sorted)
    sampler_cfg,  # (kind, qmc_dims, seed) — "halton" needs STATIC dims,
    # so the depth loop Python-unrolls (full mode) / is single (sorted)
    # --- refs (three layouts, see trace_paths_fused) ---
    *refs,
):
    coef2d, coef1d, deg = e_coeffs
    smp_kind, qmc_dims, seed0 = sampler_cfg
    single = depth0 is not None
    if single:
        assert use_bvh, "single-depth mode is the BVH wavefront path"
        (ox, oy, oz, dx, dy, dz, pxr, pyr, smp,
         ibr, ibg, ibb, irr_, irg, irb, ialv, iins, ieta, ippdf, ipdel,
         nodemeta, mat_tab, light_tab, env, em_tab,
         tri, nodebox,
         oox, ooy, ooz, odx, ody, odz, obr, obg, obb,
         orr, org, orb, oalv, oins, oeta, oppdf, opdel,
         stack, lstack) = refs
        mat_id_tab = None
    elif use_bvh:
        (ox, oy, oz, dx, dy, dz, pxr, pyr, smp,
         nodemeta, mat_tab, light_tab, env, em_tab,
         tri, nodebox, lr, lg, lb, stack, lstack) = refs
        mat_id_tab = None
    else:
        (ox, oy, oz, dx, dy, dz, pxr, pyr, smp,
         tri, mat_id_tab, mat_tab, light_tab, env, em_tab,
         lr, lg, lb) = refs

    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    px = pxr[...]
    py = pyr[...]
    sample_seed = smp[...]
    shape = o[0].shape

    env_r = env[0]
    env_g = env[1]
    env_b = env[2]

    def closest_hit(o, d, alive=None):
        """Brute-force MT sweep; returns (hit, t, mat params, pos, ng, err).
        ``alive`` is ignored here — the dense sweep can't skip lanes."""
        t_best = jnp.full(shape, BIG_T, jnp.float32)
        i_best = jnp.zeros(shape, jnp.int32)

        def mt(t_idx, o, d, t_cap):
            v0x, v0y, v0z = tri[0, t_idx], tri[1, t_idx], tri[2, t_idx]
            e0x, e0y, e0z = tri[3, t_idx], tri[4, t_idx], tri[5, t_idx]
            e1x, e1y, e1z = tri[6, t_idx], tri[7, t_idx], tri[8, t_idx]
            px_ = d[1] * e1z - d[2] * e1y
            py_ = d[2] * e1x - d[0] * e1z
            pz_ = d[0] * e1y - d[1] * e1x
            det = px_ * e0x + py_ * e0y + pz_ * e0z
            parallel = jnp.abs(det) < MT_TOLERANCE
            inv_det = 1.0 / jnp.where(parallel, 1.0, det)
            tx = o[0] - v0x
            ty = o[1] - v0y
            tz = o[2] - v0z
            qx = ty * e0z - tz * e0y
            qy = tz * e0x - tx * e0z
            qz = tx * e0y - ty * e0x
            u = inv_det * (px_ * tx + py_ * ty + pz_ * tz)
            v = inv_det * (qx * d[0] + qy * d[1] + qz * d[2])
            t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
            valid = (
                (~parallel)
                & (u >= -MT_TOLERANCE)
                & (v >= -MT_TOLERANCE)
                & (u + v <= 1.0 + MT_TOLERANCE)
                & (t > T_MIN)
                & (t < t_cap)
            )
            return valid, t, u, v

        def body(t_idx, carry):
            t_best, i_best = carry
            valid, t, _, _ = mt(t_idx, o, d, t_best)
            t_best = jnp.where(valid, t, t_best)
            i_best = jnp.where(valid, t_idx, i_best)
            return t_best, i_best

        t_best, i_best = lax.fori_loop(0, n_tris, body, (t_best, i_best))
        hit = t_best < BIG_T

        # second sweep: fetch winner attributes (u, v, vertices, mat id)
        def fetch(t_idx, carry):
            (u_b, v_b, mat_b, p0, e0v, e1v) = carry
            win = i_best == t_idx
            _, _, u, v = mt(t_idx, o, d, jnp.full(shape, BIG_T, jnp.float32))
            u_b = jnp.where(win, u, u_b)
            v_b = jnp.where(win, v, v_b)
            mat_b = jnp.where(win, mat_id_tab[t_idx], mat_b)
            p0 = vwhere(win, (tri[0, t_idx], tri[1, t_idx], tri[2, t_idx]), p0)
            e0v = vwhere(win, (tri[3, t_idx], tri[4, t_idx], tri[5, t_idx]), e0v)
            e1v = vwhere(win, (tri[6, t_idx], tri[7, t_idx], tri[8, t_idx]), e1v)
            return (u_b, v_b, mat_b, p0, e0v, e1v)

        z = jnp.zeros(shape, jnp.float32)
        u_b, v_b, mat_b, p0, e0v, e1v = lax.fori_loop(
            0,
            n_tris,
            fetch,
            (z, z, jnp.zeros(shape, jnp.int32), (z, z, z), (z, z, z), (z, z, z)),
        )
        # attributes (intersect.closest_epilogue parity)
        pos = vadd(vadd(p0, vscale(e0v, u_b)), vscale(e1v, v_b))
        ng = vnormalize(vcross(e1v, e0v))
        ng = vwhere(vdot(d, ng) > 0.0, vneg(ng), ng)
        w_b = 1.0 - u_b - v_b
        p1 = vadd(p0, e0v)
        p2 = vadd(p0, e1v)
        err = (
            GAMMA7
            * (
                jnp.abs(u_b * p0[0]) + jnp.abs(v_b * p1[0]) + jnp.abs(w_b * p2[0])
            ),
            GAMMA7
            * (
                jnp.abs(u_b * p0[1]) + jnp.abs(v_b * p1[1]) + jnp.abs(w_b * p2[1])
            ),
            GAMMA7
            * (
                jnp.abs(u_b * p0[2]) + jnp.abs(v_b * p1[2]) + jnp.abs(w_b * p2[2])
            ),
        )
        return hit, t_best, mat_b, pos, ng, err

    def any_hit(o, d, t_max, alive=None):
        def body(t_idx, occ):
            v0x, v0y, v0z = tri[0, t_idx], tri[1, t_idx], tri[2, t_idx]
            e0x, e0y, e0z = tri[3, t_idx], tri[4, t_idx], tri[5, t_idx]
            e1x, e1y, e1z = tri[6, t_idx], tri[7, t_idx], tri[8, t_idx]
            pxx = d[1] * e1z - d[2] * e1y
            pyy = d[2] * e1x - d[0] * e1z
            pzz = d[0] * e1y - d[1] * e1x
            det = pxx * e0x + pyy * e0y + pzz * e0z
            parallel = jnp.abs(det) < MT_TOLERANCE
            inv_det = 1.0 / jnp.where(parallel, 1.0, det)
            tx = o[0] - v0x
            ty = o[1] - v0y
            tz = o[2] - v0z
            qx = ty * e0z - tz * e0y
            qy = tz * e0x - tx * e0z
            qz = tx * e0y - ty * e0x
            u = inv_det * (pxx * tx + pyy * ty + pzz * tz)
            v = inv_det * (qx * d[0] + qy * d[1] + qz * d[2])
            t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
            valid = (
                (~parallel)
                & (u >= -MT_TOLERANCE)
                & (v >= -MT_TOLERANCE)
                & (u + v <= 1.0 + MT_TOLERANCE)
                & (t > T_MIN)
                & (t < t_max)
            )
            return occ | valid.astype(jnp.int32)
        return (
            lax.fori_loop(0, n_tris, body, jnp.zeros(shape, jnp.int32)) > 0
        )

    if use_bvh:
        # BVH overrides: shared-stack packet traversal over the PackedBVH
        # tables (ops/bvh_pallas.tile_traverse) instead of the brute
        # sweeps; winner attributes accumulate during traversal so no
        # second fetch pass (and no per-lane gather) is needed.

        def closest_hit(o, d, alive=None):  # noqa: F811
            t_b, u_b, v_b, m_f, p0, e0v, e1v = tile_traverse(
                "attrs", o, d, nodemeta, nodebox, tri, stack, lstack,
                alive=alive
            )
            hit = t_b < BIG_T
            mat_b = m_f.astype(jnp.int32)
            pos = vadd(vadd(p0, vscale(e0v, u_b)), vscale(e1v, v_b))
            ng = vnormalize(vcross(e1v, e0v))
            ng = vwhere(vdot(d, ng) > 0.0, vneg(ng), ng)
            w_b = 1.0 - u_b - v_b
            p1 = vadd(p0, e0v)
            p2 = vadd(p0, e1v)
            err = tuple(
                GAMMA7
                * (
                    jnp.abs(u_b * p0[c])
                    + jnp.abs(v_b * p1[c])
                    + jnp.abs(w_b * p2[c])
                )
                for c in range(3)
            )
            return hit, t_b, mat_b, pos, ng, err

        def any_hit(o, d, t_max, alive=None):  # noqa: F811
            return (
                tile_traverse(
                    "any", o, d, nodemeta, nodebox, tri, stack, lstack,
                    tmax=t_max, alive=alive,
                )
                > 0
            )

    def offset_origin(p, err, ng, w):
        """vecmath.offset_ray_origin parity, ULP nudge via int bit-step."""
        dmag = jnp.abs(ng[0]) * err[0] + jnp.abs(ng[1]) * err[1] + jnp.abs(ng[2]) * err[2]
        flip = vdot(w, ng) < 0.0
        out = []
        for c in range(3):
            off = jnp.where(flip, -ng[c] * dmag, ng[c] * dmag)
            po = p[c] + off
            bits = lax.bitcast_convert_type(po, jnp.int32)
            up = off > 0.0
            # nextafter(po, ±inf): sign-magnitude step on the float bits
            nonneg = po >= 0.0
            step = jnp.where(up == nonneg, 1, -1).astype(jnp.int32)
            nudged = lax.bitcast_convert_type(bits + step, jnp.float32)
            out.append(jnp.where(po == 0.0, po, nudged))
        return tuple(out)

    def fresnel_tuple(f, tint):
        return (f * tint[0], f * tint[1], f * tint[2])

    def eval_and_sample(mat, wo, ns, inside, wi_light, u1, u2, uc):
        """Evaluate f·cos/pdf toward ``wi_light`` AND sample a bounce.

        Shares the material decode, tangent frame and Fresnel-at-view
        setup between the two (the XLA path does them separately).
        Returns (f_l (3,), pdf_l, bs_wi (3,), bs_f (3,), bs_pdf, bs_eta,
        bs_delta, bs_refract).
        """
        (mtype, alb_r, alb_g, alb_b, on_sigma, ax, ay, phi0, eta0,
         rt_r, rt_g, rt_b, tt_r, tt_g, tt_b,
         ce_r, ce_g, ce_b, ck_r, ck_g, ck_b, _em_r, _em_g, _em_b) = mat
        # OREN_NAYAR=0 / GGX_DIELECTRIC=1 / GGX_CONDUCTOR=2 / LAMBERT=3
        # (LAMBERT rides the Oren-Nayar path: Fujii ON with σ=0 is
        # exactly albedo·cos/π, and its multiscatter term vanishes)
        is_ggx = (mtype >= 0.5) & (mtype <= 2.5)
        is_cond = (mtype >= 1.5) & (mtype <= 2.5)
        albedo = (alb_r, alb_g, alb_b)
        refl_tint = (rt_r, rt_g, rt_b)
        if use_cond:
            # conductors never transmit (make_material_table defaults
            # keep trans_tint zero on conductor rows; enforce anyway)
            trans_tint = tuple(
                jnp.where(is_cond, 0.0, t) for t in (tt_r, tt_g, tt_b)
            )
        else:
            trans_tint = (tt_r, tt_g, tt_b)
        ce = (ce_r, ce_g, ce_b)
        ck = (ck_r, ck_g, ck_b)

        cos_no = vdot(ns, wo)

        # ---------- Oren-Nayar eval toward light ----------
        a_on = 1.0 / (PI + (PI / 2.0 - 2.0 / 3.0) * on_sigma)
        b_on = a_on * on_sigma
        nl = jnp.maximum(vdot(ns, wi_light), 0.0)
        nv = jnp.maximum(cos_no, 0.0)
        t_on = vdot(wi_light, wo) - nl * nv
        t_on = jnp.where(t_on > 0.0, t_on / (jnp.maximum(nl, nv) + 1e-38), t_on)
        single = a_on + b_on * t_on
        e_l = a_on * PI + b_on * oren_nayar_g(nl)
        e_v = a_on * PI + b_on * oren_nayar_g(nv)
        ms_l = (1.0 - e_v) * (1.0 - e_l)
        f_on = tuple(
            albedo[c] * nl * (single + jnp.maximum(albedo[c] * ms_l, 0.0))
            for c in range(3)
        )
        pdf_on_l = jnp.maximum(nl, 0.0) * INV_PI
        on_ok = nl > 0.0

        # ---------- Oren-Nayar sample ----------
        wi_d, pdf_d = sample_cos_hemisphere(ns, u1, u2)
        nl_d = jnp.maximum(vdot(ns, wi_d), 0.0)
        t_d = vdot(wi_d, wo) - nl_d * nv
        t_d = jnp.where(t_d > 0.0, t_d / (jnp.maximum(nl_d, nv) + 1e-38), t_d)
        single_d = a_on + b_on * t_d
        e_ld = a_on * PI + b_on * oren_nayar_g(nl_d)
        ms_d = (1.0 - e_v) * (1.0 - e_ld)
        f_on_d = tuple(
            albedo[c] * nl_d * (single_d + jnp.maximum(albedo[c] * ms_d, 0.0))
            for c in range(3)
        )

        # ---------- GGX shared setup ----------
        is_delta = jnp.maximum(ax, ay) < DELTA_ALPHA
        eta_eff = jnp.where(inside, 1.0 / eta0, eta0)
        inv_eta = 1.0 / eta_eff
        alpha2 = ax * ay
        # tangent frame rotated by phi0
        tfr, bfr = gram_schmidt(ns)
        cph = jnp.cos(phi0)
        sph = jnp.sin(phi0)
        x_axis = vadd(vscale(tfr, cph), vscale(bfr, sph))
        y_axis = vcross(ns, x_axis)
        lo = (vdot(x_axis, wo), vdot(y_axis, wo), cos_no)

        # multiscatter factor: Fss = trans_tint (dielectric) | F82-tint
        # fit (conductor) — ops/bsdf.py ggx_multiscatter_factor parity
        e_tab = _poly_e(coef2d, deg, cos_no, alpha2)
        eavg = _poly_eavg(coef1d, deg, alpha2)
        missing = (1.0 - e_tab) / e_tab
        if use_cond:
            one = jnp.ones(shape, jnp.float32)
            fss = []
            for c in range(3):
                f0_c = fresnel_conductor_c(one, ce[c], ck[c])
                f82_c = fresnel_conductor_c(one * (1.0 / 7.0), ce[c], ck[c])
                b_c = (
                    (f0_c + (1.0 - f0_c) * 0.46266436) - f82_c
                ) * 17.651384
                fss_c = (f0_c + (1.0 - f0_c) / 21.0) - b_c * (1.0 / 126.0)
                fss.append(jnp.where(is_cond, fss_c, trans_tint[c]))
        else:
            fss = list(trans_tint)
        ms_fac = tuple(
            1.0
            + (fss[c] * eavg / jnp.maximum(1.0 - fss[c] * (1.0 - eavg), 1e-4))
            * missing
            for c in range(3)
        )

        # ---------- GGX eval toward light ----------
        cos_ni_l = vdot(ns, wi_light)
        is_trans_l = cos_ni_l < 0.0
        ior_l = jnp.where(is_trans_l, eta_eff, 1.0)
        h_raw = vadd(vscale(wi_light, ior_l), wo)
        inv_len_h = 1.0 / jnp.sqrt(jnp.maximum(vdot(h_raw, h_raw), 1e-24))
        h_l = vscale(h_raw, inv_len_h)
        h_l = vwhere(vdot(h_l, ns) < 0.0, vneg(h_l), h_l)
        cos_ho_l = vdot(h_l, wo)
        f_diel_l, _ = fresnel_dielectric(cos_ho_l, eta_eff)
        if use_cond:
            refl_l = tuple(
                jnp.where(
                    is_cond,
                    fresnel_conductor_c(cos_ho_l, ce[c], ck[c]),
                    f_diel_l * refl_tint[c],
                )
                for c in range(3)
            )
        else:
            refl_l = fresnel_tuple(f_diel_l, refl_tint)
        trans_l = fresnel_tuple(1.0 - f_diel_l, trans_tint)
        cos_nh_l = vdot(ns, h_l)
        d_iso_l = ggx_d(alpha2, cos_nh_l)
        lam_i_iso_l = ggx_lambda(alpha2, jnp.abs(cos_ni_l))
        lam_o_iso = ggx_lambda(alpha2, cos_no)
        iso = ax == ay
        use_iso_l = iso | is_trans_l
        lh = (vdot(x_axis, h_l), vdot(y_axis, h_l), cos_nh_l)
        li = (vdot(x_axis, wi_light), vdot(y_axis, wi_light), cos_ni_l)
        d_val_l = jnp.where(use_iso_l, d_iso_l, ggx_aniso_d(ax, ay, *lh))
        lam_i_l = jnp.where(
            use_iso_l, lam_i_iso_l, ggx_aniso_lambda(ax, ay, *li)
        )
        lam_o_a = ggx_aniso_lambda(ax, ay, *lo)
        lam_o = jnp.where(use_iso_l, lam_o_iso, lam_o_a)
        common_l = (
            d_val_l
            / jnp.maximum(cos_no, 1e-6)
            * jnp.where(
                is_trans_l,
                sqr(ior_l * inv_len_h) * jnp.abs(cos_ho_l * vdot(h_l, wi_light)),
                0.25,
            )
        )
        avg_refl = (refl_l[0] + refl_l[1] + refl_l[2]) / 3.0
        avg_trans = (trans_l[0] + trans_l[1] + trans_l[2]) / 3.0
        denom_l = jnp.maximum(avg_refl + avg_trans, 1e-12)
        pdf_reflect_l = jnp.clip(avg_refl / denom_l, 0.0, 1.0)
        lobe_pdf_l = jnp.where(is_trans_l, 1.0 - pdf_reflect_l, pdf_reflect_l)
        pdf_ggx_l = lobe_pdf_l * common_l / (1.0 + lam_o)
        f_sel = tuple(
            jnp.where(is_trans_l, trans_l[c], refl_l[c] * ms_fac[c])
            for c in range(3)
        )
        g2_l = common_l / (1.0 + lam_o + lam_i_l)
        f_ggx_l = tuple(f_sel[c] * g2_l for c in range(3))
        avg_rt = (refl_tint[0] + refl_tint[1] + refl_tint[2]) / 3.0
        avg_tt = (trans_tint[0] + trans_tint[1] + trans_tint[2]) / 3.0
        if use_cond:
            has_refl = (avg_rt > THROUGHPUT_EPS) | is_cond
            has_trans = (avg_tt > THROUGHPUT_EPS) & ~is_cond
        else:
            has_refl = avg_rt > THROUGHPUT_EPS
            has_trans = avg_tt > THROUGHPUT_EPS
        cos_ngi_l = cos_ni_l  # ns == ng in this kernel (flat shading)
        ggx_bad_l = (
            (cos_no <= 0.0)
            | ((cos_ngi_l < 0.0) != is_trans_l)
            | is_delta
            | (~has_refl & (cos_ngi_l > 0.0))
            | (~has_trans & (cos_ngi_l < 0.0))
        )
        pdf_ggx_l = jnp.where(ggx_bad_l, 0.0, pdf_ggx_l)
        f_ggx_l = tuple(jnp.where(ggx_bad_l, 0.0, f_ggx_l[c]) for c in range(3))

        f_l = tuple(
            jnp.where(
                is_ggx, f_ggx_l[c], jnp.where(on_ok, f_on[c], 0.0)
            )
            for c in range(3)
        )
        pdf_l = jnp.where(is_ggx, pdf_ggx_l, jnp.where(on_ok, pdf_on_l, 0.0))

        # ---------- GGX sample ----------
        lh_s = sample_ggx_vndf(lo, u1, u2, ax, ay)
        h_rough = vadd(
            vadd(vscale(x_axis, lh_s[0]), vscale(y_axis, lh_s[1])),
            vscale(ns, lh_s[2]),
        )
        h_s = vwhere(is_delta, ns, h_rough)
        lh_sx = jnp.where(is_delta, 0.0, lh_s[0])
        lh_sy = jnp.where(is_delta, 0.0, lh_s[1])
        lh_sz = jnp.where(is_delta, 1.0, lh_s[2])
        cos_ho_s = vdot(h_s, wo)
        f_diel_s, cos_hi_s = fresnel_dielectric(cos_ho_s, eta_eff)
        if use_cond:
            refl_s = tuple(
                jnp.where(
                    is_cond,
                    fresnel_conductor_c(cos_ho_s, ce[c], ck[c]),
                    f_diel_s * refl_tint[c],
                )
                for c in range(3)
            )
        else:
            refl_s = fresnel_tuple(f_diel_s, refl_tint)
        trans_s = fresnel_tuple(1.0 - f_diel_s, trans_tint)
        avg_refl_s = (refl_s[0] + refl_s[1] + refl_s[2]) / 3.0
        avg_trans_s = (trans_s[0] + trans_s[1] + trans_s[2]) / 3.0
        denom_s = jnp.maximum(avg_refl_s + avg_trans_s, 1e-12)
        pdf_reflect_s = jnp.clip(avg_refl_s / denom_s, 0.0, 1.0)
        do_refract = uc > pdf_reflect_s
        wi_refl = vsub(vscale(h_s, 2.0 * cos_ho_s), wo)
        # refract_angle: c*h - inv_eta*wo with c = inv_eta*cos_ho - cos_t
        c_refr = inv_eta * vdot(wo, h_s) - cos_hi_s
        wi_refr = vsub(vscale(h_s, c_refr), vscale(wo, inv_eta))
        wi_g = vwhere(do_refract, wi_refr, wi_refl)
        bad_hemi = (vdot(ns, wi_g) <= 0.0) & ~do_refract
        lobe_pdf_s = jnp.where(do_refract, 1.0 - pdf_reflect_s, pdf_reflect_s)
        f_g_s = tuple(
            jnp.where(do_refract, trans_s[c], refl_s[c]) for c in range(3)
        )
        cos_ni_s = vdot(ns, wi_g)
        d_iso_s = ggx_d(alpha2, lh_sz)
        lam_i_iso_s = ggx_lambda(alpha2, cos_ni_s)
        use_iso_s = iso | do_refract
        li_s = (
            2.0 * cos_ho_s * lh_sx - lo[0],
            2.0 * cos_ho_s * lh_sy - lo[1],
            2.0 * cos_ho_s * lh_sz - lo[2],
        )
        d_val_s = jnp.where(
            use_iso_s, d_iso_s, ggx_aniso_d(ax, ay, lh_sx, lh_sy, lh_sz)
        )
        lam_i_s = jnp.where(
            use_iso_s, lam_i_iso_s, ggx_aniso_lambda(ax, ay, *li_s)
        )
        lam_o_s = jnp.where(use_iso_s, lam_o_iso, lam_o_a)
        common_s = (
            d_val_s
            / jnp.maximum(cos_no, 1e-6)
            * jnp.where(
                do_refract,
                jnp.abs(cos_ho_s * cos_hi_s)
                / jnp.maximum(sqr(cos_hi_s + cos_ho_s * inv_eta), 1e-8),
                0.25,
            )
        )
        pdf_rough = lobe_pdf_s * common_s / (1.0 + lam_o_s)
        g2_s = common_s / (1.0 + lam_o_s + lam_i_s)
        f_rough = tuple(f_g_s[c] * g2_s for c in range(3))
        f_rough = tuple(
            jnp.where(do_refract, f_rough[c], f_rough[c] * ms_fac[c])
            for c in range(3)
        )
        pdf_ggx_s = jnp.where(is_delta, lobe_pdf_s, pdf_rough)
        f_ggx_s = tuple(
            jnp.where(is_delta, f_g_s[c] * lobe_pdf_s, f_rough[c])
            for c in range(3)
        )
        zero_fres = (avg_refl_s < THROUGHPUT_EPS) & (avg_trans_s < THROUGHPUT_EPS)
        ggx_invalid = bad_hemi | zero_fres
        pdf_ggx_s = jnp.where(ggx_invalid, 0.0, pdf_ggx_s)
        f_ggx_s = tuple(jnp.where(ggx_invalid, 0.0, f_ggx_s[c]) for c in range(3))

        # diffuse sample validity (above horizon — ns==ng here)
        above = vdot(ns, wi_d) > 0.0
        f_on_d = tuple(jnp.where(above, f_on_d[c], 0.0) for c in range(3))
        pdf_d_v = jnp.where(above, pdf_d, 0.0)

        bs_wi = vwhere(is_ggx, wi_g, wi_d)
        bs_f = tuple(jnp.where(is_ggx, f_ggx_s[c], f_on_d[c]) for c in range(3))
        bs_pdf = jnp.where(is_ggx, pdf_ggx_s, pdf_d_v)
        bs_refract = is_ggx & do_refract & ~ggx_invalid
        bs_eta = jnp.where(bs_refract, eta_eff, 1.0)
        bs_delta = is_ggx & is_delta

        # valid_side: wo against geometric normal (== ns)
        valid_side = cos_no > 0.0
        f_l = tuple(jnp.where(valid_side, f_l[c], 0.0) for c in range(3))
        pdf_l = jnp.where(valid_side, pdf_l, 0.0)
        bs_f = tuple(jnp.where(valid_side, bs_f[c], 0.0) for c in range(3))
        bs_pdf = jnp.where(valid_side, bs_pdf, 0.0)
        return f_l, pdf_l, bs_wi, bs_f, bs_pdf, bs_eta, bs_delta, bs_refract

    def sample_point_spot(lt_row, pos, normal, u1, u2):
        """ops/lights.py sample_light parity for POINT/SPOT rows.

        lt_row = per-light scalars from SMEM. Returns (dir, distance,
        pdf, le (3,)). ``le`` includes the angular factor and 1/d².
        """
        (ltype, col_r, col_g, col_b, lpx, lpy, lpz, ldx, ldy, ldz,
         cos0, cose, radius) = lt_row
        lpos = (lpx, lpy, lpz)
        sdir = (ldx, ldy, ldz)
        radius_sqr = sqr(radius)
        to_p = vsub(pos, lpos)
        dist_sqr = jnp.maximum(vdot(to_p, to_p), 1e-20)
        dist = jnp.sqrt(dist_sqr)
        light_n = vscale(to_p, 1.0 / dist)
        outside = dist_sqr > radius_sqr
        eff_delta0 = (radius / dist) < 1e-3
        omc = sin_sqr_to_one_minus_cos(radius_sqr / dist_sqr)
        d_out, cos_out, pdf_out, delta_out = sample_uniform_cone(
            vneg(light_n), omc, u1, u2
        )
        # inside branch: cosine hemisphere (transmission path not carried
        # into NEE here, matching _nee's had_transmission=zeros)
        d_hemi, pdf_hemi = sample_cos_hemisphere(normal, u1, u2)
        cos_in = -vdot(d_hemi, light_n)
        dvec = vwhere(outside, d_out, d_hemi)
        cos_theta = jnp.where(outside, cos_out, cos_in)
        pdf = jnp.where(outside, pdf_out, pdf_hemi)
        delta = outside & (delta_out | eff_delta0)
        pdf = jnp.where(delta, 1.0, pdf)
        distance = dist * cos_theta - _copysign(
            safe_sqrt(radius_sqr - dist_sqr + dist_sqr * sqr(cos_theta)),
            dist_sqr - radius_sqr,
        )
        p_light = vadd(pos, vscale(dvec, distance))

        is_spot = ltype > 0.5
        omc_spread = 1.0 - cose
        omc_sphere = sin_sqr_to_one_minus_cos(radius_sqr / dist_sqr)
        toward_apex = omc_sphere < omc_spread
        d_cone, _, pdf_cone, delta_cone = sample_uniform_cone(
            vneg(sdir), omc_spread, u1, u2
        )
        # ray-sphere for the cone sample
        dvec_c = vsub(lpos, pos)
        d_sq = vdot(dvec_c, dvec_c)
        d_cos = vdot(dvec_c, d_cone)
        away = (d_sq > radius_sqr) & (d_cos < 0.0)
        perp = vsub(dvec_c, vscale(d_cone, d_cos))
        sin_sq = vdot(perp, perp)
        outside_ray = sin_sq > radius_sqr
        t_s = d_cos - _copysign(safe_sqrt(radius_sqr - sin_sq), d_sq - radius_sqr)
        hit_s = (~away) & (~outside_ray) & (t_s > 0.0) & (t_s < BIG_DIST)
        p_s = vadd(pos, vscale(d_cone, t_s))

        use_cone = is_spot & outside & ~toward_apex
        dvec = vwhere(use_cone, d_cone, dvec)
        pdf = jnp.where(use_cone, jnp.where(hit_s, pdf_cone, 0.0), pdf)
        # logical form, not jnp.where: an i1-select of booleans lowers to
        # an i8→i1 trunci Mosaic cannot compile (surfaced r4 when the
        # prev_delta carry joined the loop)
        delta = (use_cone & delta_cone & hit_s) | (~use_cone & delta)
        distance = jnp.where(use_cone, t_s, distance)
        p_light = vwhere(use_cone, p_s, p_light)

        cos_spot = vdot(vneg(dvec), sdir)
        att = smoothstep(cose, cos0, cos_spot)
        factor = jnp.where(is_spot, att, jnp.ones(shape, jnp.float32))
        pdf = jnp.where(is_spot & (att <= 0.0), 0.0, pdf)
        eff_delta = is_spot & ((radius / dist) < 1e-3) & (pdf > 0.0)
        delta = delta | eff_delta
        pdf = jnp.where(eff_delta, 1.0, pdf)
        # re-project onto the sphere
        spot_like = is_spot & (pdf > 0.0)
        ngl = vnormalize(vsub(p_light, lpos))
        p_proj = vadd(vscale(ngl, radius), lpos)
        new_dir = vsub(p_proj, pos)
        new_dist = jnp.sqrt(jnp.maximum(vdot(new_dir, new_dir), 0.0))
        proj_ok = spot_like & (new_dist > 1e-8)
        dvec = vwhere(
            proj_ok, vscale(new_dir, 1.0 / jnp.maximum(new_dist, 1e-8)), dvec
        )
        distance = jnp.where(proj_ok, new_dist, distance)

        atten = 1.0 / jnp.maximum(sqr(distance), 1e-12)
        le = (col_r * factor * atten, col_g * factor * atten, col_b * factor * atten)
        return dvec, distance, pdf, le

    def bounce(depth, carry):
        (o, d, beta, radiance, alive_i, inside_i, eta_scale,
         prev_pdf, prev_delta_i) = carry
        alive = alive_i > 0
        inside = inside_i > 0
        prev_delta = prev_delta_i > 0
        if isinstance(depth, int):  # static dims (single-depth / unrolled)
            depth_dim = U32(depth * 24)  # DIMS_PER_BOUNCE
        else:
            depth_dim = depth.astype(U32) * U32(24)

        use_qmc = smp_kind == "halton" and isinstance(depth, int)
        if use_qmc:
            sample_raw = sample_seed ^ U32(seed0)

        def samp_1d(rel: int):
            if use_qmc and depth * 24 + rel < qmc_dims:
                return halton_1d(
                    px, py, sample_raw, depth * 24 + rel, seed0
                )
            return rng_1d(px, py, sample_seed, depth_dim + U32(rel))

        def samp_2d(rel: int):
            if use_qmc and depth * 24 + rel + 1 < qmc_dims:
                dim = depth * 24 + rel
                return (
                    halton_1d(px, py, sample_raw, dim, seed0),
                    halton_1d(px, py, sample_raw, dim + 1, seed0),
                )
            return rng_2d(px, py, sample_seed, depth_dim + U32(rel))

        hit, t_hit, mat_id, pos, ng, err = closest_hit(o, d, alive)

        # miss → constant environment (env_nee off)
        miss = alive & ~hit
        radiance = (
            radiance[0] + jnp.where(miss, beta[0] * env_r, 0.0),
            radiance[1] + jnp.where(miss, beta[1] * env_g, 0.0),
            radiance[2] + jnp.where(miss, beta[2] * env_b, 0.0),
        )
        alive = alive & hit

        wo = vneg(d)
        mat = tuple(_fetch_material(mat_tab, mat_id, n_mats))
        pmf = 1.0 / float(n_lights)

        if n_emissive:
            # directly-hit emitter, MIS vs the area-NEE estimator
            # (bounce_step parity; two-sided emission). NEE density for
            # hitting THIS point = pmf · dist²/(cosθ·total_area).
            area_tot = em_tab[14, 0]
            cos_l = jnp.abs(vdot(d, ng))
            pdf_hit = (
                sqr(t_hit) / jnp.maximum(cos_l * area_tot, 1e-12) * pmf
            )
            w_em = jnp.where(
                prev_delta,
                1.0,
                sqr(prev_pdf)
                / jnp.maximum(sqr(prev_pdf) + sqr(pdf_hit), 1e-24),
            )
            radiance = tuple(
                radiance[c]
                + jnp.where(alive, beta[c] * mat[21 + c] * w_em, 0.0)
                for c in range(3)
            )

        # --- NEE: uniform light pick (megakernel.cu:176 / _nee parity) ---
        ul = samp_1d(2)  # LIGHT_SELECT
        lidx = jnp.minimum(
            (ul * float(n_lights)).astype(jnp.int32), n_lights - 1
        )
        u1l, u2l = samp_2d(3)  # LIGHT_U
        lrow = [jnp.zeros(shape, jnp.float32) for _ in range(13)]
        for li_ in range(n_lights):
            is_l = lidx == li_
            for r in range(13):
                lrow[r] = jnp.where(is_l, light_tab[r, li_], lrow[r])
        ldir, ldist, lpdf, le = sample_point_spot(
            tuple(lrow), pos, ng, u1l, u2l
        )
        is_area = lrow[0] > 3.5  # AREA = 4
        if n_emissive:
            # area rows: uniform-by-area sample of the emissive set
            # (ops/lights.py sample_area_light parity)
            cdf_sel = [jnp.zeros(shape, jnp.float32) for _ in range(14)]
            for k in range(n_emissive):
                clo = em_tab[12, k]
                chi = em_tab[13, k]
                if k == n_emissive - 1:
                    sel = u1l >= clo  # closed last bin (u1 == 1.0)
                else:
                    sel = (u1l >= clo) & (u1l < chi)
                for r in range(14):
                    cdf_sel[r] = jnp.where(sel, em_tab[r, k], cdf_sel[r])
            tv0 = (cdf_sel[0], cdf_sel[1], cdf_sel[2])
            te0 = (cdf_sel[3], cdf_sel[4], cdf_sel[5])
            te1 = (cdf_sel[6], cdf_sel[7], cdf_sel[8])
            trad = (cdf_sel[9], cdf_sel[10], cdf_sel[11])
            du = (u1l - cdf_sel[12]) / jnp.maximum(
                cdf_sel[13] - cdf_sel[12], 1e-12
            )
            su = safe_sqrt(du)
            b1 = 1.0 - su
            b2 = u2l * su
            p_em = vadd(vadd(tv0, vscale(te0, b1)), vscale(te1, b2))
            n_e = vcross(te0, te1)
            n_len = jnp.maximum(
                jnp.sqrt(jnp.maximum(vdot(n_e, n_e), 0.0)), 1e-12
            )
            n_e = vscale(n_e, 1.0 / n_len)
            to_p = vsub(p_em, pos)
            dist_sqr = jnp.maximum(vdot(to_p, to_p), 1e-12)
            dist_a = jnp.sqrt(dist_sqr)
            d_a = vscale(to_p, 1.0 / dist_a)
            cos_e = jnp.abs(vdot(d_a, n_e))  # two-sided emission
            area_tot = em_tab[14, 0]
            pdf_a = jnp.where(
                cos_e > 1e-6,
                dist_sqr / jnp.maximum(cos_e * area_tot, 1e-12),
                0.0,
            )
            le_a = tuple(
                jnp.where(cos_e > 1e-6, trad[c], 0.0) for c in range(3)
            )
            ldir = vwhere(is_area, d_a, ldir)
            ldist = jnp.where(is_area, dist_a * 0.999, ldist)
            lpdf = jnp.where(is_area, pdf_a, lpdf)
            le = tuple(
                jnp.where(is_area, le_a[c], le[c]) for c in range(3)
            )

        u1b, u2b = samp_2d(5)  # BSDF_U
        ucb = samp_1d(7)  # BSDF_UC

        (f_l, pdf_l, bs_wi, bs_f, bs_pdf, bs_eta, bs_delta, bs_refract
         ) = eval_and_sample(mat, wo, ng, inside, ldir, u1b, u2b, ucb)

        shadow_o = offset_origin(pos, err, ng, ldir)
        if _DEBUG_SKIP_SHADOW:  # timing-only attribution (wrong image)
            occluded = jnp.zeros(shape, jnp.bool_)
        else:
            occluded = any_hit(shadow_o, ldir, ldist, alive)
        ok = (lpdf > 0.0) & ~occluded & alive
        # point/spot rows: NEE-only delta-ish emitters → le·f/pmf.
        # area rows: scene geometry → one-sample power-heuristic MIS on
        # the full density pmf·pdf (bounce_step/_nee parity).
        nee_scale = jnp.full(shape, 1.0 / pmf)
        if n_emissive:
            pdf_tot = lpdf * pmf
            w_a = sqr(pdf_tot) / jnp.maximum(
                sqr(pdf_tot) + sqr(pdf_l), 1e-24
            )
            nee_scale = jnp.where(
                is_area, w_a / jnp.maximum(pdf_tot, 1e-12), nee_scale
            )
        radiance = (
            radiance[0]
            + jnp.where(ok, beta[0] * le[0] * f_l[0] * nee_scale, 0.0),
            radiance[1]
            + jnp.where(ok, beta[1] * le[1] * f_l[1] * nee_scale, 0.0),
            radiance[2]
            + jnp.where(ok, beta[2] * le[2] * f_l[2] * nee_scale, 0.0),
        )

        # --- bounce ---
        valid = bs_pdf > 0.0
        inv_pdf = 1.0 / jnp.maximum(bs_pdf, 1e-12)
        beta = (
            beta[0] * jnp.where(valid, bs_f[0] * inv_pdf, 1.0),
            beta[1] * jnp.where(valid, bs_f[1] * inv_pdf, 1.0),
            beta[2] * jnp.where(valid, bs_f[2] * inv_pdf, 1.0),
        )
        alive = alive & valid
        o_new = offset_origin(pos, err, ng, bs_wi)
        inside = inside ^ (bs_refract & alive)
        eta_scale = jnp.where(
            bs_refract & alive, eta_scale * sqr(bs_eta), eta_scale
        )

        # russian roulette (megakernel.cu:283-295 parity with megakernel.py)
        if not (isinstance(depth, int) and depth < rr_start_depth):
            rr_beta = jnp.maximum(
                jnp.maximum(beta[0], beta[1]), beta[2]
            ) * eta_scale
            u_rr = samp_1d(8)  # RR
            q = jnp.maximum(0.0, 1.0 - rr_beta)
            do_rr = rr_beta < 1.0
            if not isinstance(depth, int):
                do_rr = do_rr & (depth >= rr_start_depth)
            killed = do_rr & (u_rr < q)
            surv = jnp.where(
                do_rr & ~killed, 1.0 / jnp.maximum(1.0 - q, 1e-6), 1.0
            )
            beta = (beta[0] * surv, beta[1] * surv, beta[2] * surv)
            alive = alive & ~killed

        o = vwhere(alive, o_new, o)
        d = vwhere(alive, bs_wi, d)
        prev_pdf = jnp.where(alive, bs_pdf, prev_pdf)
        prev_delta = (alive & bs_delta) | (~alive & prev_delta)
        return (
            o, d, beta, radiance,
            alive.astype(jnp.int32), inside.astype(jnp.int32), eta_scale,
            prev_pdf, prev_delta.astype(jnp.int32),
        )

    if single:
        carry = (
            o, d,
            (ibr[...], ibg[...], ibb[...]),
            (irr_[...], irg[...], irb[...]),
            ialv[...], iins[...], ieta[...], ippdf[...], ipdel[...],
        )
        (o2, d2, beta2, rad2, alv2, ins2, eta2, ppdf2, pdel2) = bounce(
            depth0, carry
        )
        oox[...], ooy[...], ooz[...] = o2[0], o2[1], o2[2]
        odx[...], ody[...], odz[...] = d2[0], d2[1], d2[2]
        obr[...], obg[...], obb[...] = beta2[0], beta2[1], beta2[2]
        orr[...], org[...], orb[...] = rad2[0], rad2[1], rad2[2]
        oalv[...] = alv2
        oins[...] = ins2
        oeta[...] = eta2
        oppdf[...] = ppdf2
        opdel[...] = pdel2
        return

    beta = tuple(jnp.ones(shape, jnp.float32) for _ in range(3))
    radiance = tuple(jnp.zeros(shape, jnp.float32) for _ in range(3))
    alive_i = jnp.ones(shape, jnp.int32)
    inside_i = jnp.zeros(shape, jnp.int32)
    eta_scale = jnp.ones(shape, jnp.float32)
    prev_pdf0 = jnp.ones(shape, jnp.float32)
    prev_delta0 = jnp.ones(shape, jnp.int32)  # camera counts as delta
    carry = (
        o, d, beta, radiance, alive_i, inside_i, eta_scale,
        prev_pdf0, prev_delta0,
    )
    if smp_kind == "halton":
        # Halton needs static dims (prime-base selection): unroll the
        # depth loop in Python (bigger kernel, same math)
        for dd in range(max_depth):
            carry = bounce(dd, carry)
    else:
        carry = lax.fori_loop(0, max_depth, bounce, carry)
    radiance = carry[3]
    lr[...] = radiance[0]
    lg[...] = radiance[1]
    lb[...] = radiance[2]


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def pallas_megakernel_supported(scene: Scene, cfg) -> bool:
    """Static feature check: can the fused kernel render (scene, cfg)?

    BVH scenes are supported since r4 (in-kernel packet traversal); the
    node meta table must fit the 256 KB SMEM input budget."""
    import numpy as np

    if scene.textures is not None or scene.instances is not None:
        return False
    if scene.bvh is not None and scene.bvh.meta.nbytes > 255 * 1024:
        return False
    if scene.light_tree is not None:
        return False
    if scene.tri_ns is not None:
        return False
    if cfg.sampler not in ("hash", "halton") or cfg.env_nee:
        return False
    if getattr(cfg, "light_strategy", "auto") == "tree":
        return False
    from ..ops.bsdf import LAMBERT

    mtypes = set(np.asarray(scene.materials.mtype).tolist())
    if not mtypes <= {OREN_NAYAR, GGX_DIELECTRIC, GGX_CONDUCTOR, LAMBERT}:
        return False
    ltypes = set(np.asarray(scene.lights.ltype).tolist())
    if not ltypes <= {0, 1, 4}:  # POINT, SPOT, AREA (r4)
        return False
    if scene.emissive is not None and scene.emissive.v0.shape[0] > 64:
        return False  # emissive set streams from SMEM as scalar selects
    # constant env only (all texels equal — constant_envmap broadcasts
    # the color to a (32,1,3) map)
    img = np.asarray(scene.env.image).reshape(-1, 3)
    if not np.all(img == img[0]):
        return False
    return True


def _shade_tables(scene: Scene):
    """SMEM tables: materials (24,M), lights (13,L), env color (3,),
    emissive triangles (15, max(K,1)) [v0|e0|e1|rad|cdf_lo|cdf_hi|area]."""
    m = scene.materials
    mat_tab = jnp.stack(
        [
            m.mtype.astype(jnp.float32),
            m.albedo[:, 0], m.albedo[:, 1], m.albedo[:, 2],
            m.on_sigma, m.alphax, m.alphay, m.phi0, m.eta,
            m.refl_tint[:, 0], m.refl_tint[:, 1], m.refl_tint[:, 2],
            m.trans_tint[:, 0], m.trans_tint[:, 1], m.trans_tint[:, 2],
            m.cond_eta[:, 0], m.cond_eta[:, 1], m.cond_eta[:, 2],
            m.cond_k[:, 0], m.cond_k[:, 1], m.cond_k[:, 2],
            m.emission[:, 0], m.emission[:, 1], m.emission[:, 2],
        ],
        axis=0,
    )[:MAT_ROWS]
    lt = scene.lights
    light_tab = jnp.stack(
        [
            lt.ltype.astype(jnp.float32),
            lt.color[:, 0], lt.color[:, 1], lt.color[:, 2],
            lt.pos[:, 0], lt.pos[:, 1], lt.pos[:, 2],
            lt.direction[:, 0], lt.direction[:, 1], lt.direction[:, 2],
            lt.cos_theta0, lt.cos_theta_e, lt.radius,
        ],
        axis=0,
    )
    env_color = scene.env.image.reshape(-1, 3)[0] * scene.env.scale
    if scene.emissive is not None:
        em = scene.emissive
        em_tab = jnp.concatenate(
            [
                em.v0.T, em.e0.T, em.e1.T, em.rad.T,
                em.cdf[:-1][None, :], em.cdf[1:][None, :],
                jnp.broadcast_to(em.area, (1, em.v0.shape[0])),
            ],
            axis=0,
        )  # (15, K)
    else:
        em_tab = jnp.zeros((15, 1), jnp.float32)
    return mat_tab, light_tab, env_color, em_tab


def _scene_tables(scene: Scene):
    """Brute-force-path SMEM tables: tri (9,T), mat ids (T,), + shade."""
    tri = jnp.stack(
        [
            scene.tri_v0[:, 0], scene.tri_v0[:, 1], scene.tri_v0[:, 2],
            scene.tri_e0[:, 0], scene.tri_e0[:, 1], scene.tri_e0[:, 2],
            scene.tri_e1[:, 0], scene.tri_e1[:, 1], scene.tri_e1[:, 2],
        ],
        axis=0,
    )
    mat_tab, light_tab, env_color, em_tab = _shade_tables(scene)
    return tri, scene.tri_mat, mat_tab, light_tab, env_color, em_tab


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "rr_start_depth", "seed", "interpret", "conductor",
        "sampler", "qmc_dims",
    ),
)
def trace_paths_fused(
    scene: Scene,
    px,
    py,
    sample,
    o,
    d,
    max_depth: int = 5,
    rr_start_depth: int = 2,
    seed: int = 0,
    interpret: bool = False,
    conductor: bool = True,  # static: emit the GGX-conductor code path
    # (pass cfg.features.conductor to specialize it away)
    sampler: str = "hash",  # "hash" | "halton" (r5: in-kernel Owen-
    # scrambled Halton with a Python-unrolled depth loop)
    qmc_dims: int = 12,
):
    """Fused-path-loop radiance for rays (o, d) — drop-in for
    megakernel.trace_paths on supported scenes (forward only)."""
    use_bvh = scene.bvh is not None
    block_rows = BLOCK_ROWS_BVH if use_bvh else BLOCK_ROWS
    n = o.shape[0]
    block = block_rows * LANES
    pad = (-n) % block
    sample_seed = jnp.broadcast_to(
        jnp.asarray(sample, U32) ^ U32(seed), (n,)
    ).astype(U32)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        px = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
        py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
        sample_seed = jnp.concatenate(
            [sample_seed, jnp.zeros((pad,), sample_seed.dtype)]
        )
    rows = (n + pad) // LANES
    planes = (
        [o[:, i].reshape(rows, LANES) for i in range(3)]
        + [d[:, i].reshape(rows, LANES) for i in range(3)]
        + [
            px.astype(U32).reshape(rows, LANES),
            py.astype(U32).reshape(rows, LANES),
            sample_seed.reshape(rows, LANES),
        ]
    )
    if use_bvh:
        tri, mat_ids = None, None
        mat_tab, light_tab, env_color, em_tab = _shade_tables(scene)
        n_tris = scene.tri_v0.shape[0]
    else:
        tri, mat_ids, mat_tab, light_tab, env_color, em_tab = _scene_tables(
            scene
        )
        n_tris = tri.shape[1]
    n_mats = mat_tab.shape[1]
    n_lights = light_tab.shape[1]
    n_emissive = (
        scene.emissive.v0.shape[0] if scene.emissive is not None else 0
    )

    grid = rows // block_rows
    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    e_coeffs = _e_poly_coeffs()
    kern = functools.partial(
        _pt_kernel,
        use_bvh,
        conductor,
        n_tris,
        n_mats,
        n_lights,
        n_emissive,
        max_depth,
        rr_start_depth,
        (np.asarray(e_coeffs[0]), np.asarray(e_coeffs[1]), e_coeffs[2]),
        None,
        (sampler, qmc_dims, seed),
    )

    if use_bvh:
        tri_pack = tri_rows_pack(
            scene.tri_v0, scene.tri_e0, scene.tri_e1, scene.tri_mat
        )
        bvh_box, bvh_meta, tri_pack = degen_tables(
            scene.bvh.box, scene.bvh.meta, tri_pack
        )
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[ray_spec] * 9 + [smem] * 5 + [full] * 2,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3,
            scratch_shapes=[
                pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                pltpu.SMEM((LEAF_STACK_DEPTH,), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(rows) * LANES * max_depth * 40_000,
                bytes_accessed=int(rows) * LANES * 15 * 4
                + int(grid) * (tri_pack.size + scene.bvh.box.size) * 4,
                transcendentals=int(rows) * LANES * max_depth * 12,
            ),
            interpret=interpret,
        )(
            *planes, bvh_meta, mat_tab, light_tab, env_color, em_tab,
            tri_pack, bvh_box,
        )
    else:
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[ray_spec] * 9 + [smem] * 6,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=int(rows) * LANES * max_depth * (n_tris * 90 + 900),
                bytes_accessed=int(rows) * LANES * 15 * 4,
                transcendentals=int(rows) * LANES * max_depth * 12,
            ),
            interpret=interpret,
        )(*planes, tri, mat_ids, mat_tab, light_tab, env_color, em_tab)
    radiance = jnp.stack([p.reshape(-1)[:n] for p in out], axis=-1)
    return radiance


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "rr_start_depth", "seed", "interpret", "conductor",
        "sampler", "qmc_dims",
    ),
)
def trace_paths_fused_sorted(
    scene: Scene,
    px,
    py,
    sample,
    o,
    d,
    max_depth: int = 5,
    rr_start_depth: int = 2,
    seed: int = 0,
    interpret: bool = False,
    conductor: bool = True,
    sampler: str = "hash",
    qmc_dims: int = 12,
):
    """Depth-sorted fused wavefront: ONE bounce kernel per depth with an
    XLA ray re-sort between depths.

    This is the r5 answer to the mesh-BVH throughput gap (VERDICT r4
    next-1): the whole-path fused kernel loses 4.5× on mesh scenes
    because its bounce tiles decohere with no way to re-sort inside one
    kernel, while the XLA wavefront pays ~50% of its pass time in
    per-depth shading fusions, separate anyhit dispatches and copies
    (xplane breakdown, docs/perf_notes.md r5). Here each depth runs the
    ENTIRE bounce — packet-BVH closest hit, NEE + in-kernel shadow
    traversal, BSDF sample, RR — as one Pallas kernel over
    octant/Morton-sorted tiles, and the only XLA work between depths is
    one co-sort of the path state (the reference wavefront-stream's
    queue regrouping, wavefront-stream/main.cu:221-319, recast as a
    sort). Depth 0 skips the sort: camera rays arrive pixel-ordered.

    Same feature scope as trace_paths_fused (pallas_megakernel_supported)
    restricted to BVH scenes; forward-only."""
    assert scene.bvh is not None, "sorted mode is for BVH scenes"
    from ..ops.raysort import ray_sort_key, scene_bounds

    n = o.shape[0]
    block = BLOCK_ROWS_BVH * LANES
    pad = (-n) % block
    npad = n + pad
    sample_seed = jnp.broadcast_to(
        jnp.asarray(sample, U32) ^ U32(seed), (n,)
    ).astype(U32)

    def padf(x, val=0.0):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,), val, x.dtype)]
        )

    zf = jnp.zeros((npad,), jnp.float32)
    onef = jnp.ones((npad,), jnp.float32)
    state = (
        padf(o[:, 0]), padf(o[:, 1]), padf(o[:, 2]),
        padf(d[:, 0]), padf(d[:, 1]), padf(d[:, 2]),
        onef, onef, onef,  # beta
        zf, zf, zf,  # radiance
        padf(jnp.ones((n,), jnp.int32), 0),  # alive (pad rays dead)
        jnp.zeros((npad,), jnp.int32),  # inside
        onef,  # eta_scale
        onef,  # prev_pdf
        jnp.ones((npad,), jnp.int32),  # prev_delta (camera = delta)
    )
    keyed = (
        padf(px.astype(U32), 0),
        padf(py.astype(U32), 0),
        padf(sample_seed, 0),
        jnp.arange(npad, dtype=U32),  # original slot (final unsort)
    )

    mat_tab, light_tab, env_color, em_tab = _shade_tables(scene)
    n_mats = mat_tab.shape[1]
    n_lights = light_tab.shape[1]
    n_emissive = (
        scene.emissive.v0.shape[0] if scene.emissive is not None else 0
    )
    tri_pack = tri_rows_pack(
        scene.tri_v0, scene.tri_e0, scene.tri_e1, scene.tri_mat
    )
    bvh_box, bvh_meta, tri_pack = degen_tables(
        scene.bvh.box, scene.bvh.meta, tri_pack
    )
    blo, bhi = scene_bounds(scene.tri_v0, scene.tri_e0, scene.tri_e1)

    rows = npad // LANES
    grid = rows // BLOCK_ROWS_BVH
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS_BVH, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    e_coeffs = _e_poly_coeffs()
    e_np = (np.asarray(e_coeffs[0]), np.asarray(e_coeffs[1]), e_coeffs[2])
    n_tris = scene.tri_v0.shape[0]

    # output order: o(3) d(3) beta(3) rad(3) alive inside eta ppdf pdel
    out_shapes = (
        [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 12
        + [
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ]
    )

    for depth in range(max_depth):
        if depth > 0:
            o3 = jnp.stack(state[0:3], axis=1)
            d3 = jnp.stack(state[3:6], axis=1)
            key = ray_sort_key(o3, d3, blo, bhi, state[12] > 0)
            srt = lax.sort((key,) + state + keyed, num_keys=1, is_stable=True)
            state = srt[1:18]
            keyed = srt[18:]
        kern = functools.partial(
            _pt_kernel, True, conductor, n_tris, n_mats, n_lights,
            n_emissive, max_depth, rr_start_depth, e_np, depth,
            (sampler, qmc_dims, seed),
        )
        planes = [
            a.reshape(rows, LANES)
            for a in (
                state[0:6] + keyed[0:3] + state[6:17]
            )
        ]
        outs = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[ray_spec] * 20 + [smem] * 5 + [full] * 2,
            out_specs=[ray_spec] * 17,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                pltpu.SMEM((LEAF_STACK_DEPTH,), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(rows) * LANES * 40_000,
                bytes_accessed=int(rows) * LANES * 40 * 4
                + int(grid) * (tri_pack.size + bvh_box.size) * 4,
                transcendentals=int(rows) * LANES * 12,
            ),
            interpret=interpret,
        )(
            *planes, bvh_meta, mat_tab, light_tab, env_color, em_tab,
            tri_pack, bvh_box,
        )
        state = tuple(p.reshape(-1) for p in outs)

    # radiance back to original ray order: one co-sort by slot id
    _, r0, r1, r2 = lax.sort(
        (keyed[3],) + tuple(state[9:12]), num_keys=1
    )
    return jnp.stack([r0[:n], r1[:n], r2[:n]], axis=-1)
