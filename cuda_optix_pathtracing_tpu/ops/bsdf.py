"""BSDF library: Lambert, Oren-Nayar (energy-compensated), GGX dielectric,
GGX conductor — vectorized over rays, differentiable w.r.t. material params.

Capability parity with the reference's 32-byte tagged-union BSDF and its
dispatchers (cuda-core/bsdf.cuh:11-138, bsdf.cu:243-1011), re-designed for
TPU: materials live in an SoA table; per-hit parameters are gathered; all
four models are evaluated as masked dense vector code and combined with
``jnp.where`` (no divergent dispatch).

Convention (differs deliberately from the reference, see notes):
- ``sample``/``eval`` return **f·cosθᵢ** (cosine-inclusive BSDF value,
  Cycles-style, as the reference's ``orenNayar_intensity`` already does)
  *including* albedo/Fresnel exactly once. The integrator applies
  ``beta *= f/pdf`` with **no** extra cosine.
  The reference multiplies an extra ``|dot(wi,n)|`` in the bounce and drops
  the albedo weight there (megakernel.cu:279), and multiplies Fresnel twice
  in NEE (evalGGX × bsdf.weight(), megakernel.cu:224-227) — those are
  energy-handling bugs we do not reproduce, since the quality gate is RMSE
  against Cycles, not against the reference's output.
- GGX multiple-scattering compensation follows Kulla–Conty/Turquin with
  E/Eavg tables *computed at import time* by numerical integration (the
  reference hard-codes equivalent tables, bsdf.cu:13-241).

Type codes match the reference enum (bsdf.cuh:11-16).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from .vecmath import (
    INV_PI,
    PI,
    average3,
    dot,
    face_forward,
    gram_schmidt,
    lerp,
    normalize,
    orthonormal_tangent,
    refract_angle,
    safe_acos,
    safe_sqrt,
    sin_from_cos,
    sqr,
)
from .sampling import sample_cos_hemisphere, sample_uniform_disk

OREN_NAYAR = 0
GGX_DIELECTRIC = 1
GGX_CONDUCTOR = 2
LAMBERT = 3


@dataclass(frozen=True)
class MatFeatures:
    """Static (compile-time) description of which material lobes a scene
    uses. The dispatchers drop the code for absent lobes entirely — the
    TPU-idiomatic equivalent of the reference's per-thread tagged-union
    dispatch (bsdf.cuh:108-112), where absent types simply never execute.
    """

    oren_nayar: bool = True
    lambert: bool = True
    ggx: bool = True
    conductor: bool = True
    transmission: bool = True
    aniso: bool = True

    @property
    def diffuse(self) -> bool:
        return self.oren_nayar or self.lambert


ALL_FEATURES = MatFeatures()


def mat_features_from_table(t: "MaterialTable") -> MatFeatures:
    """Derive the static feature set from a concrete (non-traced) device
    table — call OUTSIDE jit, e.g. when building the render config."""
    mtype = np.asarray(t.mtype)
    types = set(mtype.tolist())
    ggx_rows = np.isin(mtype, (GGX_DIELECTRIC, GGX_CONDUCTOR))
    ax = np.asarray(t.alphax)[ggx_rows]
    ay = np.asarray(t.alphay)[ggx_rows]
    diel_rows = mtype == GGX_DIELECTRIC
    has_trans = bool(
        np.any(np.max(np.asarray(t.trans_tint)[diel_rows], axis=-1, initial=0.0) > THROUGHPUT_EPS)
    )
    return MatFeatures(
        oren_nayar=OREN_NAYAR in types,
        lambert=LAMBERT in types,
        ggx=bool(ggx_rows.any()),
        conductor=GGX_CONDUCTOR in types,
        transmission=has_trans,
        aniso=bool(np.any(np.abs(ax - ay) > 1e-6)),
    )


def mat_features(materials: Sequence[dict]) -> MatFeatures:
    """Derive the static feature set from host-side material dicts."""
    types = {m.get("mtype", LAMBERT) for m in materials}
    ggx_mats = [
        m for m in materials if m.get("mtype") in (GGX_DIELECTRIC, GGX_CONDUCTOR)
    ]
    has_trans = any(
        m.get("mtype") == GGX_DIELECTRIC
        and float(np.max(np.asarray(m.get("trans_tint", (0.0,) * 3)))) > THROUGHPUT_EPS
        for m in materials
    )
    has_aniso = any(
        abs(float(m.get("alphax", 0.5)) - float(m.get("alphay", 0.5))) > 1e-6
        for m in ggx_mats
    )
    return MatFeatures(
        oren_nayar=OREN_NAYAR in types,
        lambert=LAMBERT in types,
        ggx=bool(ggx_mats),
        conductor=GGX_CONDUCTOR in types,
        transmission=has_trans,
        aniso=has_aniso,
    )

DELTA_ALPHA = 1e-3  # below this roughness GGX is treated as specular
THROUGHPUT_EPS = 1e-6


class MaterialTable(NamedTuple):
    """SoA material parameters; rows indexed by material id."""

    mtype: jnp.ndarray  # (M,) i32
    albedo: jnp.ndarray  # (M,3) ON/Lambert albedo
    on_sigma: jnp.ndarray  # (M,)
    alphax: jnp.ndarray  # (M,)
    alphay: jnp.ndarray  # (M,)
    phi0: jnp.ndarray  # (M,) anisotropy azimuth
    eta: jnp.ndarray  # (M,) dielectric IOR
    refl_tint: jnp.ndarray  # (M,3)
    trans_tint: jnp.ndarray  # (M,3)
    cond_eta: jnp.ndarray  # (M,3)
    cond_k: jnp.ndarray  # (M,3)
    emission: jnp.ndarray  # (M,3) emitted radiance (area lights)
    albedo_tex: jnp.ndarray  # (M,) i32 texture id into Scene.textures, -1 none
    rough_tex: jnp.ndarray  # (M,) i32 roughness texture id, -1 none
    normal_tex: jnp.ndarray  # (M,) i32 normal-map texture id, -1 none

    def gather(self, idx):
        from .gather import onehot_gather_pytree

        return onehot_gather_pytree(self, idx)


def oren_nayar(color, roughness: float) -> dict:
    """Reference makeOrenNayar (bsdf.cu:817-844): sigma in radians [0, π/2]."""
    return dict(
        mtype=OREN_NAYAR,
        albedo=np.clip(np.asarray(color, np.float32), 0.0, 1.0),
        on_sigma=float(np.clip(roughness, 0.0, np.pi / 2)),
    )


def lambert(color=(1.0, 1.0, 1.0)) -> dict:
    return dict(mtype=LAMBERT, albedo=np.asarray(color, np.float32))


def diffuse_light(radiance, color=(0.0, 0.0, 0.0)) -> dict:
    """Emissive (area-light) material: one-sided Le = ``radiance`` from
    the geometric front face (PBRT AreaLightSource "diffuse" semantics,
    scenes/cornell-box.pbrt:37-43); ``color`` is the surface albedo."""
    return dict(
        mtype=LAMBERT,
        albedo=np.asarray(color, np.float32),
        emission=np.asarray(radiance, np.float32),
    )


def ggx_dielectric(refl_tint, trans_tint, phi0, eta, alphax, alphay) -> dict:
    """Reference makeGGXDielectric (bsdf.cu:669-688)."""
    return dict(
        mtype=GGX_DIELECTRIC,
        refl_tint=np.asarray(refl_tint, np.float32),
        trans_tint=np.asarray(trans_tint, np.float32),
        phi0=float(phi0),
        eta=float(eta),
        alphax=float(alphax),
        alphay=float(alphay),
    )


def ggx_conductor(eta, k, phi0, alphax, alphay) -> dict:
    """Reference makeGGXConductor (bsdf.cu:690-706)."""
    return dict(
        mtype=GGX_CONDUCTOR,
        cond_eta=np.asarray(eta, np.float32),
        cond_k=np.asarray(k, np.float32),
        phi0=float(phi0),
        alphax=float(alphax),
        alphay=float(alphay),
    )


_DEFAULTS = dict(
    mtype=LAMBERT,
    albedo=(1.0, 1.0, 1.0),
    on_sigma=0.0,
    alphax=0.5,
    alphay=0.5,
    phi0=0.0,
    eta=1.5,
    refl_tint=(1.0, 1.0, 1.0),
    trans_tint=(0.0, 0.0, 0.0),
    cond_eta=(0.2, 0.4, 1.3),
    cond_k=(3.4, 2.3, 1.7),
    emission=(0.0, 0.0, 0.0),
    albedo_tex=-1,
    rough_tex=-1,
    normal_tex=-1,
)


def make_material_table(materials: Sequence[dict]) -> MaterialTable:
    """Build the SoA table from factory dicts."""
    rows = []
    for m in materials:
        d = dict(_DEFAULTS)
        d.update(m)
        rows.append(d)

    def col(name, width):
        if width == 1:
            return jnp.asarray([r[name] for r in rows], jnp.float32)
        return jnp.asarray([np.broadcast_to(r[name], (3,)) for r in rows], jnp.float32)

    return MaterialTable(
        mtype=jnp.asarray([r["mtype"] for r in rows], jnp.int32),
        albedo=col("albedo", 3),
        on_sigma=col("on_sigma", 1),
        alphax=col("alphax", 1),
        alphay=col("alphay", 1),
        phi0=col("phi0", 1),
        eta=col("eta", 1),
        refl_tint=col("refl_tint", 3),
        trans_tint=col("trans_tint", 3),
        cond_eta=col("cond_eta", 3),
        cond_k=col("cond_k", 3),
        emission=col("emission", 3),
        albedo_tex=jnp.asarray([r["albedo_tex"] for r in rows], jnp.int32),
        rough_tex=jnp.asarray([r["rough_tex"] for r in rows], jnp.int32),
        normal_tex=jnp.asarray([r["normal_tex"] for r in rows], jnp.int32),
    )


# ---------------------------------------------------------------------------
# GGX microfacet pieces (jcgt.org/published/0003/02/03, VNDF 0007/04/01)
# ---------------------------------------------------------------------------


def ggx_lambda_from_sqr_alpha_tan(sqr_alpha_tan):
    return 0.5 * (jnp.sqrt(1.0 + sqr_alpha_tan) - 1.0)


def ggx_d(alpha2, cos_nh):
    cos2 = jnp.minimum(sqr(cos_nh), 1.0)
    return alpha2 / (PI * sqr((1.0 - cos2) + alpha2 * cos2))


def ggx_lambda(alpha2, cos_n):
    s = alpha2 * jnp.maximum(0.0, 1.0 / jnp.maximum(sqr(cos_n), 1e-12) - 1.0)
    return ggx_lambda_from_sqr_alpha_tan(s)


def ggx_aniso_d(alphax, alphay, local_h):
    hx = local_h[..., 0] / alphax
    hy = local_h[..., 1] / alphay
    hz = local_h[..., 2]
    alpha2 = alphax * alphay
    len2 = hx * hx + hy * hy + hz * hz
    return INV_PI / jnp.maximum(alpha2 * sqr(len2), 1e-20)


def ggx_aniso_lambda(alphax, alphay, v):
    s = (sqr(alphax * v[..., 0]) + sqr(alphay * v[..., 1])) / jnp.maximum(
        sqr(v[..., 2]), 1e-12
    )
    return ggx_lambda_from_sqr_alpha_tan(s)


def sample_ggx_vndf(local_o, u1, u2, ax, ay):
    """Heitz 2018 VNDF sampling in tangent space (reference bsdf.cu:303-330)."""
    v = normalize(
        jnp.stack(
            [ax * local_o[..., 0], ay * local_o[..., 1], local_o[..., 2]], axis=-1
        )
    )
    lensq = sqr(v[..., 0]) + sqr(v[..., 1])
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-14))
    use_frame = lensq > 1e-7
    t1 = jnp.where(
        use_frame[..., None],
        jnp.stack(
            [-v[..., 1] * inv_len, v[..., 0] * inv_len, jnp.zeros_like(inv_len)],
            axis=-1,
        ),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v.shape),
    )
    t2 = jnp.where(
        use_frame[..., None],
        jnp.cross(v, t1),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), v.shape),
    )
    dx, dy = sample_uniform_disk(u1, u2)
    dy = lerp(safe_sqrt(1.0 - sqr(dx)), dy, 0.5 * (1.0 + v[..., 2]))
    nh = (
        dx[..., None] * t1
        + dy[..., None] * t2
        + safe_sqrt(1.0 - sqr(dx) - sqr(dy))[..., None] * v
    )
    nh = normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)], axis=-1
        )
    )
    return nh


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance + transmitted cosine.

    ``eta`` is outside/inside for the current traversal direction (caller
    flips when inside). Returns (F, cos_theta_t).
    Reference: bsdf.cuh:175-203.
    """
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_i = safe_sqrt(1.0 - sqr(cos_i))
    sin_t = sin_i / eta
    tir = sin_t >= 1.0
    cos_t = safe_sqrt(1.0 - sqr(sin_t))
    r_parl = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    f = 0.5 * (sqr(r_parl) + sqr(r_perp))
    return jnp.where(tir, 1.0, f), cos_t


def fresnel_conductor(cos_i, eta, k):
    """RGB conductor Fresnel (reference bsdf.cuh:205-224); eta,k are (...,3)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)[..., None]
    cos2 = sqr(cos_i)
    sin2 = 1.0 - cos2
    eta2, k2 = sqr(eta), sqr(k)
    t0 = eta2 - k2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(sqr(t0) + 4.0 * eta2 * k2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * cos_i * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = cos2 * a2b2 + sqr(sin2)
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


# ---------------------------------------------------------------------------
# GGX energy-preservation tables (computed, not copied)
# ---------------------------------------------------------------------------

E_TABLE_RES = 32


@functools.lru_cache(maxsize=1)
def ggx_energy_tables():
    """Directional albedo E(cosθo, α²) of single-scatter GGX (Fresnel = 1)
    and its cosine-weighted average Eavg(α²).

    Monte-Carlo with the VNDF estimator: for VNDF-sampled reflection the
    estimator of E collapses to (1+λo)/(1+λo+λi) (Heitz 2018 eq. 19 with
    f·cos/pdf). Stratified 64×64 samples per cell.
    """
    res = E_TABLE_RES
    ns = 64
    u1, u2 = np.meshgrid(
        (np.arange(ns) + 0.5) / ns, (np.arange(ns) + 0.5) / ns, indexing="ij"
    )
    u1 = u1.reshape(1, -1)
    u2 = u2.reshape(1, -1)

    cos_o = np.linspace(0.0, 1.0, res).reshape(-1, 1)
    cos_o = np.clip(cos_o, 1e-3, 1.0)
    sin_o = np.sqrt(1.0 - cos_o**2)

    e_rows = []
    alpha2_grid = np.clip(np.linspace(0.0, 1.0, res), 1e-6, 1.0)
    for alpha2 in alpha2_grid:
        alpha = np.sqrt(alpha2)
        # local_o in tangent space: (sin_o, 0, cos_o)
        vx = alpha * sin_o
        vz = cos_o
        norm = np.sqrt(vx**2 + vz**2)
        vx, vz = vx / norm, vz / norm  # stretched view
        # sample VNDF: frame T1=(-0,?,0)… simplified 2D-in-plane construction
        lensq = vx**2
        t1 = np.stack(np.broadcast_arrays(-np.zeros_like(vx), np.ones_like(vx), np.zeros_like(vx)), -1)
        # v = (vx, 0, vz); t1 = (0,1,0); t2 = v × t1 = (-vz, 0, vx)
        dx_ = 2.0 * u1 - 1.0
        # concentric disk
        dx, dy = _np_concentric_disk(u1, u2)
        dy = (1.0 - 0.5 * (1.0 + vz)) * np.sqrt(np.maximum(1.0 - dx**2, 0.0)) + 0.5 * (
            1.0 + vz
        ) * dy
        dz = np.sqrt(np.maximum(1.0 - dx**2 - dy**2, 0.0))
        # nh = dx*t2 + dy*t1 + dz*v  (t2 = (-vz, 0, vx))
        nhx = dx * (-vz) + dz * vx
        nhy = dy
        nhz = dx * vx + dz * vz
        # unstretch
        nhx *= alpha
        nhy *= alpha
        nhz = np.maximum(nhz, 0.0)
        nlen = np.sqrt(nhx**2 + nhy**2 + nhz**2) + 1e-20
        nhx, nhy, nhz = nhx / nlen, nhy / nlen, nhz / nlen
        # reflect wo=(sin_o,0,cos_o) about h
        won = sin_o * nhx + cos_o * nhz
        wix = 2.0 * won * nhx - sin_o
        wiy = 2.0 * won * nhy
        wiz = 2.0 * won * nhz - cos_o
        lam_o = _np_ggx_lambda(alpha2, cos_o)
        lam_i = _np_ggx_lambda(alpha2, np.maximum(wiz, 1e-6))
        contrib = np.where(wiz > 0.0, (1.0 + lam_o) / (1.0 + lam_o + lam_i), 0.0)
        e_rows.append(contrib.mean(axis=1))
    e = np.stack(e_rows, axis=1)  # (cos_idx, alpha_idx)
    e = np.clip(e, 1e-3, 1.0)
    # Eavg = 2 ∫ E(c) c dc  (trapezoid over the cos grid)
    cgrid = np.linspace(0.0, 1.0, res)
    eavg = 2.0 * np.trapezoid(e * cgrid[:, None], cgrid, axis=0)
    eavg = np.clip(eavg, 1e-3, 1.0)
    # cache *numpy* arrays — caching jnp arrays here would leak tracers when
    # the first call happens inside a jit trace
    return e.astype(np.float32), eavg.astype(np.float32)


def _np_concentric_disk(u1, u2):
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    a_dom = np.abs(a) > np.abs(b)
    rho = np.where(a_dom, a, b)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(a_dom, b / a, a / b)
    ratio = np.nan_to_num(ratio)
    # Shirley–Chiu second branch: π/2 − (π/4)·ratio (keep in sync with
    # ops/sampling.py sample_uniform_disk)
    phi = np.where(a_dom, (np.pi / 4) * ratio, np.pi / 2 - (np.pi / 4) * ratio)
    zero = (a == 0) & (b == 0)
    return np.where(zero, 0.0, rho * np.cos(phi)), np.where(zero, 0.0, rho * np.sin(phi))


def _np_ggx_lambda(alpha2, cos_n):
    s = alpha2 * np.maximum(0.0, 1.0 / np.maximum(cos_n**2, 1e-12) - 1.0)
    return 0.5 * (np.sqrt(1.0 + s) - 1.0)


@functools.lru_cache(maxsize=1)
def _e_poly_coeffs(deg: int = 6):
    """Least-squares 2D polynomial fit of E(cosθo, α²) and 1D fit of Eavg.

    Table lookups are gathers — slow on TPU — so the energy tables are
    compressed into tensor-product polynomials evaluated on the VPU
    (pure FMA chains). Max fit error on the 32×32 grid ≈ 1e-2, well inside
    the tolerance of a multiple-scattering compensation term.
    """
    e, eavg = ggx_energy_tables()
    res = E_TABLE_RES
    c = np.linspace(0.0, 1.0, res)
    a = np.linspace(0.0, 1.0, res)
    cc, aa = np.meshgrid(c, a, indexing="ij")  # e is (cos_idx, alpha_idx)
    basis = np.stack(
        [cc.ravel() ** i * aa.ravel() ** j for i in range(deg + 1) for j in range(deg + 1)],
        axis=1,
    )
    coef2d, *_ = np.linalg.lstsq(basis, e.ravel(), rcond=None)
    basis1 = np.stack([a**i for i in range(deg + 1)], axis=1)
    coef1d, *_ = np.linalg.lstsq(basis1, eavg, rcond=None)
    return (
        coef2d.reshape(deg + 1, deg + 1).astype(np.float32),
        coef1d.astype(np.float32),
        deg,
    )


def lookup_e(alpha2, cos_no):
    """E(cosθo, α²) via the polynomial fit (no gathers)."""
    coef2d, _, deg = _e_poly_coeffs()
    x = jnp.clip(cos_no, 0.0, 1.0)
    y = jnp.clip(alpha2, 0.0, 1.0)
    # Horner in y inside Horner in x
    acc = jnp.zeros_like(x)
    for i in range(deg, -1, -1):
        row = jnp.zeros_like(x)
        for j in range(deg, -1, -1):
            row = row * y + coef2d[i, j]
        acc = acc * x + row
    return jnp.clip(acc, 1e-3, 1.0)


def lookup_eavg(alpha2):
    _, coef1d, deg = _e_poly_coeffs()
    y = jnp.clip(alpha2, 0.0, 1.0)
    acc = jnp.zeros_like(y)
    for i in range(deg, -1, -1):
        acc = acc * y + coef1d[i]
    return jnp.clip(acc, 1e-3, 1.0)


def ggx_multiscatter_factor(mat: MaterialTable, cos_no, ft: MatFeatures = ALL_FEATURES):
    """(N,3) multiple-scattering multiplier 1 + Fms·(1-E)/E (Kulla–Conty).

    Fss estimate per reference prepareBSDF (bsdf.cu:955-990): dielectric
    uses the transmittance tint; conductor uses the F82-tint fit.
    """
    alpha2 = mat.alphax * mat.alphay
    e = lookup_e(alpha2, cos_no)
    eavg = lookup_eavg(alpha2)
    if ft.conductor:
        f0 = fresnel_conductor(jnp.ones_like(cos_no), mat.cond_eta, mat.cond_k)
        f82 = fresnel_conductor(
            jnp.full_like(cos_no, 1.0 / 7.0), mat.cond_eta, mat.cond_k
        )
        b = (lerp(f0, jnp.ones_like(f0), 0.46266436) - f82) * 17.651384
        fss_cond = lerp(f0, jnp.ones_like(f0), 1.0 / 21.0) - b * (1.0 / 126.0)
        fss = jnp.where(
            (mat.mtype == GGX_CONDUCTOR)[..., None], fss_cond, mat.trans_tint
        )
    else:
        fss = mat.trans_tint
    missing = (1.0 - e) / e
    fms = fss * eavg[..., None] / jnp.maximum(1.0 - fss * (1.0 - eavg[..., None]), 1e-4)
    return 1.0 + fms * missing[..., None]


# ---------------------------------------------------------------------------
# Oren-Nayar (Fujii improved model + OpenPBR-style multiscatter)
# reference: bsdf.cu:744-810
# ---------------------------------------------------------------------------


def oren_nayar_ab(sigma):
    a = 1.0 / (PI + (PI / 2.0 - 2.0 / 3.0) * sigma)
    return a, a * sigma


def oren_nayar_g(cos_theta):
    pm = PI / 2.0 - 2.0 / 3.0
    small = cos_theta < 1e-6
    c = jnp.where(small, 0.5, cos_theta)  # avoid 0-div in the main branch
    sin_t = sin_from_cos(c)
    theta = safe_acos(c)
    main = sin_t * (theta - 2.0 / 3.0 - sin_t * c) + (2.0 / 3.0) * (sin_t / c) * (
        1.0 - sqr(sin_t) * sin_t
    )
    return jnp.where(small, pm - cos_theta, main)


def _oren_nayar_fcos(mat: MaterialTable, n, wo, wi):
    """f·cosθᵢ for Oren-Nayar including albedo (N,3)."""
    a, b = oren_nayar_ab(mat.on_sigma)
    nl = jnp.maximum(dot(n, wi), 0.0)
    nv = jnp.maximum(dot(n, wo), 0.0)
    t = dot(wi, wo) - nl * nv
    t = jnp.where(t > 0.0, t / (jnp.maximum(nl, nv) + 1e-38), t)
    single = a + b * t
    e_l = a * PI + b * oren_nayar_g(nl)
    e_v = a * PI + b * oren_nayar_g(nv)
    ms = jnp.maximum(mat.albedo * (1.0 - e_v)[..., None], 0.0) * (1.0 - e_l)[..., None]
    return mat.albedo * nl[..., None] * (single[..., None] + ms)


# ---------------------------------------------------------------------------
# Dispatchers
# ---------------------------------------------------------------------------


class BsdfSample(NamedTuple):
    wi: jnp.ndarray  # (N,3)
    f_cos: jnp.ndarray  # (N,3) f·|cosθi| (0 where invalid)
    pdf: jnp.ndarray  # (N,) solid-angle pdf (0 where invalid)
    eta: jnp.ndarray  # (N,) relative IOR crossed (1 for reflection)
    delta: jnp.ndarray  # (N,) bool
    refract: jnp.ndarray  # (N,) bool


def _ggx_frame(ns, phi0):
    """Tangent frame rotated by phi0 around ns (reference tangentFromPhi)."""
    t, b = gram_schmidt(ns)
    c = jnp.cos(phi0)[..., None]
    s = jnp.sin(phi0)[..., None]
    x = c * t + s * b
    y = jnp.cross(ns, x)
    return x, y


def _eta_for_side(mat_eta, inside):
    """Relative IOR outside/inside for the current medium side."""
    return jnp.where(inside, 1.0 / mat_eta, mat_eta)


def sample_bsdf(
    mat: MaterialTable, wo, ns, ng, u1, u2, uc, inside=None,
    ft: MatFeatures = ALL_FEATURES,
) -> BsdfSample:
    """Sample all-material SoA batch. ``inside`` masks rays currently inside
    a dielectric (odd transmission count) — flips eta. ``ft`` statically
    drops lobes the scene does not use.
    """
    n = wo.shape[0]
    if inside is None:
        inside = jnp.zeros((n,), bool)

    valid_side = dot(wo, ng) > 0.0
    ns = face_forward(ns, ng)
    cos_no = dot(ns, wo)

    # ---------------- diffuse lobes (Lambert / Oren-Nayar) ----------------
    if ft.diffuse:
        wi_d, pdf_d = sample_cos_hemisphere(ns, u1, u2)
        above = dot(ng, wi_d) > 0.0
        if ft.oren_nayar and ft.lambert:
            f_on = _oren_nayar_fcos(mat, ns, wo, wi_d)
            f_lam = mat.albedo * pdf_d[..., None]  # albedo·cos/π
            f_diff = jnp.where((mat.mtype == OREN_NAYAR)[..., None], f_on, f_lam)
        elif ft.oren_nayar:
            f_diff = _oren_nayar_fcos(mat, ns, wo, wi_d)
        else:
            f_diff = mat.albedo * pdf_d[..., None]
        f_diff = jnp.where(above[..., None], f_diff, 0.0)
        pdf_diff = jnp.where(above, pdf_d, 0.0)
    else:
        wi_d = wo
        f_diff = jnp.zeros((n, 3), jnp.float32)
        pdf_diff = jnp.zeros((n,), jnp.float32)

    # ---------------- GGX lobe ----------------
    if ft.ggx:
        ax, ay = mat.alphax, mat.alphay
        is_delta = jnp.maximum(ax, ay) < DELTA_ALPHA
        x_axis, y_axis = _ggx_frame(ns, mat.phi0)
        local_o = jnp.stack([dot(x_axis, wo), dot(y_axis, wo), cos_no], axis=-1)
        local_h = sample_ggx_vndf(local_o, u1, u2, ax, ay)
        h_rough = (
            local_h[..., 0:1] * x_axis
            + local_h[..., 1:2] * y_axis
            + local_h[..., 2:3] * ns
        )
        h = jnp.where(is_delta[..., None], ns, h_rough)
        local_h = jnp.where(
            is_delta[..., None],
            jnp.concatenate([jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=-1),
            local_h,
        )
        cos_ho = dot(h, wo)

        eta_eff = _eta_for_side(mat.eta, inside)
        f_diel, cos_hi = fresnel_dielectric(cos_ho, eta_eff)
        refl_diel = f_diel[..., None] * mat.refl_tint
        trans_diel = (1.0 - f_diel)[..., None] * mat.trans_tint
        if ft.conductor:
            refl_cond = fresnel_conductor(cos_ho, mat.cond_eta, mat.cond_k)
            conductor = mat.mtype == GGX_CONDUCTOR
            reflectance = jnp.where(conductor[..., None], refl_cond, refl_diel)
            transmittance = jnp.where(conductor[..., None], 0.0, trans_diel)
        else:
            reflectance = refl_diel
            transmittance = trans_diel

        inv_eta = 1.0 / eta_eff
        wi_refl = 2.0 * cos_ho[..., None] * h - wo
        if ft.transmission:
            denom = jnp.maximum(average3(reflectance + transmittance), 1e-12)
            pdf_reflect = jnp.clip(average3(reflectance) / denom, 0.0, 1.0)
            do_refract = uc > pdf_reflect
            wi_refr = refract_angle(wo, h, cos_hi, inv_eta[..., None])
            wi_g = jnp.where(do_refract[..., None], wi_refr, wi_refl)
        else:
            pdf_reflect = jnp.ones((n,), jnp.float32)
            do_refract = jnp.zeros((n,), bool)
            wi_g = wi_refl

        bad_hemi = (dot(ng, wi_g) <= 0.0) & ~do_refract
        lobe_pdf = jnp.where(do_refract, 1.0 - pdf_reflect, pdf_reflect)
        f_g = jnp.where(do_refract[..., None], transmittance, reflectance)

        # microfacet terms (non-delta)
        alpha2 = ax * ay
        cos_ni = dot(ns, wi_g)
        d_iso = ggx_d(alpha2, local_h[..., 2])
        lam_i_iso = ggx_lambda(alpha2, cos_ni)
        lam_o_iso = ggx_lambda(alpha2, cos_no)
        if ft.aniso:
            iso = ax == ay
            use_iso = iso | do_refract
            local_i = 2.0 * cos_ho[..., None] * local_h - local_o
            d_aniso = ggx_aniso_d(ax, ay, local_h)
            lam_i_a = ggx_aniso_lambda(ax, ay, local_i)
            lam_o_a = ggx_aniso_lambda(ax, ay, local_o)
            d_val = jnp.where(use_iso, d_iso, d_aniso)
            lam_i = jnp.where(use_iso, lam_i_iso, lam_i_a)
            lam_o = jnp.where(use_iso, lam_o_iso, lam_o_a)
        else:
            d_val, lam_i, lam_o = d_iso, lam_i_iso, lam_o_iso

        common = (
            d_val
            / jnp.maximum(cos_no, 1e-6)
            * (
                jnp.where(
                    do_refract,
                    jnp.abs(cos_ho * cos_hi)
                    / jnp.maximum(sqr(cos_hi + cos_ho * inv_eta), 1e-8),
                    0.25,
                )
                if ft.transmission
                else 0.25
            )
        )
        pdf_rough = lobe_pdf * common / (1.0 + lam_o)
        f_rough = f_g * (common / (1.0 + lam_o + lam_i))[..., None]
        # multiple-scattering energy compensation on the reflection lobe
        ms = ggx_multiscatter_factor(mat, cos_no, ft)
        f_rough = jnp.where(do_refract[..., None], f_rough, f_rough * ms)

        # delta lobe: f/pdf must equal Fresnel-weighted tint; encode with pdf=1
        pdf_ggx = jnp.where(is_delta, lobe_pdf, pdf_rough)
        f_ggx = jnp.where(is_delta[..., None], f_g * lobe_pdf[..., None], f_rough)

        zero_fres = (average3(reflectance) < THROUGHPUT_EPS) & (
            average3(transmittance) < THROUGHPUT_EPS
        )
        ggx_invalid = bad_hemi | zero_fres
        pdf_ggx = jnp.where(ggx_invalid, 0.0, pdf_ggx)
        f_ggx = jnp.where(ggx_invalid[..., None], 0.0, f_ggx)

        # ---------------- combine by type ----------------
        if ft.diffuse:
            is_ggx = (mat.mtype == GGX_DIELECTRIC) | (mat.mtype == GGX_CONDUCTOR)
            wi = jnp.where(is_ggx[..., None], wi_g, wi_d)
            f_cos = jnp.where(is_ggx[..., None], f_ggx, f_diff)
            pdf = jnp.where(is_ggx, pdf_ggx, pdf_diff)
        else:
            is_ggx = jnp.ones((n,), bool)
            wi, f_cos, pdf = wi_g, f_ggx, pdf_ggx
        refract = is_ggx & do_refract & ~ggx_invalid
        eta_out = jnp.where(refract, eta_eff, 1.0)
        delta = is_ggx & is_delta
    else:
        wi, f_cos, pdf = wi_d, f_diff, pdf_diff
        refract = jnp.zeros((n,), bool)
        eta_out = jnp.ones((n,), jnp.float32)
        delta = jnp.zeros((n,), bool)

    pdf = jnp.where(valid_side, pdf, 0.0)
    f_cos = jnp.where(valid_side[..., None], f_cos, 0.0)
    return BsdfSample(wi, f_cos, pdf, eta_out, delta, refract)


def eval_bsdf(mat: MaterialTable, wo, wi, ns, ng, inside=None,
              ft: MatFeatures = ALL_FEATURES):
    """Evaluate f·cosθᵢ and pdf for given directions (used by NEE/MIS).

    Returns (f_cos (N,3), pdf (N,)). Delta lobes evaluate to zero.
    ``ft`` statically drops lobes the scene does not use.
    """
    n = wo.shape[0]
    if inside is None:
        inside = jnp.zeros((n,), bool)
    valid_side = dot(wo, ng) > 0.0
    ns = face_forward(ns, ng)
    cos_no = dot(ns, wo)
    cos_ni = dot(ns, wi)
    cos_ngi = dot(ng, wi)

    # diffuse
    if ft.diffuse:
        if ft.oren_nayar and ft.lambert:
            f_on = _oren_nayar_fcos(mat, ns, wo, wi)
            f_lam = mat.albedo * jnp.maximum(cos_ni, 0.0)[..., None] * INV_PI
            f_diff = jnp.where((mat.mtype == OREN_NAYAR)[..., None], f_on, f_lam)
        elif ft.oren_nayar:
            f_diff = _oren_nayar_fcos(mat, ns, wo, wi)
        else:
            f_diff = mat.albedo * jnp.maximum(cos_ni, 0.0)[..., None] * INV_PI
        pdf_diff = jnp.maximum(cos_ni, 0.0) * INV_PI
        diff_ok = cos_ni > 0.0
        f_diff = jnp.where(diff_ok[..., None], f_diff, 0.0)
        pdf_diff = jnp.where(diff_ok, pdf_diff, 0.0)
    else:
        f_diff = jnp.zeros((n, 3), jnp.float32)
        pdf_diff = jnp.zeros((n,), jnp.float32)

    if not ft.ggx:
        pdf = jnp.where(valid_side, pdf_diff, 0.0)
        f = jnp.where(valid_side[..., None], f_diff, 0.0)
        return f, pdf

    # ggx (reference evalGGX, bsdf.cu:571-667)
    ax, ay = mat.alphax, mat.alphay
    alpha2 = ax * ay
    is_delta = jnp.maximum(ax, ay) < DELTA_ALPHA
    conductor = mat.mtype == GGX_CONDUCTOR
    is_trans = (cos_ni < 0.0) if ft.transmission else jnp.zeros((n,), bool)
    eta_eff = _eta_for_side(mat.eta, inside)
    if ft.transmission:
        ior = jnp.where(is_trans, eta_eff, 1.0)
        h_raw = ior[..., None] * wi + wo
    else:
        ior = jnp.ones((n,), jnp.float32)
        h_raw = wi + wo
    inv_len_h = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(h_raw * h_raw, axis=-1)), 1e-12)
    h = h_raw * inv_len_h[..., None]
    h = face_forward(h, ns)
    cos_ho = dot(h, wo)
    f_diel, _ = fresnel_dielectric(cos_ho, eta_eff)
    if ft.conductor:
        refl = jnp.where(
            conductor[..., None],
            fresnel_conductor(cos_ho, mat.cond_eta, mat.cond_k),
            f_diel[..., None] * mat.refl_tint,
        )
        trans = jnp.where(
            conductor[..., None], 0.0, (1.0 - f_diel)[..., None] * mat.trans_tint
        )
    else:
        refl = f_diel[..., None] * mat.refl_tint
        trans = (1.0 - f_diel)[..., None] * mat.trans_tint

    cos_nh = dot(ns, h)
    d_iso = ggx_d(alpha2, cos_nh)
    lam_i_iso = ggx_lambda(alpha2, jnp.abs(cos_ni))
    lam_o_iso = ggx_lambda(alpha2, cos_no)
    if ft.aniso:
        iso = ax == ay
        use_iso = iso | is_trans
        x_axis, y_axis = _ggx_frame(ns, mat.phi0)
        local_h = jnp.stack([dot(x_axis, h), dot(y_axis, h), cos_nh], axis=-1)
        local_o = jnp.stack([dot(x_axis, wo), dot(y_axis, wo), cos_no], axis=-1)
        local_i = jnp.stack([dot(x_axis, wi), dot(y_axis, wi), cos_ni], axis=-1)
        d_a = ggx_aniso_d(ax, ay, local_h)
        lam_i_a = ggx_aniso_lambda(ax, ay, local_i)
        lam_o_a = ggx_aniso_lambda(ax, ay, local_o)
        d_val = jnp.where(use_iso, d_iso, d_a)
        lam_i = jnp.where(use_iso, lam_i_iso, lam_i_a)
        lam_o = jnp.where(use_iso, lam_o_iso, lam_o_a)
    else:
        d_val, lam_i, lam_o = d_iso, lam_i_iso, lam_o_iso

    common = (
        d_val
        / jnp.maximum(cos_no, 1e-6)
        * (
            jnp.where(
                is_trans,
                sqr(ior * inv_len_h) * jnp.abs(cos_ho * dot(h, wi)),
                0.25,
            )
            if ft.transmission
            else 0.25
        )
    )
    if ft.transmission:
        denom = jnp.maximum(average3(refl + trans), 1e-12)
        pdf_reflect = jnp.clip(average3(refl) / denom, 0.0, 1.0)
        lobe_pdf = jnp.where(is_trans, 1.0 - pdf_reflect, pdf_reflect)
    else:
        lobe_pdf = jnp.ones((n,), jnp.float32)
    pdf_ggx = lobe_pdf * common / (1.0 + lam_o)
    ms = ggx_multiscatter_factor(mat, cos_no, ft)
    f_sel = jnp.where(is_trans[..., None], trans, refl * ms)
    f_ggx = f_sel * (common / (1.0 + lam_o + lam_i))[..., None]

    if ft.conductor:
        has_refl = jnp.where(conductor, True, average3(mat.refl_tint) > THROUGHPUT_EPS)
        has_trans = jnp.where(conductor, False, average3(mat.trans_tint) > THROUGHPUT_EPS)
    else:
        has_refl = average3(mat.refl_tint) > THROUGHPUT_EPS
        has_trans = average3(mat.trans_tint) > THROUGHPUT_EPS
    ggx_bad = (
        (cos_no <= 0.0)
        | ((cos_ngi < 0.0) != is_trans)
        | is_delta
        | (~has_refl & (cos_ngi > 0.0))
        | (~has_trans & (cos_ngi < 0.0))
    )
    pdf_ggx = jnp.where(ggx_bad, 0.0, pdf_ggx)
    f_ggx = jnp.where(ggx_bad[..., None], 0.0, f_ggx)

    if ft.diffuse:
        is_ggx = (mat.mtype == GGX_DIELECTRIC) | (mat.mtype == GGX_CONDUCTOR)
        f = jnp.where(is_ggx[..., None], f_ggx, f_diff)
        pdf = jnp.where(is_ggx, pdf_ggx, pdf_diff)
    else:
        f, pdf = f_ggx, pdf_ggx
    pdf = jnp.where(valid_side, pdf, 0.0)
    f = jnp.where(valid_side[..., None], f, 0.0)
    return f, pdf
