"""Texture stack: mip pools, trilinear filtering, ray-cone LOD, UV import.

Reference capability: ImageTexturev2 mip chains + trilinear/EWA filtering
(core-texture.h:188-330, core-texture.cu:563-731) and LOD from ray
differentials (core-render.cpp:183-269) — re-designed as a packed texel
pool + ray cones (ops/texture.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops.texture import (
    build_mip_chain,
    build_texture_pool,
    raycone_lod,
    sample_bilinear,
    sample_trilinear,
    uv_density,
)


def checker(n=8):
    img = np.indices((n, n)).sum(0) % 2
    return np.stack([img] * 3, -1).astype(np.float32)


def test_mip_chain_shapes_and_energy():
    chain = build_mip_chain(checker(8))
    assert [l.shape[:2] for l in chain] == [(8, 8), (4, 4), (2, 2), (1, 1)]
    # box filter preserves the mean exactly on POT sizes
    for l in chain:
        np.testing.assert_allclose(l.mean(), 0.5, atol=1e-6)


def test_mip_chain_odd_sizes():
    chain = build_mip_chain(np.ones((5, 3, 3), np.float32))
    assert chain[-1].shape[:2] == (1, 1)
    for l in chain:
        np.testing.assert_allclose(l, 1.0)


def test_bilinear_exact_at_texel_centers():
    pool = build_texture_pool([checker(8)])
    tid = jnp.zeros((3,), jnp.int32)
    uv = jnp.asarray([[0.5 / 8, 0.5 / 8], [1.5 / 8, 0.5 / 8], [7.5 / 8, 7.5 / 8]])
    c = sample_bilinear(pool, tid, uv, jnp.zeros((3,), jnp.int32))
    np.testing.assert_allclose(np.asarray(c[:, 0]), [0.0, 1.0, 0.0], atol=1e-6)


def test_bilinear_wraps():
    pool = build_texture_pool([checker(8)])
    tid = jnp.zeros((2,), jnp.int32)
    # uv and uv+1 must sample identically (repeat wrap)
    base = jnp.asarray([[0.23, 0.71]])
    c0 = sample_bilinear(pool, tid[:1], base, jnp.zeros((1,), jnp.int32))
    c1 = sample_bilinear(pool, tid[:1], base + 1.0, jnp.zeros((1,), jnp.int32))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)


def test_trilinear_blends_and_clamps():
    pool = build_texture_pool([checker(8)])
    tid = jnp.zeros((1,), jnp.int32)
    uv = jnp.asarray([[0.5 / 8, 0.5 / 8]])  # texel (0,0): 0 at level 0
    c_l0 = sample_trilinear(pool, tid, uv, jnp.asarray([0.0]))
    c_top = sample_trilinear(pool, tid, uv, jnp.asarray([99.0]))  # clamped
    c_mid = sample_trilinear(pool, tid, uv, jnp.asarray([0.5]))
    assert float(c_l0[0, 0]) == 0.0
    np.testing.assert_allclose(float(c_top[0, 0]), 0.5, atol=1e-6)
    l0, l1 = float(c_l0[0, 0]), float(
        sample_trilinear(pool, tid, uv, jnp.asarray([1.0]))[0, 0]
    )
    np.testing.assert_allclose(float(c_mid[0, 0]), 0.5 * (l0 + l1), atol=1e-6)


def test_pool_multiple_textures_isolated():
    pool = build_texture_pool([checker(8), np.full((4, 2, 3), 0.25, np.float32)])
    tid1 = jnp.ones((3,), jnp.int32)
    uv = jnp.asarray([[0.1, 0.1], [0.6, 0.4], [0.9, 0.9]])
    c = sample_trilinear(pool, tid1, uv, jnp.asarray([0.0, 1.0, 5.0]))
    np.testing.assert_allclose(np.asarray(c), 0.25, atol=1e-6)


def test_texels_are_differentiable():
    """Inverse rendering of texture texels: gradient is a scatter-add of
    the bilinear weights — nonzero exactly at the 4 fetched texels."""
    pool = build_texture_pool([checker(4)])

    def f(texels):
        p = pool._replace(texels=texels)
        c = sample_bilinear(
            p, jnp.zeros((1,), jnp.int32),
            jnp.asarray([[0.4, 0.4]]), jnp.zeros((1,), jnp.int32),
        )
        return jnp.sum(c)

    g = np.asarray(jax.grad(f)(pool.texels))
    touched = (np.abs(g).sum(-1) > 0).sum()
    assert touched == 4
    # bilinear weights sum to 1 per channel
    np.testing.assert_allclose(g.sum(axis=0), [1.0, 1.0, 1.0], atol=1e-5)


def test_uv_density_scale():
    # unit right triangle in world, UVs scaled 2×: density = 2
    tri_uv = jnp.asarray([[[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]]])
    e0 = jnp.asarray([[1.0, 0.0, 0.0]])
    e1 = jnp.asarray([[0.0, 1.0, 0.0]])
    d = uv_density(tri_uv, e0, e1)
    np.testing.assert_allclose(np.asarray(d), [2.0], rtol=1e-6)


def test_raycone_lod_doubles_per_octave():
    pool = build_texture_pool([checker(64)])
    tid = jnp.zeros((3,), jnp.int32)
    dens = jnp.ones((3,))
    w = jnp.asarray([1.0 / 64, 2.0 / 64, 4.0 / 64])
    lod = np.asarray(raycone_lod(pool, tid, w, dens))
    np.testing.assert_allclose(lod, [0.0, 1.0, 2.0], atol=1e-5)


def test_textured_render_matches_constant_mean():
    """A checkerboard (mean 0.5) plane renders the same mean image as a
    constant 0.5 albedo — and with spatial variance (the texture shows)."""
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render_sample_batch,
    )
    from cuda_optix_pathtracing_tpu.ops import bsdf as B
    from cuda_optix_pathtracing_tpu.ops import lights as L
    from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
    from cuda_optix_pathtracing_tpu.scene.procedural import generate_plane
    from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host

    def build(textured):
        hs = HostScene()
        # 64² with 2-texel checker cells: a cell spans ~3.6 pixels, safely
        # above Nyquist, so CORRECT mip filtering keeps the pattern. (The
        # r4 pixel_cone_spread fix exposed that the old 1-texel cells sat
        # exactly at one pixel — a properly-filtered render legitimately
        # averages those to gray.)
        hs.camera = CameraConfig(width=64, height=64)
        hs.add_model(generate_plane((0, 3, 0), (0, -1, 0), 4, 4), 0)
        if textured:
            tex = hs.add_texture(np.kron(checker(4), np.ones((2, 2, 1), np.float32)))
            hs.add_material({**B.lambert((1.0, 1.0, 1.0)), "albedo_tex": tex})
        else:
            hs.add_material(B.lambert((0.5, 0.5, 0.5)))
        hs.add_light(L.point_light((10.0, 10.0, 10.0), (0.0, 1.0, 0.0), 0.01))
        return scene_from_host(hs)

    cfg = MegakernelConfig(max_depth=2, remat=False, backend="xla")
    img_t = np.asarray(
        jax.jit(lambda: render_sample_batch(build(True), cfg, 64, 64, jnp.uint32(0)))()
    )
    img_c = np.asarray(
        jax.jit(lambda: render_sample_batch(build(False), cfg, 64, 64, jnp.uint32(0)))()
    )
    assert np.isfinite(img_t).all()
    np.testing.assert_allclose(img_t.mean(), img_c.mean(), rtol=0.05)
    # on lit plane pixels, the checker modulates radiance (ratio swings
    # between ~0 and ~2× the constant render) — texture actually shows
    lit = img_c[..., 0] > 1e-4
    ratio = img_t[..., 0][lit] / img_c[..., 0][lit]
    assert ratio.std() > 0.25, ratio.std()  # constant albedo would give ~0


def test_fbx_uv_import():
    tris, uvs = __import__(
        "cuda_optix_pathtracing_tpu.scene.meshio", fromlist=["load_mesh_ex"]
    ).load_mesh_ex("/root/reference/scenes/sphere.fbx")
    assert uvs is not None and uvs.shape == (tris.shape[0], 3, 2)
    assert 0.0 <= uvs.min() and uvs.max() <= 1.0 + 1e-6


class TestEWA:
    """Bounded-tap EWA anisotropic filtering (reference EWAFormula,
    core-texture.cu:664-731; r4 VERDICT ask #9)."""

    def _stripe_pool(self):
        # vertical stripes: constant along v, alternating along u
        img = np.zeros((64, 64, 3), np.float32)
        img[:, ::2] = 1.0
        return build_texture_pool([img])

    def test_isotropic_matches_trilinear(self):
        """With a zero-length major axis the EWA taps coincide and the
        filter must reduce to plain trilinear."""
        from cuda_optix_pathtracing_tpu.ops.texture import sample_ewa

        pool = self._stripe_pool()
        n = 64
        rng = np.random.default_rng(0)
        uv = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
        tid = jnp.zeros((n,), jnp.int32)
        lod = jnp.full((n,), 1.3, jnp.float32)
        tri = sample_trilinear(pool, tid, uv, lod)
        ewa = sample_ewa(pool, tid, uv, jnp.zeros((n, 2)), lod)
        np.testing.assert_allclose(np.asarray(ewa), np.asarray(tri), atol=1e-6)

    def test_grazing_keeps_contrast_along_stripes(self):
        """Anisotropic footprint stretched ALONG the stripes (v axis):
        EWA taps stay inside one stripe so contrast survives, while an
        isotropic (trilinear) filter at the footprint-covering LOD has
        averaged neighbouring stripes toward gray — the classic
        checkerboard-at-grazing-angle overblur the reference treats EWA
        as the fix for."""
        from cuda_optix_pathtracing_tpu.ops.texture import sample_ewa

        pool = self._stripe_pool()
        n = 128
        u = np.linspace(0.05, 0.95, n, dtype=np.float32)
        uv = jnp.asarray(np.stack([u, np.full_like(u, 0.5)], axis=1))
        tid = jnp.zeros((n,), jnp.int32)
        # footprint: minor 1 texel (u), major 16 texels (v)
        duv_major = jnp.broadcast_to(
            jnp.asarray([0.0, 16.0 / 64.0]), (n, 2)
        )
        lod_minor = jnp.zeros((n,), jnp.float32)
        # the isotropic filter must cover the major axis: lod = log2(16)
        lod_iso = jnp.full((n,), 4.0, jnp.float32)
        ewa = np.asarray(sample_ewa(pool, tid, uv, duv_major, lod_minor))
        tri = np.asarray(sample_trilinear(pool, tid, uv, lod_iso))
        assert ewa.std() > 3.0 * tri.std()  # stripes survive EWA
        assert ewa.max() > 0.9 and ewa.min() < 0.1
        assert 0.2 < tri.mean() < 0.8  # isotropic has gone gray

    def test_cone_ellipse_grazing_geometry(self):
        """At grazing incidence the ellipse major axis lies along the
        view's tangent projection and is ratio=1/cosθ longer than the
        minor axis (clamped to MAX_ANISO)."""
        from cuda_optix_pathtracing_tpu.ops.texture import (
            MAX_ANISO,
            cone_ellipse_uv,
        )

        n = 4
        ng = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        # wo at 75.5° incidence in the xz plane: cosθ = 0.25
        ct = 0.25
        st = float(np.sqrt(1 - ct * ct))
        wo = jnp.broadcast_to(jnp.asarray([st, 0.0, ct]), (n, 3))
        dpdu = jnp.broadcast_to(jnp.asarray([2.0, 0.0, 0.0]), (n, 3))
        dpdv = jnp.broadcast_to(jnp.asarray([0.0, 2.0, 0.0]), (n, 3))
        cone_w = jnp.full((n,), 0.1, jnp.float32)
        dens = jnp.full((n,), 0.5, jnp.float32)  # |duv/dp| = 1/2
        duv_major, minor = cone_ellipse_uv(cone_w, dens, wo, ng, dpdu, dpdv)
        # direction: +u only (t_view = +x → uv dir (0.5, 0))
        np.testing.assert_allclose(np.asarray(duv_major[:, 1]), 0.0, atol=1e-7)
        ratio = np.linalg.norm(np.asarray(duv_major), axis=1) / np.asarray(minor)
        np.testing.assert_allclose(ratio, 1.0 / ct, rtol=1e-5)
        assert np.all(ratio <= MAX_ANISO + 1e-5)
