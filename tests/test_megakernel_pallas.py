"""Fused Pallas path-loop megakernel: estimator parity with the XLA
integrator (interpret mode on CPU; on TPU the two agree to ~1e-9 after
the one-hot-gather precision fix — see ops/gather.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    resolve_fused,
    trace_paths,
)
from cuda_optix_pathtracing_tpu.models.megakernel_pallas import (
    pallas_megakernel_supported,
    trace_paths_fused,
)
from cuda_optix_pathtracing_tpu.ops import rng as R
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
from cuda_optix_pathtracing_tpu.scene import cornell_box


@pytest.fixture(scope="module")
def scene():
    return cornell_box(32, 32)


def _camera_rays(scene, w, h, sample):
    pix = pixel_centers(w, h)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)
    s = R.Sampler("hash", 0)
    u1, u2 = s.sample_2d(px, py, sample, R.Dim.CAMERA_U)
    o, d = generate_rays(
        pix + jnp.stack([u1, u2], -1), scene.cam_from_raster,
        scene.world_from_cam,
    )
    return px, py, o, d


def test_fused_matches_xla_integrator(scene):
    """Per-sample radiance agrees with the XLA integrator (same RNG keys,
    same estimator) up to float reassociation."""
    w = h = 32
    cfg = MegakernelConfig(max_depth=3, remat=False, backend="xla")
    acc_x = acc_f = 0.0
    for k in range(4):
        samp = jnp.uint32(k)
        px, py, o, d = _camera_rays(scene, w, h, samp)
        acc_x = acc_x + np.asarray(trace_paths(scene, cfg, px, py, samp, o, d))
        acc_f = acc_f + np.asarray(
            trace_paths_fused(
                scene, px, py, samp, o, d, max_depth=3, interpret=True
            )
        )
    assert np.isfinite(acc_f).all()
    # identical estimator: mean error is reassociation-level, and any
    # residual binary flips (shadow/lobe decisions on borderline floats)
    # must be rare
    diff = np.abs(acc_x - acc_f) / 4.0
    assert diff.mean() < 1e-4
    assert (diff.max(-1) > 1e-3).mean() < 0.005


def test_supported_predicate(scene):
    cfg = MegakernelConfig()
    assert pallas_megakernel_supported(scene, cfg)
    # halton sampler → supported since r5 (in-kernel Owen-Halton)
    assert pallas_megakernel_supported(
        scene, dataclasses.replace(cfg, sampler="halton")
    )
    # env NEE → unsupported
    assert not pallas_megakernel_supported(
        scene, dataclasses.replace(cfg, env_nee=True)
    )


def test_resolve_fused(scene):
    cfg = resolve_fused(scene, MegakernelConfig())
    assert cfg.fused in ("on", "off")  # resolved, never "auto"
    with pytest.raises(ValueError, match="feature set"):
        resolve_fused(
            scene, MegakernelConfig(fused="on", env_nee=True)
        )


def test_fused_bvh_matches_xla_integrator():
    """r4: the fused kernel's in-kernel packet-BVH traversal (mesh
    Cornell, 8-ray-row tiles) agrees with the XLA BVH wavefront."""
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh

    w = h = 32
    scene_m = cornell_box_mesh(w, h, subdiv=8, use_bvh=True)
    assert scene_m.bvh is not None
    cfg = MegakernelConfig(
        max_depth=3, remat=False, backend="xla", sort_rays="off",
        pixel_order="linear",
    )
    assert pallas_megakernel_supported(scene_m, cfg)
    acc_x = acc_f = 0.0
    for k in range(2):
        samp = jnp.uint32(k)
        px, py, o, d = _camera_rays(scene_m, w, h, samp)
        acc_x = acc_x + np.asarray(
            trace_paths(scene_m, cfg, px, py, samp, o, d)
        )
        acc_f = acc_f + np.asarray(
            trace_paths_fused(
                scene_m, px, py, samp, o, d, max_depth=3, interpret=True
            )
        )
    assert np.isfinite(acc_f).all()
    diff = np.abs(acc_x - acc_f) / 2.0
    assert diff.mean() < 1e-4
    assert (diff.max(-1) > 1e-3).mean() < 0.005


def test_sorted_fused_matches_fused():
    """r5: the depth-sorted fused wavefront (one bounce kernel per depth
    + XLA state co-sort between depths) computes the EXACT same
    estimator as the whole-path fused kernel — identical RNG keying,
    identical bounce math — so radiance matches to float-ulp level (the
    tile-majority direction octant differs with tile membership, which
    reorders the traversal's t-min merges: observed max diff 2e-8)."""
    from cuda_optix_pathtracing_tpu.models.megakernel_pallas import (
        trace_paths_fused_sorted,
    )
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh

    w = h = 32
    scene_m = cornell_box_mesh(w, h, subdiv=16, use_bvh=True)
    assert scene_m.bvh is not None
    samp = jnp.uint32(5)
    px, py, o, d = _camera_rays(scene_m, w, h, samp)
    r_f = np.asarray(
        trace_paths_fused(
            scene_m, px, py, samp, o, d, max_depth=4, interpret=True
        )
    )
    r_s = np.asarray(
        trace_paths_fused_sorted(
            scene_m, px, py, samp, o, d, max_depth=4, interpret=True
        )
    )
    assert np.isfinite(r_s).all()
    np.testing.assert_allclose(r_f, r_s, atol=1e-6, rtol=1e-5)


def test_fused_arealight_matches_xla_integrator():
    """r4 scope extension: AREA-light NEE (area-CDF sampling + MIS) and
    direct-emitter-hit MIS agree with the XLA integrator."""
    from cuda_optix_pathtracing_tpu.ops.bsdf import diffuse_light, lambert, oren_nayar
    from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
    from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host

    w = h = 32
    hs = HostScene()
    hs.camera = CameraConfig(width=w, height=h)
    # floor + back wall + emissive ceiling quad (two tris, uneven areas)
    floor = [
        np.array([[-2, 0, -1], [2, 0, -1], [2, 4, -1]], np.float32),
        np.array([[-2, 0, -1], [2, 4, -1], [-2, 4, -1]], np.float32),
    ]
    lamp = [
        np.array([[-0.8, 1.6, 1.4], [0.8, 1.6, 1.4], [0.8, 2.6, 1.4]], np.float32),
        np.array([[-0.8, 1.6, 1.4], [0.8, 2.6, 1.4], [-0.3, 2.1, 1.4]], np.float32),
    ]
    hs.add_model(floor, 0)
    hs.add_model(lamp, 1)
    hs.materials = [
        oren_nayar((0.7, 0.7, 0.7), 0.3),
        diffuse_light((6.0, 5.0, 4.0)),
    ]
    scene_a = scene_from_host(hs, use_light_tree=False)
    assert scene_a.emissive is not None
    cfg = MegakernelConfig(max_depth=3, remat=False, backend="xla")
    assert pallas_megakernel_supported(scene_a, cfg)
    acc_x = acc_f = 0.0
    for k in range(4):
        samp = jnp.uint32(k)
        px, py, o, d = _camera_rays(scene_a, w, h, samp)
        acc_x = acc_x + np.asarray(trace_paths(scene_a, cfg, px, py, samp, o, d))
        acc_f = acc_f + np.asarray(
            trace_paths_fused(scene_a, px, py, samp, o, d, max_depth=3,
                              interpret=True)
        )
    assert np.isfinite(acc_f).all()
    assert acc_f.max() > 0.1  # the lamp actually lights the scene
    diff = np.abs(acc_x - acc_f) / 4.0
    assert diff.mean() < 1e-4
    assert (diff.max(-1) > 1e-3).mean() < 0.005


def test_fused_conductor_matches_xla_integrator():
    """r4 scope extension: GGX conductor (RGB Fresnel + F82 multiscatter)
    agrees with the XLA integrator."""
    from cuda_optix_pathtracing_tpu.ops.bsdf import ggx_conductor, oren_nayar
    from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
    from cuda_optix_pathtracing_tpu.ops.lights import point_light
    from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host

    w = h = 32
    hs = HostScene()
    hs.camera = CameraConfig(width=w, height=h)
    floor = [
        np.array([[-2, 0, -1], [2, 0, -1], [2, 4, -1]], np.float32),
        np.array([[-2, 0, -1], [2, 4, -1], [-2, 4, -1]], np.float32),
    ]
    slab = [
        np.array([[-1, 1.5, -0.2], [1, 1.5, -0.2], [1, 2.5, 0.6]], np.float32),
        np.array([[-1, 1.5, -0.2], [1, 2.5, 0.6], [-1, 2.5, 0.6]], np.float32),
    ]
    hs.add_model(floor, 0)
    hs.add_model(slab, 1)
    hs.materials = [
        oren_nayar((0.6, 0.6, 0.6), 0.2),
        ggx_conductor((0.2, 0.9, 1.4), (3.9, 2.5, 2.1), 0.0, 0.15, 0.15),
    ]
    hs.lights = [point_light((10.0, 10.0, 10.0), (1.0, 0.5, 2.0), 1e-3)]
    scene_c = scene_from_host(hs)
    cfg = MegakernelConfig(max_depth=3, remat=False, backend="xla")
    assert pallas_megakernel_supported(scene_c, cfg)
    acc_x = acc_f = 0.0
    for k in range(4):
        samp = jnp.uint32(k)
        px, py, o, d = _camera_rays(scene_c, w, h, samp)
        acc_x = acc_x + np.asarray(trace_paths(scene_c, cfg, px, py, samp, o, d))
        acc_f = acc_f + np.asarray(
            trace_paths_fused(scene_c, px, py, samp, o, d, max_depth=3,
                              interpret=True)
        )
    assert np.isfinite(acc_f).all()
    diff = np.abs(acc_x - acc_f) / 4.0
    assert diff.mean() < 1e-4
    assert (diff.max(-1) > 1e-3).mean() < 0.005


def test_fused_deterministic(scene):
    w = h = 32
    samp = jnp.uint32(3)
    px, py, o, d = _camera_rays(scene, w, h, samp)
    a = np.asarray(
        trace_paths_fused(scene, px, py, samp, o, d, max_depth=2, interpret=True)
    )
    b = np.asarray(
        trace_paths_fused(scene, px, py, samp, o, d, max_depth=2, interpret=True)
    )
    np.testing.assert_array_equal(a, b)


def test_fused_halton_matches_xla_integrator(scene):
    """r5 (VERDICT r4 next-5): the fused kernel's in-kernel Owen-
    scrambled Halton (Python-unrolled depth loop, static prime bases)
    matches the XLA integrator's halton path to float-ulp level
    (measured 3e-9 mean / 3e-8 max on Cornell — identical keying,
    identical per-digit permutation hashes)."""
    cfg = MegakernelConfig(
        max_depth=3, remat=False, backend="xla", sort_rays="off",
        pixel_order="linear", sampler="halton",
    )
    import cuda_optix_pathtracing_tpu.ops.rng as R2

    acc_x = acc_f = 0.0
    w = h = 24
    from cuda_optix_pathtracing_tpu.scene import cornell_box

    sc = cornell_box(w, h)
    for k in (0, 5):
        samp = jnp.uint32(k)
        pix = pixel_centers(w, h)
        px = pix[:, 0].astype(jnp.uint32)
        py = pix[:, 1].astype(jnp.uint32)
        sampler = R2.Sampler("halton", 0)
        u1, u2 = sampler.sample_2d(px, py, samp, R2.Dim.CAMERA_U)
        p_film = pix + jnp.stack([u1, u2], axis=-1)
        o, d = generate_rays(p_film, sc.cam_from_raster, sc.world_from_cam)
        acc_x = acc_x + np.asarray(
            trace_paths(sc, cfg, px, py, samp, o, d)
        )
        acc_f = acc_f + np.asarray(
            trace_paths_fused(
                sc, px, py, samp, o, d, max_depth=3, interpret=True,
                sampler="halton",
            )
        )
    diff = np.abs(acc_x - acc_f) / 2.0
    assert np.isfinite(acc_f).all()
    assert diff.max() < 1e-5
