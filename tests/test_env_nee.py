"""Env-NEE estimator equality (VERDICT r2 ask #7): with an HDR
environment, `env_nee=True` (envmap importance sampling + MIS against
the BSDF bounce) and `env_nee=False` (env picked up on miss only) are
the same estimator — means must agree within Monte-Carlo CI, and for a
peaked env the MIS'd version must have LOWER variance.

Reference behaviour: the Gen-1 50% env / 50% light split in
core-render.cpp:285-370.
"""

import numpy as np

import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render,
)
from cuda_optix_pathtracing_tpu.scene.types import CameraConfig, HostScene, scene_from_host
from cuda_optix_pathtracing_tpu.scene.procedural import generate_plane
from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import lights as L


def _open_scene(w, h):
    """Diffuse floor under a peaked HDR sky — most radiance arrives via
    env rays, exercising both env estimators hard."""
    hs = HostScene()
    hs.add_model(generate_plane((0, 2.5, -0.6), (0, 0, 1), 6, 6), 0)
    hs.add_material(B.oren_nayar((0.8, 0.8, 0.8), 0.3))
    env = np.full((16, 32, 3), 0.05, np.float32)
    # v = (row+0.5)/16, θ = (1−v)π, z = cosθ: rows 13–14 → z ≈ +0.9
    # (high in the sky, fully visible to the +z-facing floor)
    env[13:15, 8:10] = 25.0  # small bright patch
    hs.env_image = env
    hs.add_light(L.point_light((0.01, 0.01, 0.01), (0.0, 2.0, 1.0)))
    hs.camera = CameraConfig(
        position=(0.0, 0.0, 0.5),
        direction=(0.0, 1.0, -0.35),
        width=w,
        height=h,
    )
    return scene_from_host(hs)


def _render(scene, w, h, spp, env_nee):
    cfg = MegakernelConfig(max_depth=3, remat=False, env_nee=env_nee)
    return render(scene, w, h, spp, cfg=cfg, kspp=spp)


def test_env_nee_unbiased_and_lower_variance():
    w = h = 24
    spp = 192
    scene = _open_scene(w, h)
    f_miss = _render(scene, w, h, spp, env_nee=False)
    f_nee = _render(scene, w, h, spp, env_nee=True)

    m0 = np.asarray(f_miss.mean)
    m1 = np.asarray(f_nee.mean)
    # per-pixel stderr of each mean; z-test on the difference
    se0 = np.sqrt(np.asarray(f_miss.m2) / (spp * (spp - 1)))
    se1 = np.sqrt(np.asarray(f_nee.m2) / (spp * (spp - 1)))
    se = np.sqrt(se0**2 + se1**2) + 1e-4
    z = np.abs(m0 - m1) / se
    # mean |z| ≈ half-normal mean (0.8) if the estimators agree. No
    # per-pixel tail assertion: pixels whose miss-only estimator caught
    # zero rare patch-hits underestimate their own stderr, so individual
    # z values are unbounded even for an unbiased pair.
    assert np.mean(z) < 1.5, np.mean(z)
    # equal visible brightness overall (the real unbiasedness signal:
    # a pre-fix 35% bias fails this at any spp)
    np.testing.assert_allclose(m1.mean(), m0.mean(), rtol=0.05)

    # the peaked env is found by IS, not by cosine-bounce luck:
    var0 = np.asarray(f_miss.m2).mean()
    var1 = np.asarray(f_nee.m2).mean()
    assert var1 < 0.7 * var0, (var0, var1)
