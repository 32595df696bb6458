"""RMSE quality regression gate vs the bundled Cycles ground truth.

Mirrors the reference's acceptance test (`scripts/rmse.py` +
`scripts/cycles_2048.png`) at a CI-friendly scale: the procedural Cornell
box rendered tiny on CPU against the box-downscaled 2048-spp Cycles
reference. Full-resolution TPU numbers are recorded in docs/quality.md
(256²@512spp → RMSE 0.1712, vs the repo's own PBRT comparator at 0.1976).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig, render
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.film import srgb_encode
from cuda_optix_pathtracing_tpu.scene import cornell_box
from cuda_optix_pathtracing_tpu.utils.rmse import load_unit_rgb, mean_rmse, rmse_image

CYCLES_REF = "/root/reference/scripts/cycles_2048.png"


def _ref_downscaled(size):
    ref = load_unit_rgb(CYCLES_REF)
    f = ref.shape[0] // size
    return ref.reshape(size, f, size, f, 3).mean(axis=(1, 3))


def test_cornell_rmse_trend():
    """64²@8spp must stay within noise of the calibrated full-res score.

    Calibration (r4, CPU XLA path, 64²@8spp): correct estimator 0.1792;
    256²@512spp (TPU) 0.178. Mutation study (deliberately broken
    estimators, measured): dropping the env miss contribution → 0.2316
    (CAUGHT at 0.21); RR kill without survivor reweighting → 0.184
    (borderline — shows as a trend, not a single-run trip). Known limit,
    also measured: the gate CANNOT catch over-brightening (NEE×1.3 →
    0.1637, NEE×2 → 0.1403 — *closer* to Cycles), because the Cycles
    blend lights the box with an area emitter while the procedural scene
    mirrors the reference cornellBox's spot light, leaving our render
    systematically darker than the reference image. Brightness-direction
    regressions are instead covered by the estimator-equality tests
    (fused-vs-XLA, env-NEE-vs-bsdf) which compare our own paths against
    each other.
    """
    size, spp = 64, 8
    scene = cornell_box(size, size)
    cfg = MegakernelConfig(
        max_depth=5, remat=False,
        features=mat_features_from_table(scene.materials),
    )
    film = render(scene, size, size, spp, cfg=cfg, kspp=spp)
    img = np.asarray(srgb_encode(film.mean))
    score = mean_rmse(img, _ref_downscaled(size))
    assert score < 0.21, f"RMSE vs Cycles regressed: {score:.4f}"


def test_cornell_rmse_deep_paths():
    """Depth-12 spot check: the long-path tail (RR + transmission chains)
    must not diverge — score stays in the same band as depth 5 (the
    Cornell box's >5-bounce energy is small but nonzero; a broken RR
    survival scale inflates it dramatically)."""
    size, spp = 32, 8
    scene = cornell_box(size, size)
    cfg = MegakernelConfig(
        max_depth=12, remat=False,
        features=mat_features_from_table(scene.materials),
    )
    film = render(scene, size, size, spp, cfg=cfg, kspp=spp)
    img = np.asarray(srgb_encode(film.mean))
    score = mean_rmse(img, _ref_downscaled(size))
    assert score < 0.26, f"depth-12 RMSE vs Cycles regressed: {score:.4f}"


def test_rmse_metric_semantics():
    """mean_rmse matches the reference rmse.py definition exactly."""
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.5)
    np.testing.assert_allclose(mean_rmse(a, b), 0.5, atol=1e-12)
    m = rmse_image(a, b)
    assert m.shape == (4, 4)
    with pytest.raises(ValueError):
        mean_rmse(np.zeros((2, 2, 3)), b)
