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
    """32²@8spp must stay within noise of the calibrated full-res score.

    Calibration (this repo, CPU): 64²@8spp → 0.182; 256²@512spp (TPU) →
    0.178. Threshold 0.26 catches estimator regressions (broken MIS/NEE/RR
    ≈ +0.05 or worse) while tolerating low-spp Monte-Carlo noise.
    """
    size, spp = 32, 8
    scene = cornell_box(size, size)
    cfg = MegakernelConfig(
        max_depth=5, remat=False,
        features=mat_features_from_table(scene.materials),
    )
    film = render(scene, size, size, spp, cfg=cfg, kspp=spp)
    img = np.asarray(srgb_encode(film.mean))
    score = mean_rmse(img, _ref_downscaled(size))
    assert score < 0.26, f"RMSE vs Cycles regressed: {score:.4f}"


def test_rmse_metric_semantics():
    """mean_rmse matches the reference rmse.py definition exactly."""
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.5)
    np.testing.assert_allclose(mean_rmse(a, b), 0.5, atol=1e-12)
    m = rmse_image(a, b)
    assert m.shape == (4, 4)
    with pytest.raises(ValueError):
        mean_rmse(np.zeros((2, 2, 3)), b)
