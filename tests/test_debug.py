"""NaN-guard debug mode (VERDICT r4 #10): cfg.debug asserts film
finiteness per progressive batch — the TPU analogue of the reference's
device asserts + CUDA_CHECK (wavefront/main.cu:35-53, types.cuh:20-29)."""

import jax.numpy as jnp
import pytest

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render,
)
from cuda_optix_pathtracing_tpu.scene import cornell_box


def _cfg(**kw):
    return MegakernelConfig(
        max_depth=2, remat=False, backend="xla", fused="off", debug=True, **kw
    )


def test_nan_guard_fires_on_poisoned_material():
    scene = cornell_box(8, 8)
    mats = scene.materials._replace(
        albedo=scene.materials.albedo.at[0, 0].set(jnp.nan)
    )
    scene = scene._replace(materials=mats)
    with pytest.raises(FloatingPointError, match="NaN guard"):
        render(scene, 8, 8, 1, cfg=_cfg(), kspp=1)


def test_nan_guard_quiet_on_clean_scene():
    scene = cornell_box(8, 8)
    film = render(scene, 8, 8, 1, cfg=_cfg(), kspp=1)
    assert bool(jnp.all(jnp.isfinite(film.mean)))
