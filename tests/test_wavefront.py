"""Wavefront model: image parity with the megakernel + early-exit depth."""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_sample_batch,
)
from cuda_optix_pathtracing_tpu.models.wavefront import (
    WavefrontConfig,
    render_sample_batch_wavefront,
)
from cuda_optix_pathtracing_tpu.scene import cornell_box


def test_wavefront_matches_megakernel():
    """Same estimator, same RNG keys → identical image (max_depth equal
    and every path still alive at the cutoff or killed identically)."""
    w = h = 32
    scene = cornell_box(w, h)
    kw = dict(max_depth=4, remat=False, backend="xla", pixel_order="linear")
    a = jax.jit(
        lambda: render_sample_batch(scene, MegakernelConfig(**kw), w, h, jnp.uint32(0))
    )()
    b = jax.jit(
        lambda: render_sample_batch_wavefront(
            scene, WavefrontConfig(**kw), w, h, jnp.uint32(0)
        )
    )()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_wavefront_rejects_halton():
    w = h = 8
    scene = cornell_box(w, h)
    cfg = WavefrontConfig(max_depth=2, sampler="halton", remat=False, backend="xla")
    try:
        render_sample_batch_wavefront(scene, cfg, w, h, jnp.uint32(0))
        raise AssertionError("expected ValueError for halton sampler")
    except ValueError:
        pass
