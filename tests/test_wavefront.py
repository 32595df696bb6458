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


def test_pool_wavefront_matches_megakernel():
    """Path-regeneration pool (compaction-by-refill) produces the same
    film as the dense megakernel — same RNG keying per (pixel, sample),
    only the fp reduction order differs."""
    from cuda_optix_pathtracing_tpu.models.wavefront import (
        WavefrontConfig,
        render_pool_wavefront,
    )
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render,
    )
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
    from cuda_optix_pathtracing_tpu.scene import cornell_box

    w, spp = 32, 4
    scene = cornell_box(w, w)
    ft = mat_features_from_table(scene.materials)
    f1 = render(
        scene, w, w, spp,
        cfg=MegakernelConfig(max_depth=4, remat=False, features=ft),
        kspp=spp,
    )
    # pool much smaller than the sample count → many refill generations
    f2 = render_pool_wavefront(
        scene, w, w, spp,
        cfg=WavefrontConfig(max_depth=4, remat=False, features=ft),
        pool=512,
    )
    np.testing.assert_allclose(
        np.asarray(f1.mean), np.asarray(f2.mean), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(f1.m2), np.asarray(f2.m2), atol=3e-4
    )
    assert float(f2.n) == spp
