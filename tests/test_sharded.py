"""Multi-chip sharding: shard_map render/train == single-device results.

Runs on the 8-virtual-CPU-device mesh from conftest. These tests are the
correctness gate for the net-new multi-chip capability (SURVEY §2.5 row
"Multi-GPU / multi-node: absent → new"): pixel shards per chip, scene
replicated, parameter gradients pmean-reduced over the mesh axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cuda_optix_pathtracing_tpu.models.differentiable import (
    init_params,
    inject_params,
)
from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig
from cuda_optix_pathtracing_tpu.ops.camera import pixel_centers
from cuda_optix_pathtracing_tpu.parallel.render import (
    _render_pixels,
    make_mesh,
    render_sharded,
    train_step_sharded,
)
from cuda_optix_pathtracing_tpu.scene import cornell_box

W, H, SPP = 16, 16, 2


@pytest.fixture(scope="module")
def scene():
    return cornell_box(W, H)


@pytest.fixture(scope="module")
def cfg():
    return MegakernelConfig(max_depth=2, remat=True, backend="xla")


def _single_device_film(scene, cfg):
    """The exact per-pixel Welford accumulation render_sharded performs,
    without shard_map — the equality oracle."""
    pix = pixel_centers(W, H)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)

    def sample_step(carry, s):
        mean, m2 = carry
        radiance = _render_pixels(scene, cfg, px, py, s)
        n = s.astype(jnp.float32) + 1.0
        delta = radiance - mean
        mean = mean + delta / n
        m2 = m2 + delta * (radiance - mean)
        return (mean, m2), None

    z = jnp.zeros((px.shape[0], 3), jnp.float32)
    (mean, m2), _ = jax.lax.scan(
        sample_step, (z, z), jnp.arange(SPP, dtype=jnp.uint32)
    )
    return mean.reshape(H, W, 3), m2.reshape(H, W, 3)


def test_render_sharded_matches_single(scene, cfg):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    film = render_sharded(scene, cfg, W, H, SPP, mesh)
    mean_ref, m2_ref = jax.jit(lambda: _single_device_film(scene, cfg))()
    np.testing.assert_array_equal(np.asarray(film.mean), np.asarray(mean_ref))
    np.testing.assert_array_equal(np.asarray(film.m2), np.asarray(m2_ref))


def test_render_sharded_device_count_invariance(scene, cfg):
    """The image must not depend on the mesh shape (RNG keyed on global
    pixel ids — SURVEY §7 hard part 5)."""
    f2 = render_sharded(scene, cfg, W, H, SPP, make_mesh(2))
    f8 = render_sharded(scene, cfg, W, H, SPP, make_mesh(8))
    np.testing.assert_array_equal(np.asarray(f2.mean), np.asarray(f8.mean))


def test_train_step_sharded_grads_match_single(scene, cfg):
    """pmean'd shard gradients == global gradient of the same loss."""
    params0 = init_params(scene, ("albedo",))
    target = jnp.zeros((H, W, 3), jnp.float32)

    # --- sharded step, but with sgd(lr) so params after one step expose
    # exactly the gradient: p1 = p0 - lr * g
    lr = 1.0
    tx = optax.sgd(lr)
    mesh = make_mesh(8)
    step = train_step_sharded(
        tx.update, lambda p: inject_params(scene, p), cfg, W, H, SPP, mesh
    )
    p1, _, loss_sh = step(params0, tx.init(params0), target, jnp.uint32(0))
    g_sharded = (params0["albedo"] - p1["albedo"]) / lr

    # --- single-device oracle: identical estimator over all pixels
    pix = pixel_centers(W, H)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)

    def global_loss(params):
        sc = inject_params(scene, params)

        def sample_step(mean, s):
            return mean + _render_pixels(sc, cfg, px, py, s) / SPP, None

        mean, _ = jax.lax.scan(
            sample_step,
            jnp.zeros((px.shape[0], 3), jnp.float32),
            jnp.arange(SPP, dtype=jnp.uint32),
        )
        return jnp.mean((mean - target.reshape(-1, 3)) ** 2)

    loss_ref, g_ref = jax.jit(jax.value_and_grad(global_loss))(params0)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-6)
    # pmean-of-shard-means vs one global mean: same value up to fp32
    # reduction order
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_ref["albedo"]), rtol=1e-3, atol=5e-8
    )
