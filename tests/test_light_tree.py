"""Light tree (Conty/Kulla): PMF exactness, unbiasedness, and variance
reduction vs uniform light selection (reference
core-light-tree-builder.cpp:306-569)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_sample_batch,
)
from cuda_optix_pathtracing_tpu.ops import lights as L
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.light_tree import (
    build_light_tree,
    light_tree_pmf,
    sample_light_tree,
    split_frontier,
)
from cuda_optix_pathtracing_tpu.scene.procedural import generate_plane
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host


def _random_point_lights(n, rng, spread=4.0):
    rows = []
    for _ in range(n):
        p = rng.uniform(-spread, spread, 3)
        p[2] = rng.uniform(1.0, 3.0)
        c = rng.uniform(0.05, 3.0, 3)
        rows.append(L.point_light(tuple(c), tuple(p)))
    return rows


@pytest.fixture(scope="module")
def tree100():
    rng = np.random.default_rng(7)
    lt = L.make_light_table(_random_point_lights(100, rng))
    tree, _ = build_light_tree(lt, None)
    return tree


def test_pmf_sums_to_one(tree100):
    tree = tree100
    p = jnp.asarray([[0.0, 0.0, 0.1], [3.0, -2.0, 0.5], [-4.0, 4.0, 0.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    total = jnp.zeros((3,))
    for r in range(tree.n_records):
        rec = jnp.full((3,), r, jnp.int32)
        total = total + light_tree_pmf(tree, rec, p, n)
    np.testing.assert_allclose(np.asarray(total), 1.0, rtol=1e-4)


def test_descent_matches_trail_pmf(tree100):
    """Stochastic descent selection frequency over a dense stratified u
    grid equals the analytic bit-trail PMF (inverse-CDF exactness)."""
    tree = tree100
    m = 4096
    u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
    p = jnp.broadcast_to(jnp.asarray([1.0, 1.0, 0.2]), (m, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (m, 3))
    rec, pmf = sample_light_tree(tree, p, nrm, u)
    rec = np.asarray(rec)
    counts = np.bincount(rec, minlength=tree.n_records) / m
    one = jnp.asarray([[1.0, 1.0, 0.2]])
    none = jnp.asarray([[0.0, 0.0, 1.0]])
    for r in np.unique(rec):
        analytic = float(
            light_tree_pmf(tree, jnp.asarray([r], jnp.int32), one, none)[0]
        )
        assert counts[r] == pytest.approx(analytic, abs=2.5 / m + 0.02 * analytic)
    # sampled pmf values agree with the analytic walk
    pmf_walk = light_tree_pmf(tree, jnp.asarray(rec), p, nrm)
    np.testing.assert_allclose(np.asarray(pmf), np.asarray(pmf_walk), rtol=1e-4)


def test_split_frontier_shapes(tree100):
    levels, roots = split_frontier(tree100, 4)
    assert levels == 2 and len(roots) == 4
    live = [r for r in roots if r >= 0]
    assert len(live) >= 1
    # frontier pmfs are conditional below the split: each subtree sums to 1
    p = jnp.asarray([[0.5, -0.5, 0.3]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    tree = tree100
    total = jnp.zeros((1,))
    for r in range(tree.n_records):
        rec = jnp.asarray([r], jnp.int32)
        total = total + light_tree_pmf(tree, rec, p, n, split_levels=levels)
    # with 4 deterministic subtrees the per-record pmfs sum to the number
    # of live subtrees (each subtree's conditional pmf sums to 1)
    np.testing.assert_allclose(np.asarray(total), len(live), rtol=1e-4)


def _many_light_scene(n_lights, seed=3, use_tree=None):
    rng = np.random.default_rng(seed)
    hs = HostScene()
    mat = hs.add_material(dict(kind="lambert", albedo=(0.7, 0.7, 0.7)))
    hs.add_model(generate_plane((0, 0, 0), (0, 0, 1), 12, 12), mat)
    for l in _random_point_lights(n_lights, rng):
        hs.add_light(l)
    from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig

    hs.camera = CameraConfig(
        position=(0.0, -6.0, 3.0), direction=(0.0, 1.0, -0.45),
        width=16, height=16,
    )
    return scene_from_host(hs, use_light_tree=use_tree)


def _render_mean(scene, strategy, spp, seed=0, splits=1):
    cfg = MegakernelConfig(
        max_depth=2, remat=False, light_strategy=strategy, seed=seed,
        nee_splits=splits, features=mat_features_from_table(scene.materials),
    )
    acc = None
    for s in range(spp):
        img = render_sample_batch(scene, cfg, 16, 16, jnp.uint32(s))
        acc = img if acc is None else acc + img
    return np.asarray(acc) / spp


def test_tree_unbiased_vs_uniform():
    scene = _many_light_scene(24, use_tree=True)
    assert scene.light_tree is not None
    a = _render_mean(scene, "tree", 96)
    b = _render_mean(scene, "uniform", 96)
    # same scene, same estimator family → means agree within MC noise
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)
    np.testing.assert_allclose(a, b, atol=5.0 * a.mean())


def test_tree_splits_unbiased():
    scene = _many_light_scene(24, use_tree=True)
    a = _render_mean(scene, "tree", 48, splits=4)
    b = _render_mean(scene, "tree", 48, splits=1)
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)


def test_tree_lower_variance_than_uniform():
    """The whole point of the tree: at equal spp the image error vs a
    converged reference is measurably lower than uniform selection."""
    scene = _many_light_scene(100, use_tree=True)
    ref = _render_mean(scene, "tree", 256, seed=1, splits=2)
    a = _render_mean(scene, "tree", 8, seed=0)
    b = _render_mean(scene, "uniform", 8, seed=0)
    mse_tree = float(((a - ref) ** 2).mean())
    mse_uni = float(((b - ref) ** 2).mean())
    assert mse_tree < 0.6 * mse_uni, (mse_tree, mse_uni)


def test_scene_autobuild_threshold():
    s_small = _many_light_scene(4)
    assert s_small.light_tree is None
    s_big = _many_light_scene(20)
    assert s_big.light_tree is not None
