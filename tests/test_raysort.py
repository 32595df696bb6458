"""Ray sorting tests (VERDICT r2 ask #7): sorted_apply round-trips to
original ray order, and the Morton/octant key builds correctly.
Reference context: queue regrouping in wavefront-stream/main.cu — here
re-designed as coherence SORTING (ops/raysort.py)."""

import numpy as np

import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.ops.raysort import (
    morton3,
    ray_sort_key,
    scene_bounds,
    sorted_apply,
    sorted_apply_tmax,
)


def _rays(rng, n=512):
    o = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_morton3_bit_interleave():
    x = jnp.asarray([1, 0, 0, 3], jnp.uint32)
    y = jnp.asarray([0, 1, 0, 3], jnp.uint32)
    z = jnp.asarray([0, 0, 1, 3], jnp.uint32)
    m = np.asarray(morton3(x, y, z))
    assert m[0] == 1 and m[1] == 2 and m[2] == 4
    assert m[3] == 0b111111


def test_sorted_apply_restores_order(rng):
    o, d = _rays(rng)
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    key = ray_sort_key(o, d, lo, hi)

    def fn(so, sd):
        return (jnp.sum(so * 2.0 + sd, axis=-1), jnp.sum(so * sd, axis=-1))

    a, b = sorted_apply(o, d, key, fn, 2)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(jnp.sum(o * 2.0 + d, axis=-1)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(jnp.sum(o * d, axis=-1)), rtol=1e-6
    )


def test_sorted_apply_tmax_restores_order(rng):
    o, d = _rays(rng)
    t_max = jnp.asarray(rng.random(o.shape[0]), jnp.float32)
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    key = ray_sort_key(o, d, lo, hi)
    out = sorted_apply_tmax(
        o, d, t_max, key, lambda so, sd, st: st * jnp.sum(so + sd, axis=-1)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(t_max * jnp.sum(o + d, axis=-1)), rtol=1e-6
    )


def test_key_groups_by_octant(rng):
    """The top 3 key bits are the direction octant: rays with identical
    direction signs sort adjacently before any Morton refinement."""
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
        jnp.float32,
    )
    key = np.asarray(ray_sort_key(o, d, jnp.zeros(3), jnp.ones(3)))
    assert len(np.unique(key >> np.uint32(21))) == 8 or len(np.unique(key)) == 8


def test_scene_bounds_contains_vertices(rng):
    v0 = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    e0 = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32) * 0.1
    e1 = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32) * 0.1
    lo, hi = scene_bounds(v0, e0, e1)
    for v in (v0, v0 + e0, v0 + e1):
        assert bool(jnp.all(v >= lo[None] - 1e-5))
        assert bool(jnp.all(v <= hi[None] + 1e-5))
