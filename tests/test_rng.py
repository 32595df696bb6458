import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import rng as R


def _grid_keys(n=4096):
    px = jnp.arange(n, dtype=jnp.uint32) % 64
    py = jnp.arange(n, dtype=jnp.uint32) // 64
    return px, py


def test_hash_uniform_range():
    px, py = _grid_keys()
    u = R.hash_sample_1d(px, py, jnp.uint32(3), jnp.uint32(5))
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_hash_replayable_and_dim_decorrelated():
    px, py = _grid_keys(256)
    a = np.asarray(R.hash_sample_1d(px, py, 7, jnp.uint32(2)))
    b = np.asarray(R.hash_sample_1d(px, py, 7, jnp.uint32(2)))
    c = np.asarray(R.hash_sample_1d(px, py, 7, jnp.uint32(3)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(np.corrcoef(a, c)[0, 1]) < 0.15


def test_reverse_bits32():
    assert int(R.reverse_bits32(jnp.uint32(1))) == 0x80000000
    assert int(R.reverse_bits32(jnp.uint32(0x80000000))) == 1


def test_halton_base2_stratified():
    # first 2^k Owen-scrambled base-2 samples must be perfectly stratified
    # into 2^k equal bins (one sample per bin), any seed.
    k = 6
    idx = jnp.arange(2**k, dtype=jnp.uint32)
    u = np.asarray(R.sobol_owen_base2(idx, jnp.uint32(1234)))
    bins = np.floor(u * 2**k).astype(int)
    assert sorted(bins.tolist()) == list(range(2**k))


def test_halton_base3_stratified():
    idx = jnp.arange(27, dtype=jnp.uint32)
    u = np.asarray(R.radical_inverse_owen(idx, 3, jnp.uint32(77), 20))
    bins = np.floor(u * 27).astype(int)
    assert sorted(bins.tolist()) == list(range(27))


def test_sampler_facade():
    s = R.Sampler("halton", seed=1)
    px = jnp.zeros((8,), jnp.uint32)
    py = jnp.zeros((8,), jnp.uint32)
    smp = jnp.arange(8, dtype=jnp.uint32)
    u1 = np.asarray(s.sample_1d(px, py, smp, 0))
    assert (u1 >= 0).all() and (u1 < 1).all()
    u, v = s.sample_2d(px, py, smp, 3)
    assert np.asarray(u).shape == (8,) and np.asarray(v).shape == (8,)


def test_halton_scalar_sample_index_matches_array():
    # regression: a traced *scalar* sample index with per-pixel scramble
    # seeds used to widen the fori_loop carry mid-loop (shape error) for
    # odd-prime bases; scalar and array sample indices must agree exactly
    import jax

    px = jnp.arange(64, dtype=jnp.uint32)
    py = px * jnp.uint32(3)

    @jax.jit
    def scalar_form(s):
        return R.halton_owen_sample(px, py, s, 2)

    a = scalar_form(jnp.uint32(7))
    b = R.halton_owen_sample(px, py, jnp.full((64,), 7, jnp.uint32), 2)
    assert jnp.array_equal(a, b)
