import jax.numpy as jnp
import numpy as np

from cuda_optix_pathtracing_tpu.ops import film as F


def test_welford_matches_numpy(rng):
    samples = rng.random((10, 4, 4, 3)).astype(np.float32)
    film = F.film_new(4, 4)
    for s in samples:
        film = F.film_add_sample(film, jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(film.mean), samples.mean(0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(F.film_variance(film)), samples.var(0), atol=1e-6
    )
    assert float(film.n) == 10


def test_film_merge(rng):
    samples = rng.random((8, 2, 2, 3)).astype(np.float32)
    full = F.film_new(2, 2)
    a = F.film_new(2, 2)
    b = F.film_new(2, 2)
    for s in samples:
        full = F.film_add_sample(full, jnp.asarray(s))
    for s in samples[:3]:
        a = F.film_add_sample(a, jnp.asarray(s))
    for s in samples[3:]:
        b = F.film_add_sample(b, jnp.asarray(s))
    merged = F.film_merge(a, b)
    np.testing.assert_allclose(np.asarray(merged.mean), np.asarray(full.mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.m2), np.asarray(full.m2), atol=1e-5)


def test_srgb_roundtrip_uint8():
    lin = jnp.asarray([[0.0, 0.5, 1.0]])
    enc = F.srgb_encode(lin)
    assert float(enc[0, 0]) == 0.0 and abs(float(enc[0, 2]) - 1.0) < 1e-6
    assert 0.7 < float(enc[0, 1]) < 0.75  # sRGB(0.5) ≈ 0.7354
    u8 = np.asarray(F.to_uint8(enc))
    assert u8.dtype == np.uint8 and u8[0, 2] == 255


def test_imageio_roundtrip(tmp_path, rng):
    from cuda_optix_pathtracing_tpu.utils.imageio import read_png, write_png

    img = (rng.random((7, 5, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(img, back)
