"""Film: per-pixel Welford online mean + M2 accumulation.

Capability parity with the reference's DeviceOutputBuffer / SMEM Welford
accumulation (types.cuh:175-193, megakernel.cuh:31-96) and its mean +
sqrt-MSE image outputs (host_utils.cu:246-293). The film triple
(mean, m2, n) is also the *checkpoint state* for progressive rendering —
exactly as sample batching with ``sampleOffset`` is in the reference
(megakernel/main.cu:141-193).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Film(NamedTuple):
    mean: jnp.ndarray  # (H, W, 3)
    m2: jnp.ndarray  # (H, W, 3)
    n: jnp.ndarray  # () f32 samples accumulated so far


def film_new(height: int, width: int) -> Film:
    z = jnp.zeros((height, width, 3), jnp.float32)
    return Film(z, z, jnp.float32(0.0))


def film_add_sample(film: Film, radiance) -> Film:
    """Welford update with one radiance sample per pixel (H,W,3)."""
    n = film.n + 1.0
    delta = radiance - film.mean
    mean = film.mean + delta / n
    m2 = film.m2 + delta * (radiance - mean)
    return Film(mean, m2, n)


def film_add_batch(film: Film, radiance_batch) -> Film:
    """Welford update with a batch of S samples per pixel (S,H,W,3).

    Batch-form update (Chan et al. merge of the batch's own mean/M2 with
    the running state) — one pass over the batch, no per-sample loop.
    """
    s = radiance_batch.shape[0]
    b_mean = jnp.mean(radiance_batch, axis=0)
    b_m2 = jnp.sum(jnp.square(radiance_batch - b_mean[None]), axis=0)
    return film_merge(film, Film(b_mean, b_m2, jnp.float32(s)))


def film_merge(a: Film, b: Film) -> Film:
    """Parallel Welford merge (Chan et al.) — used to combine films
    accumulated independently, e.g. per device shard or per batch."""
    n = a.n + b.n
    nb_safe = jnp.maximum(n, 1.0)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.n / nb_safe)
    m2 = a.m2 + b.m2 + delta * delta * (a.n * b.n / nb_safe)
    return Film(mean, m2, n)


def film_variance(film: Film):
    """Per-pixel per-sample variance M2/N (biased, as the reference)."""
    return film.m2 / jnp.maximum(film.n, 1.0)


def film_sqrt_mse(film: Film):
    """Per-pixel sample std, the reference's *_sqrt_mse image."""
    return jnp.sqrt(jnp.maximum(film_variance(film), 0.0))


def srgb_encode(linear):
    """Linear → sRGB transfer (what the Cycles reference PNG uses)."""
    l = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(l <= 0.0031308, 12.92 * l, 1.055 * jnp.power(l, 1.0 / 2.4) - 0.055)


def to_uint8(img01):
    return jnp.clip(jnp.round(img01 * 255.0), 0, 255).astype(jnp.uint8)
