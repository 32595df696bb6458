"""Counter-based, replayable random number generation.

The reference keeps mutable per-warp Halton-Owen state and consumes
dimensions sequentially (cuda-core/private/rng.cu:96-231). On TPU we make
the stream *stateless*: every sample is a pure function of
``(pixel_x, pixel_y, sample_index, dimension)``. This gives

- order-independence: any lane can ask for any dimension at any time,
- exact path replay for the backward pass (no state to checkpoint),
- determinism that is invariant to device-mesh shape.

Two generators share that keying:

- ``pcg4d`` — Jarzynski & Olano 2020 "Hash Functions for GPU Rendering"
  (public domain construction), the default. The reference ships the scalar
  PCG variant as its stateless fallback (cuda-core/public/cuda-core/rng.cuh:33-80).
- Owen-scrambled Halton (``halton_owen``) for QMC parity with the reference
  sampler: base-2/3/5… radical inverses with nested-uniform (Laine–Karras
  style) scrambling for base 2 and hash-seeded digit scrambling for the
  other bases.

Path-space dimension layout: each bounce consumes ``DIMS_PER_BOUNCE``
dimensions starting at ``DIM_BASE + depth * DIMS_PER_BOUNCE`` (offsets in
``Dim``), mirroring the consumption order of the reference megakernel loop
(megakernel.cu:102-295).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32


class Dim(enum.IntEnum):
    """Per-bounce dimension offsets (consumption order of megakernel.cu)."""

    CAMERA_U = 0  # 2 dims: pixel-filter jitter (depth 0 only)
    LIGHT_SELECT = 2  # 1 dim: NEE light index
    LIGHT_U = 3  # 2 dims: light sampling
    BSDF_U = 5  # 2 dims: bsdf sampling
    BSDF_UC = 7  # 1 dim: bsdf lobe choice
    RR = 8  # 1 dim: russian roulette
    ENV_SELECT = 9  # 1 dim: infinite-light index on miss
    ENV_U = 10  # 2 dims: envmap NEE importance sample
    TREE_U = 12  # 3 dims × 4 split slots: light-tree NEE (select, u1, u2)


DIMS_PER_BOUNCE = 24


def _u32(x):
    return jnp.asarray(x).astype(U32)


def pcg4d(a, b, c, d):
    """4D → 4D hash; returns four uint32 arrays (broadcasted shape)."""
    x = _u32(a) * U32(1664525) + U32(1013904223)
    y = _u32(b) * U32(1664525) + U32(1013904223)
    z = _u32(c) * U32(1664525) + U32(1013904223)
    w = _u32(d) * U32(1664525) + U32(1013904223)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> U32(16))
    y = y ^ (y >> U32(16))
    z = z ^ (z >> U32(16))
    w = w ^ (w >> U32(16))
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def pcg_hash(seed):
    """Scalar PCG hash (reference rng.cuh:35-39), vectorized."""
    state = _u32(seed) * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def u32_to_float01(u):
    """uint32 → float32 in [0, 1) using the top 24 bits."""
    return (u >> U32(8)).astype(jnp.float32) * jnp.float32(5.9604645e-08)


# ---------------------------------------------------------------------------
# Hash sampler (default)
# ---------------------------------------------------------------------------


def hash_sample_2d(px, py, sample, dim, seed: int = 0):
    """Two uniform floats for key (pixel, sample, dim)."""
    x, y, _, _ = pcg4d(px, py, _u32(sample) ^ _u32(seed), dim)
    return u32_to_float01(x), u32_to_float01(y)


def hash_sample_1d(px, py, sample, dim, seed: int = 0):
    x, _, _, _ = pcg4d(px, py, _u32(sample) ^ _u32(seed), dim)
    return u32_to_float01(x)


# ---------------------------------------------------------------------------
# Owen-scrambled Halton
# ---------------------------------------------------------------------------

# first 32 primes: dimension d uses base PRIMES[d % 32]; beyond 32 dims the
# integrator should prefer hash sampling (QMC gains vanish in high dims).
PRIMES = (
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
    59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131,
)


def reverse_bits32(v):
    v = _u32(v)
    v = ((v >> U32(1)) & U32(0x55555555)) | ((v & U32(0x55555555)) << U32(1))
    v = ((v >> U32(2)) & U32(0x33333333)) | ((v & U32(0x33333333)) << U32(2))
    v = ((v >> U32(4)) & U32(0x0F0F0F0F)) | ((v & U32(0x0F0F0F0F)) << U32(4))
    v = ((v >> U32(8)) & U32(0x00FF00FF)) | ((v & U32(0x00FF00FF)) << U32(8))
    return (v >> U32(16)) | (v << U32(16))


def laine_karras_permutation(x, seed):
    """Base-2 nested-uniform (Owen) scramble in reversed-bit space.

    Public construction from Laine & Karras 2011 / Burley 2020.
    """
    x = _u32(x)
    seed = _u32(seed)
    x = x + seed
    x = x ^ (x * U32(0x6C50B47C))
    x = x ^ (x * U32(0xB82F1E52))
    x = x ^ (x * U32(0xC7AFE638))
    x = x ^ (x * U32(0x8D22F6E6))
    return x


def sobol_owen_base2(index, scramble_seed):
    """Owen-scrambled base-2 radical inverse of ``index`` → float in [0,1).

    Digit 0 of the radical inverse is the LSB of ``index``, so the
    Laine–Karras permutation (whose carries propagate LSB→MSB, i.e. from
    earlier digits to later ones, as Owen scrambling requires) is applied
    to the raw index; the final bit reverse *is* the radical inverse.
    """
    v = laine_karras_permutation(_u32(index), scramble_seed)
    return u32_to_float01(reverse_bits32(v))


def radical_inverse_owen(index, base: int, scramble_seed, n_digits: int):
    """Owen-scrambled radical inverse in an odd prime ``base``.

    Per-digit permutation is ``(digit + h) % base`` where ``h`` is a hash of
    the digit prefix — the branchless scheme of the reference
    (rng.cu:96-178), re-derived for counter-based use.
    """
    index = _u32(index)
    scramble_seed = _u32(scramble_seed)
    # the carry must already have the broadcasted shape: a scalar sample
    # index with per-pixel scramble seeds would otherwise widen mid-loop
    shape = jnp.broadcast_shapes(index.shape, scramble_seed.shape)
    index = jnp.broadcast_to(index, shape)
    base_u = U32(base)
    inv_base = jnp.float32(1.0 / base)

    def body(_, carry):
        idx, inv_mult, value, prefix = carry
        digit = idx % base_u
        h = pcg_hash(prefix * U32(0x9E3779B9) ^ _u32(scramble_seed))
        sdigit = (digit + h) % base_u
        value = value + sdigit.astype(jnp.float32) * inv_mult
        prefix = prefix * base_u + digit + U32(1)
        return idx // base_u, inv_mult * inv_base, value, prefix

    init = (
        index,
        jnp.full(shape, 1.0 / base, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, U32),
    )
    _, _, value, _ = lax.fori_loop(0, n_digits, body, init)
    return jnp.minimum(value, jnp.float32(1.0 - 1e-7))


_N_DIGITS = {2: 32, 3: 20, 5: 14, 7: 12, 11: 10, 13: 9}


def halton_owen_sample(px, py, sample, dim, seed: int = 0):
    """Owen-scrambled Halton sample, decorrelated across pixels by hashing
    the pixel into the scramble seed (Cranley–Patterson-free padding).

    Static ``dim`` (Python int) selects the prime base at trace time.
    """
    base = PRIMES[int(dim) % len(PRIMES)]
    pixel_seed, _, _, _ = pcg4d(px, py, U32(int(dim)), _u32(seed))
    if base == 2:
        return sobol_owen_base2(sample, pixel_seed)
    n_digits = _N_DIGITS.get(base, 8)
    return radical_inverse_owen(sample, base, pixel_seed, n_digits)


# ---------------------------------------------------------------------------
# Sampler facade
# ---------------------------------------------------------------------------


class Sampler:
    """Stateless sampler facade bound to a generator kind and global seed.

    ``px, py, sample`` are traced arrays; ``dim`` must be a Python int so
    Halton prime-base selection stays static under jit.
    """

    def __init__(self, kind: str = "hash", seed: int = 0, qmc_dims: int = 12):
        if kind not in ("hash", "halton"):
            raise ValueError(f"unknown sampler kind: {kind}")
        self.kind = kind
        self.seed = seed
        self.qmc_dims = qmc_dims

    def sample_1d(self, px, py, sample, dim: int):
        if self.kind == "halton" and dim < self.qmc_dims:
            return halton_owen_sample(px, py, sample, dim, self.seed)
        return hash_sample_1d(px, py, sample, U32(dim), self.seed)

    def sample_2d(self, px, py, sample, dim: int):
        if self.kind == "halton" and dim + 1 < self.qmc_dims:
            return (
                halton_owen_sample(px, py, sample, dim, self.seed),
                halton_owen_sample(px, py, sample, dim + 1, self.seed),
            )
        u, v = hash_sample_2d(px, py, sample, U32(dim), self.seed)
        return u, v
