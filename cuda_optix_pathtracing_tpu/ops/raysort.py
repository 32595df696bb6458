"""Ray sorting for coherent packet traversal.

The packet-BVH kernel (ops/bvh_pallas.py) shares one traversal stack per
(rows×128)-ray tile, so throughput hinges on tiles being spatially and
directionally coherent. Camera rays arrive Morton-ordered; secondary
(bounce/shadow) rays do not. This module re-orders a ray batch by
``direction-octant | origin-Morton`` before traversal and restores
original order afterwards — the TPU equivalent of the reference
wavefront's ray-queue regrouping (wavefront-stream's per-tile queues,
wave-kernels.cuh:180-187), built on `lax.sort`, which co-sorts the key
and any number of value arrays in one fused op (~0.05 ms for 9 arrays at
N=65536 — essentially free next to an intersection pass).

Dead lanes get the maximal key so they cluster into a few all-dead tiles
whose traversal exits immediately.

Sorts are STABLE (r5): camera rays share one origin, so their keys
collapse to the 3 octant bits — an unstable sort scrambles the incoming
Morton pixel order within each octant and was measured costing ~1.8× on
depth-0 traversal in the spp-flattened bench leg (14.6 vs 25.8 Mrays/s).
Stable sorting preserves the previous depth's coherence wherever keys
tie, at ~no extra sort cost.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32


def _part3(v):
    """Spread 10 bits to every 3rd position (30-bit 3D Morton)."""
    v = v.astype(U32) & U32(0x3FF)
    v = (v | (v << U32(16))) & U32(0x030000FF)
    v = (v | (v << U32(8))) & U32(0x0300F00F)
    v = (v | (v << U32(4))) & U32(0x030C30C3)
    v = (v | (v << U32(2))) & U32(0x09249249)
    return v


def morton3(x, y, z):
    return _part3(x) | (_part3(y) << U32(1)) | (_part3(z) << U32(2))


def ray_sort_key(o, d, bounds_lo, bounds_hi, alive=None, morton_bits: int = 7,
                 dir_bits: int = 0):
    """(N,) u32 sort key:
    [31]=dead [30:28]=direction octant [..]=direction Morton
    (``dir_bits`` per |component| within the octant) [..]=origin Morton
    (``morton_bits`` per axis), packed top-aligned.

    The direction bits (r4) subdivide each octant's 90°×90° cone so a
    sorted tile's union frustum is a narrower wedge. Measured on mesh
    Cornell bounce rays (v5e): NEUTRAL at 1 bit (8.0 vs 8.0 Mrays/s)
    and 1.6× WORSE at 2 bits (4.9 — origin locality loss dominates in a
    closed scene where every wall sees every direction anyway), so the
    default stays 0; the knob exists for open scenes with long rays
    where direction coherence is the scarcer resource.
    """
    octant = (
        (d[:, 0] < 0).astype(U32)
        | ((d[:, 1] < 0).astype(U32) << U32(1))
        | ((d[:, 2] < 0).astype(U32) << U32(2))
    )
    key = octant << U32(28)
    shift = 28
    if dir_bits:
        ad = jnp.abs(d)
        dscale = jnp.float32((1 << dir_bits) - 1)
        di = (jnp.clip(ad, 0.0, 0.999999) * dscale).astype(U32)
        dm = morton3(di[:, 0], di[:, 1], di[:, 2]) if dir_bits > 1 else (
            di[:, 0] | (di[:, 1] << U32(1)) | (di[:, 2] << U32(2))
        )
        shift -= 3 * dir_bits
        key = key | (dm << U32(shift))
    extent = jnp.maximum(bounds_hi - bounds_lo, 1e-6)
    q = jnp.clip((o - bounds_lo) / extent, 0.0, 1.0)
    scale = jnp.float32((1 << morton_bits) - 1)
    qi = (q * scale).astype(U32)
    m = morton3(qi[:, 0], qi[:, 1], qi[:, 2])  # 3*morton_bits bits
    shift -= 3 * morton_bits
    key = key | (m << U32(shift))
    if alive is not None:
        key = jnp.where(alive, key, U32(0xFFFFFFFF))
    return key


def scene_bounds(v0, e0, e1):
    """AABB of the triangle soup ((3,), (3,)) — fused reductions."""
    p1 = v0 + e0
    p2 = v0 + e1
    lo = jnp.minimum(jnp.minimum(v0, p1), p2).min(axis=0)
    hi = jnp.maximum(jnp.maximum(v0, p1), p2).max(axis=0)
    return lo, hi


def sorted_apply_tmax(o, d, t_max, key, fn):
    """Like :func:`sorted_apply` but co-sorts a per-ray ``t_max`` and
    expects ``fn(o_s, d_s, t_max_s) -> (N,) array`` (occlusion flags)."""
    n = o.shape[0]
    idx = jnp.arange(n, dtype=U32)
    _, sidx, so0, so1, so2, sd0, sd1, sd2, stm = lax.sort(
        (key, idx, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max),
        num_keys=1,
        is_stable=True,
    )
    so = jnp.stack([so0, so1, so2], axis=1)
    sd = jnp.stack([sd0, sd1, sd2], axis=1)
    out = fn(so, sd, stm)
    return lax.sort((sidx, out), num_keys=1)[1]


def sorted_apply(o, d, key, fn, n_hit_outputs: int):
    """Run ``fn(o_sorted, d_sorted) -> tuple of (N,) arrays`` on rays
    sorted by ``key``, returning outputs in ORIGINAL ray order.

    Forward: one co-sort of (key, idx, o, d). Inverse: one co-sort of
    (idx, *outputs).
    """
    n = o.shape[0]
    idx = jnp.arange(n, dtype=U32)
    _, sidx, so0, so1, so2, sd0, sd1, sd2 = lax.sort(
        (key, idx, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]),
        num_keys=1,
        is_stable=True,
    )
    so = jnp.stack([so0, so1, so2], axis=1)
    sd = jnp.stack([sd0, sd1, sd2], axis=1)
    outs = fn(so, sd)
    if not isinstance(outs, tuple):
        outs = (outs,)
    assert len(outs) == n_hit_outputs
    unsorted = lax.sort((sidx,) + outs, num_keys=1)[1:]
    return unsorted if n_hit_outputs > 1 else unsorted[0]
