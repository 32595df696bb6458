"""Ray-triangle intersection, batched triangle-tile × ray-tile.

Möller–Trumbore with the reference's tolerances (shapes.cu:5-57):
determinant cutoff 1e-7, t > 1e-4, barycentric slack ±1e-7. The reference
walks triangles in a scalar loop per CUDA thread; here every (tri, ray)
pair is an element of a 2D tile and the closest hit is a running min over
triangle chunks (``lax.scan``), which XLA fuses into a single pass.

TPU layout: all intermediates are (Tc, N) tiles — **rays along lanes**
(full 128-wide vector utilization for any ray count) and **triangles along
sublanes** (padding waste capped at 8, the sublane count, instead of 128).
Reductions over triangles are cheap cross-sublane ops. No intermediate
ever has a minor dimension of 3. A Pallas hand-fused variant of the same
tiling lives in ``intersect_pallas.py``.

Triangle storage is SoA: ``v0, e0, e1`` each (T, 3) with
``e0 = p1 - p0, e1 = p2 - p0``; geometric normal is ``cross(e1, e0)``
normalized (the reference's orientation, shapes.cu:48).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .vecmath import cross, normalize, error_from_triangle_intersection

MT_TOLERANCE = 1e-7
T_MIN = 1e-4
BIG_T = 3.0e38


class ClosestHit(NamedTuple):
    """SoA hit record (reference HitResult, types.cuh:160-173)."""

    hit: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,) f32
    tri: jnp.ndarray  # (N,) i32 index of best triangle (0 if none)
    u: jnp.ndarray  # (N,) f32 barycentric
    v: jnp.ndarray  # (N,) f32 barycentric
    pos: jnp.ndarray  # (N,3)
    normal: jnp.ndarray  # (N,3) geometric normal, flipped against ray
    error: jnp.ndarray  # (N,3) intersection error bound
    front: jnp.ndarray  # (N,) bool: hit the geometric front face
    # (the side cross(e0,e1) points toward — emission side of area lights)


def _mt_candidates_tn(o, d, v0c, e0c, e1c):
    """(Tc, N) Möller–Trumbore candidates for one triangle chunk.

    o, d: (N,3) rays; v0c,e0c,e1c: (Tc,3). Invalid entries get BIG_T in t.
    """
    # per-ray rows (1,N) and per-tri columns (Tc,1)
    ox, oy, oz = o[None, :, 0], o[None, :, 1], o[None, :, 2]
    dx, dy, dz = d[None, :, 0], d[None, :, 1], d[None, :, 2]
    v0x, v0y, v0z = v0c[:, 0:1], v0c[:, 1:2], v0c[:, 2:3]
    e0x, e0y, e0z = e0c[:, 0:1], e0c[:, 1:2], e0c[:, 2:3]
    e1x, e1y, e1z = e1c[:, 0:1], e1c[:, 1:2], e1c[:, 2:3]

    # pvec = d × e1
    px = dy * e1z - dz * e1y
    py = dz * e1x - dx * e1z
    pz = dx * e1y - dy * e1x
    det = px * e0x + py * e0y + pz * e0z
    parallel = jnp.abs(det) < MT_TOLERANCE
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    # tvec = o − v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    # qvec = tvec × e0
    qx = ty * e0z - tz * e0y
    qy = tz * e0x - tx * e0z
    qz = tx * e0y - ty * e0x
    u = inv_det * (px * tx + py * ty + pz * tz)
    v = inv_det * (qx * dx + qy * dy + qz * dz)
    t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
    valid = (
        (~parallel)
        & (u >= -MT_TOLERANCE)
        & (v >= -MT_TOLERANCE)
        & (u + v <= 1.0 + MT_TOLERANCE)
        & (t > T_MIN)
    )
    return jnp.where(valid, t, BIG_T), u, v


def _uv_for_tri(o, d, v0g, e0g, e1g):
    """Barycentrics of rays against their per-ray gathered triangle (N,)."""
    px = d[:, 1] * e1g[:, 2] - d[:, 2] * e1g[:, 1]
    py = d[:, 2] * e1g[:, 0] - d[:, 0] * e1g[:, 2]
    pz = d[:, 0] * e1g[:, 1] - d[:, 1] * e1g[:, 0]
    det = px * e0g[:, 0] + py * e0g[:, 1] + pz * e0g[:, 2]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < MT_TOLERANCE, 1.0, det)
    tx = o[:, 0] - v0g[:, 0]
    ty = o[:, 1] - v0g[:, 1]
    tz = o[:, 2] - v0g[:, 2]
    qx = ty * e0g[:, 2] - tz * e0g[:, 1]
    qy = tz * e0g[:, 0] - tx * e0g[:, 2]
    qz = tx * e0g[:, 1] - ty * e0g[:, 0]
    u = inv_det * (px * tx + py * ty + pz * tz)
    v = inv_det * (qx * d[:, 0] + qy * d[:, 1] + qz * d[:, 2])
    return u, v


def _pad_tris(v0, e0, e1, chunk: int):
    t_count = v0.shape[0]
    pad = (-t_count) % chunk
    if pad:
        z = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, z])
        e0 = jnp.concatenate([e0, z])  # degenerate → det 0 → rejected
        e1 = jnp.concatenate([e1, z])
    return v0, e0, e1, t_count + pad


def _tri_chunks(v0, e0, e1, chunk):
    v0p, e0p, e1p, t_padded = _pad_tris(v0, e0, e1, chunk)
    n_chunks = t_padded // chunk
    return (
        v0p.reshape(n_chunks, chunk, 3),
        e0p.reshape(n_chunks, chunk, 3),
        e1p.reshape(n_chunks, chunk, 3),
        n_chunks,
    )


def intersect_closest(o, d, v0, e0, e1, t_max=None, chunk: int = 32) -> ClosestHit:
    """Closest hit of rays (N,3)×2 against all T triangles.

    ``t_max`` optionally clips hits (scalar or (N,)).
    """
    best_t, best_i = intersect_closest_raw(o, d, v0, e0, e1, chunk)
    return closest_epilogue(o, d, v0, e0, e1, best_t, best_i, t_max)


def intersect_closest_raw(o, d, v0, e0, e1, chunk: int = 32):
    """Sweep only: (best_t (N,), best_i (N,)) with t = BIG_T on miss —
    the epilogue-free form the instanced path min-reduces per instance."""
    v0c, e0c, e1c, n_chunks = _tri_chunks(v0, e0, e1, chunk)

    def chunk_best(cv0, ce0, ce1):
        # min + argmin over the sublane (triangle) axis; the winner's (u,v)
        # are recomputed at the end from the gathered triangle, so no
        # cross-sublane gathers are carried through the sweep
        t, _, _ = _mt_candidates_tn(o, d, cv0, ce0, ce1)  # (Tc, N)
        return jnp.min(t, axis=0), jnp.argmin(t, axis=0).astype(jnp.int32)

    if n_chunks == 1:
        best_t, best_i = chunk_best(v0c[0], e0c[0], e1c[0])
    else:

        def step(carry, tri_chunk):
            best_t, best_i, base = carry
            t_b, i_l = chunk_best(*tri_chunk)
            better = t_b < best_t
            best_t = jnp.where(better, t_b, best_t)
            best_i = jnp.where(better, base + i_l, best_i)
            return (best_t, best_i, base + chunk), None

        zf = o[:, 0] * 0.0  # derive from rays: keeps vma under shard_map
        init = (zf + BIG_T, zf.astype(jnp.int32), jnp.int32(0))
        (best_t, best_i, _), _ = lax.scan(step, init, (v0c, e0c, e1c))

    return best_t, best_i


def closest_epilogue(o, d, v0, e0, e1, best_t, best_i, t_max=None) -> ClosestHit:
    """Build the full ClosestHit record from (best_t, best_i).

    Shared by the XLA sweep and the Pallas kernel. Triangle attributes are
    fetched with a one-hot MXU gather (ops/gather.py) — 13× faster than a
    generic gather on TPU for small T.
    """
    from .gather import onehot_gather_pytree

    hit = best_t < BIG_T
    if t_max is not None:
        hit = hit & (best_t < t_max)

    hv0, he0, he1 = onehot_gather_pytree((v0, e0, e1), best_i)
    # recompute barycentrics for the winning triangle only ((N,) ops)
    best_u, best_v = _uv_for_tri(o, d, hv0, he0, he1)
    pos = hv0 + best_u[:, None] * he0 + best_v[:, None] * he1
    ng = normalize(cross(he1, he0))
    front = jnp.sum(d * ng, axis=-1) > 0.0  # d against -cross(e0,e1) ⇒ front
    # flip normal against incident ray (megakernel.cu:128-130)
    ng = jnp.where(jnp.sum(d * ng, axis=-1, keepdims=True) > 0.0, -ng, ng)
    err = error_from_triangle_intersection(best_u, best_v, hv0, hv0 + he0, hv0 + he1)
    return ClosestHit(hit, best_t, best_i, best_u, best_v, pos, ng, err, front)


def intersect_any(o, d, v0, e0, e1, t_max, chunk: int = 32):
    """Occlusion test: True where any triangle hit lies closer than t_max."""
    v0c, e0c, e1c, n_chunks = _tri_chunks(v0, e0, e1, chunk)
    t_max_row = jnp.broadcast_to(jnp.asarray(t_max), (o.shape[0],))[None, :]

    if n_chunks == 1:
        t, _, _ = _mt_candidates_tn(o, d, v0c[0], e0c[0], e1c[0])
        return jnp.any(t < t_max_row, axis=0)

    def step(occluded, tri_chunk):
        cv0, ce0, ce1 = tri_chunk
        t, _, _ = _mt_candidates_tn(o, d, cv0, ce0, ce1)
        return occluded | jnp.any(t < t_max_row, axis=0), None

    occluded0 = o[:, 0] > jnp.inf  # all-False, derived from rays (vma)
    occluded, _ = lax.scan(step, occluded0, (v0c, e0c, e1c))
    return occluded
