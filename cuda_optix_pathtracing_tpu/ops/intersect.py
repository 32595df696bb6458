"""Ray-triangle intersection, batched ray-tile × triangle-tile.

Möller–Trumbore with the reference's tolerances (shapes.cu:5-57):
determinant cutoff 1e-7, t > 1e-4, barycentric slack ±1e-7. The reference
walks triangles in a scalar loop per CUDA thread; here every (ray, tri)
pair is an element of a 2D tile — rays broadcast along sublanes, triangles
along lanes — and the closest hit is a running min over triangle chunks
(``lax.scan``), which XLA fuses into a single pass. A Pallas variant of the
same tiling lives in ``intersect_pallas.py``.

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


def _mt_candidates(o, d, v0, e0, e1):
    """All (N, Tc) Möller–Trumbore candidates for one triangle chunk.

    Inputs: o,d (N,3); v0,e0,e1 (Tc,3). Returns (t, u, v) with invalid
    entries set to BIG_T in t.
    """
    # (N,1,3) x (1,Tc,3) broadcasting; all ops elementwise on (N,Tc) tiles
    dN = d[:, None, :]
    pvec = cross(dN, e1[None, :, :])  # (N,Tc,3)
    det = jnp.sum(pvec * e0[None, :, :], axis=-1)  # (N,Tc)
    parallel = jnp.abs(det) < MT_TOLERANCE
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    tvec = o[:, None, :] - v0[None, :, :]  # (N,Tc,3)
    qvec = cross(tvec, e0[None, :, :])  # (N,Tc,3)
    u = inv_det * jnp.sum(pvec * tvec, axis=-1)
    v = inv_det * jnp.sum(qvec * dN, axis=-1)
    t = inv_det * jnp.sum(qvec * e1[None, :, :], axis=-1)
    valid = (
        (~parallel)
        & (u >= -MT_TOLERANCE)
        & (v >= -MT_TOLERANCE)
        & (u + v <= 1.0 + MT_TOLERANCE)
        & (t > T_MIN)
    )
    return jnp.where(valid, t, BIG_T), u, v


def _pad_tris(v0, e0, e1, chunk: int):
    t_count = v0.shape[0]
    pad = (-t_count) % chunk
    if pad:
        z = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, z])
        e0 = jnp.concatenate([e0, z])  # degenerate → det 0 → rejected
        e1 = jnp.concatenate([e1, z])
    return v0, e0, e1, t_count + pad


def intersect_closest(o, d, v0, e0, e1, t_max=None, chunk: int = 128) -> ClosestHit:
    """Closest hit of rays (N,3)×2 against all T triangles.

    ``t_max`` optionally clips hits (scalar or (N,)).
    """
    n = o.shape[0]
    v0p, e0p, e1p, t_padded = _pad_tris(v0, e0, e1, chunk)
    n_chunks = t_padded // chunk
    v0c = v0p.reshape(n_chunks, chunk, 3)
    e0c = e0p.reshape(n_chunks, chunk, 3)
    e1c = e1p.reshape(n_chunks, chunk, 3)

    def step(carry, tri_chunk):
        best_t, best_i, best_u, best_v, base = carry
        cv0, ce0, ce1 = tri_chunk
        t, u, v = _mt_candidates(o, d, cv0, ce0, ce1)
        i_local = jnp.argmin(t, axis=1)  # (N,)
        rows = jnp.arange(n)
        t_best = t[rows, i_local]
        u_best = u[rows, i_local]
        v_best = v[rows, i_local]
        better = t_best < best_t
        best_t = jnp.where(better, t_best, best_t)
        best_i = jnp.where(better, base + i_local.astype(jnp.int32), best_i)
        best_u = jnp.where(better, u_best, best_u)
        best_v = jnp.where(better, v_best, best_v)
        return (best_t, best_i, best_u, best_v, base + chunk), None

    init = (
        jnp.full((n,), BIG_T, jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.int32(0),
    )
    (best_t, best_i, best_u, best_v, _), _ = lax.scan(step, init, (v0c, e0c, e1c))

    hit = best_t < BIG_T
    if t_max is not None:
        hit = hit & (best_t < t_max)

    hv0 = v0[best_i]
    he0 = e0[best_i]
    he1 = e1[best_i]
    pos = hv0 + best_u[:, None] * he0 + best_v[:, None] * he1
    ng = normalize(cross(he1, he0))
    # flip normal against incident ray (megakernel.cu:128-130)
    ng = jnp.where(jnp.sum(d * ng, axis=-1, keepdims=True) > 0.0, -ng, ng)
    err = error_from_triangle_intersection(best_u, best_v, hv0, hv0 + he0, hv0 + he1)
    return ClosestHit(hit, best_t, best_i, best_u, best_v, pos, ng, err)


def intersect_any(o, d, v0, e0, e1, t_max, chunk: int = 128):
    """Occlusion test: True where any triangle hit lies closer than t_max."""
    v0p, e0p, e1p, t_padded = _pad_tris(v0, e0, e1, chunk)
    n_chunks = t_padded // chunk
    v0c = v0p.reshape(n_chunks, chunk, 3)
    e0c = e0p.reshape(n_chunks, chunk, 3)
    e1c = e1p.reshape(n_chunks, chunk, 3)
    t_max_col = jnp.broadcast_to(jnp.asarray(t_max), (o.shape[0],))[:, None]

    def step(occluded, tri_chunk):
        cv0, ce0, ce1 = tri_chunk
        t, _, _ = _mt_candidates(o, d, cv0, ce0, ce1)
        return occluded | jnp.any(t < t_max_col, axis=1), None

    occluded0 = jnp.zeros((o.shape[0],), bool)
    occluded, _ = lax.scan(step, occluded0, (v0c, e0c, e1c))
    return occluded
