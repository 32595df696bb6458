"""Pallas TPU packet traversal of the 8-wide BVH (ops/bvh.py).

TPU re-imagination of the reference's AVX2 per-ray stack traversal
(core-bvh-builder.cpp:770-1008): one **ray tile** of (BLOCK_ROWS × 128)
rays shares a single scalar traversal stack (SMEM); each popped node's 8
child slabs are tested against the whole tile as vector ops; a child is
descended if *any* ray in the tile wants it. Leaves are fixed 8-triangle
blocks (padded with degenerate triangles at build time) intersected with
the same broadcast Möller-Trumbore as the brute-force kernel.

Coherent tiles (camera rays, Morton/octant-sorted bounce rays) touch only
their frustum's subtree; a fully incoherent tile degrades toward the
brute-force sweep. Per-ray t_best pruning keeps the work front shrinking.

Node and triangle tables live in VMEM (fits up to ~50k nodes); dynamic
scalar indexing reads child metadata, bounds, and leaf vertices directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LEAF_SIZE, BVHArrays
from .intersect import BIG_T, MT_TOLERANCE, T_MIN, ClosestHit, closest_epilogue

LANES = 128
BLOCK_ROWS = 8  # rays per program = 1024: small tiles cull better
STACK_DEPTH = 128


def _mt_block(tri, base, rox, roy, roz, rdx, rdy, rdz, t_best, i_best, rtmax=None):
    """Unrolled MT over the LEAF_SIZE-triangle leaf block at row ``base`` of
    the (Tp, 9) leaf-major triangle table; returns (t_best, i_best)."""
    for k in range(LEAF_SIZE):
        row = base + k
        v0x, v0y, v0z = tri[row, 0], tri[row, 1], tri[row, 2]
        e0x, e0y, e0z = tri[row, 3], tri[row, 4], tri[row, 5]
        e1x, e1y, e1z = tri[row, 6], tri[row, 7], tri[row, 8]
        px = rdy * e1z - rdz * e1y
        py = rdz * e1x - rdx * e1z
        pz = rdx * e1y - rdy * e1x
        det = px * e0x + py * e0y + pz * e0z
        parallel = jnp.abs(det) < MT_TOLERANCE
        inv_det = 1.0 / jnp.where(parallel, 1.0, det)
        tx = rox - v0x
        ty = roy - v0y
        tz = roz - v0z
        qx = ty * e0z - tz * e0y
        qy = tz * e0x - tx * e0z
        qz = tx * e0y - ty * e0x
        u = inv_det * (px * tx + py * ty + pz * tz)
        v = inv_det * (qx * rdx + qy * rdy + qz * rdz)
        t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
        limit = t_best if rtmax is None else rtmax
        valid = (
            (~parallel)
            & (u >= -MT_TOLERANCE)
            & (v >= -MT_TOLERANCE)
            & (u + v <= 1.0 + MT_TOLERANCE)
            & (t > T_MIN)
            & (t < limit)
        )
        if rtmax is None:
            t_best = jnp.where(valid, t, t_best)
            i_best = jnp.where(valid, row, i_best)
        else:
            i_best = i_best | valid.astype(jnp.int32)
    return t_best, i_best


def _traverse_kernel(
    anyhit: bool,
    ox, oy, oz, dx, dy, dz, tmax,
    lo, hi, meta, tri,
    out_t, out_i,
    stack,
):
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    rtmax = tmax[...] if anyhit else None

    tiny = jnp.float32(1e-12)
    invx = 1.0 / jnp.where(jnp.abs(rdx) < tiny, tiny, rdx)
    invy = 1.0 / jnp.where(jnp.abs(rdy) < tiny, tiny, rdy)
    invz = 1.0 / jnp.where(jnp.abs(rdz) < tiny, tiny, rdz)

    t_init = jnp.full(rox.shape, BIG_T, jnp.float32)
    acc_init = jnp.zeros(rox.shape, jnp.int32)

    stack[0] = 0

    def cond(carry):
        ptr, _, _ = carry
        return ptr > 0

    def body(carry):
        ptr, t_best, acc = carry
        node = stack[ptr - 1]
        ptr = ptr - 1
        limit = jnp.minimum(rtmax, BIG_T) if anyhit else t_best
        if anyhit:
            relevant = acc == 0
        for ch in range(8):
            cnt = meta[node, ch, 1]
            lox, loy, loz = lo[node, ch, 0], lo[node, ch, 1], lo[node, ch, 2]
            hix, hiy, hiz = hi[node, ch, 0], hi[node, ch, 1], hi[node, ch, 2]
            t0x = (lox - rox) * invx
            t1x = (hix - rox) * invx
            t0y = (loy - roy) * invy
            t1y = (hiy - roy) * invy
            t0z = (loz - roz) * invz
            t1z = (hiz - roz) * invz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), limit),
            )
            want = tn <= tf
            if anyhit:
                want = want & relevant
            any_want = jnp.any(want)

            do_push = (cnt == 0) & any_want
            @pl.when(do_push)
            def _():
                stack[ptr] = meta[node, ch, 0]
            ptr = ptr + do_push.astype(jnp.int32)

            is_leaf = (cnt > 0) & any_want
            base = meta[node, ch, 0]
            t_best, acc = lax.cond(
                is_leaf,
                lambda tb, ac: _mt_block(
                    tri, base, rox, roy, roz, rdx, rdy, rdz, tb, ac,
                    rtmax if anyhit else None,
                ),
                lambda tb, ac: (tb, ac),
                t_best, acc,
            )
        return ptr, t_best, acc

    ptr, t_best, acc = lax.while_loop(
        cond, body, (jnp.int32(1), t_init, acc_init)
    )
    out_t[...] = t_best
    out_i[...] = acc  # closest: best row index (miss ⇒ t=BIG_T); anyhit: 0/1


def _pack_rays(o, d, extra=None):
    n = o.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        if extra is not None:
            extra = jnp.concatenate([extra, jnp.zeros((pad,), extra.dtype)])
    rows = (n + pad) // LANES
    planes = [o[:, i].reshape(rows, LANES) for i in range(3)] + [
        d[:, i].reshape(rows, LANES) for i in range(3)
    ]
    planes.append(
        extra.reshape(rows, LANES)
        if extra is not None
        else jnp.zeros((rows, LANES), jnp.float32)
    )
    return planes, rows, n


def _call(anyhit, planes, bvh_lo, bvh_hi, bvh_meta, tri_rows, rows, interpret=False):
    grid = rows // BLOCK_ROWS
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_traverse_kernel, anyhit),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [full] * 4,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(*planes, bvh_lo, bvh_hi, bvh_meta, tri_rows)


def bvh_meta_pack(bvh: BVHArrays):
    """(M,8,2) i32: [,0]=child node index / leaf row base, [,1]=count code."""
    first = jnp.where(
        bvh.child_leaf_count > 0, bvh.child_leaf_start, bvh.child_node
    )
    return jnp.stack([first, bvh.child_leaf_count], axis=-1)


def tri_rows_pack(v0, e0, e1):
    """(T, 9) leaf-major triangle rows [v0|e0|e1]."""
    return jnp.concatenate([v0, e0, e1], axis=1)


def bvh_closest_pallas(
    o, d, v0, e0, e1, bvh_lo, bvh_hi, bvh_meta, tri_rows, t_max=None,
    interpret=False,
) -> ClosestHit:
    """Closest hit through the BVH. Triangle arrays must already be in
    BVH (leaf-major, 8-padded) order."""
    planes, rows, n = _pack_rays(o, d)
    best_t, best_i = _call(
        False, planes, bvh_lo, bvh_hi, bvh_meta, tri_rows, rows, interpret
    )
    best_t = best_t.reshape(-1)[:n]
    best_i = jnp.maximum(best_i.reshape(-1)[:n], 0)
    return closest_epilogue(o, d, v0, e0, e1, best_t, best_i, t_max)


def bvh_any_pallas(
    o, d, bvh_lo, bvh_hi, bvh_meta, tri_rows, t_max, interpret=False
):
    t_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))
    planes, rows, n = _pack_rays(o, d, t_arr)
    _, occ = _call(
        True, planes, bvh_lo, bvh_hi, bvh_meta, tri_rows, rows, interpret
    )
    return occ.reshape(-1)[:n] > 0
