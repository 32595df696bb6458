"""Pallas TPU kernels for ray-triangle intersection.

Hand-fused version of ops/intersect.py's sweep: each grid program owns a
(BLOCK_ROWS, 128) tile of rays held in vector registers; triangles stream
through a ``fori_loop`` as scalars broadcast against the whole tile. One
pass over HBM for the rays, zero intermediate materialization — the XLA
version moves every (Tc, N) temporary through HBM, this one doesn't.

Layout: ray components arrive as (N/128, 128) planes (rays in lanes);
triangles as an SoA (9, T) table in VMEM, rows = v0/e0/e1 components.

Scope: brute-force all-triangles sweep — optimal for the Cornell-scale
scenes the reference benchmarks (types.cuh TriangleSoup is the same SoA
idea). Large meshes go through the BVH path (ops/bvh.py) which calls the
same tile sweep per candidate leaf cluster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import (
    BIG_T,
    MT_TOLERANCE,
    T_MIN,
    ClosestHit,
    closest_epilogue,
)

LANES = 128
BLOCK_ROWS = 32  # rays per program = BLOCK_ROWS * LANES = 4096


def _closest_kernel(n_tris: int, ox, oy, oz, dx, dy, dz, tri, best_t, best_i):
    t_best = jnp.full(ox.shape, BIG_T, jnp.float32)
    i_best = jnp.zeros(ox.shape, jnp.int32)

    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]

    def body(t_idx, carry):
        t_best, i_best = carry
        v0x, v0y, v0z = tri[0, t_idx], tri[1, t_idx], tri[2, t_idx]
        e0x, e0y, e0z = tri[3, t_idx], tri[4, t_idx], tri[5, t_idx]
        e1x, e1y, e1z = tri[6, t_idx], tri[7, t_idx], tri[8, t_idx]

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
        valid = (
            (~parallel)
            & (u >= -MT_TOLERANCE)
            & (v >= -MT_TOLERANCE)
            & (u + v <= 1.0 + MT_TOLERANCE)
            & (t > T_MIN)
            & (t < t_best)
        )
        t_best = jnp.where(valid, t, t_best)
        i_best = jnp.where(valid, t_idx, i_best)
        return t_best, i_best

    t_best, i_best = jax.lax.fori_loop(0, n_tris, body, (t_best, i_best))
    best_t[...] = t_best
    best_i[...] = i_best


def _anyhit_kernel(n_tris: int, ox, oy, oz, dx, dy, dz, tmax, tri, occ):
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    rtmax = tmax[...]

    def body(t_idx, hit):
        v0x, v0y, v0z = tri[0, t_idx], tri[1, t_idx], tri[2, t_idx]
        e0x, e0y, e0z = tri[3, t_idx], tri[4, t_idx], tri[5, t_idx]
        e1x, e1y, e1z = tri[6, t_idx], tri[7, t_idx], tri[8, t_idx]
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
        valid = (
            (~parallel)
            & (u >= -MT_TOLERANCE)
            & (v >= -MT_TOLERANCE)
            & (u + v <= 1.0 + MT_TOLERANCE)
            & (t > T_MIN)
            & (t < rtmax)
        )
        # carry as int32: Mosaic rejects i1 vectors in loop carries
        return hit | valid.astype(jnp.int32)

    occ[...] = jax.lax.fori_loop(
        0, n_tris, body, jnp.zeros(rox.shape, jnp.int32)
    )


def _pack_rays(o, d, extra=None):
    """Pad ray count to a block multiple and reshape to (rows, 128) planes."""
    n = o.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])  # d=0 → no hit
        if extra is not None:
            extra = jnp.concatenate([extra, jnp.zeros((pad,), extra.dtype)])
    rows = (n + pad) // LANES
    planes = [o[:, i].reshape(rows, LANES) for i in range(3)] + [
        d[:, i].reshape(rows, LANES) for i in range(3)
    ]
    if extra is not None:
        planes.append(extra.reshape(rows, LANES))
    return planes, rows, n


def _tri_table(v0, e0, e1):
    return jnp.stack(
        [
            v0[:, 0], v0[:, 1], v0[:, 2],
            e0[:, 0], e0[:, 1], e0[:, 2],
            e1[:, 0], e1[:, 1], e1[:, 2],
        ],
        axis=0,
    )  # (9, T)


def _closest_call(planes, tri_tab, rows):
    n_tris = tri_tab.shape[1]
    grid = rows // BLOCK_ROWS
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_closest_kernel, n_tris),
        grid=(grid,),
        in_specs=[ray_spec] * 6 + [tri_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(rows) * LANES * n_tris * 45,
            bytes_accessed=int(rows) * LANES * 8 * 4,
            transcendentals=0,
        ),
    )(*planes, tri_tab)


def _any_call(planes, tri_tab, rows):
    n_tris = tri_tab.shape[1]
    grid = rows // BLOCK_ROWS
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_anyhit_kernel, n_tris),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=int(rows) * LANES * n_tris * 45,
            bytes_accessed=int(rows) * LANES * 8 * 4,
            transcendentals=0,
        ),
    )(*planes, tri_tab)


@functools.lru_cache(maxsize=None)
def _closest_nd(rows):
    """Zero-VJP kernel entry (ops/autodiff.py): discrete hit events are
    constants under reverse-mode; derivatives flow through the epilogue."""
    from .autodiff import nondiff_kernel

    return nondiff_kernel(
        lambda *a: _closest_call(list(a[:6]), a[6], rows)
    )


@functools.lru_cache(maxsize=None)
def _any_nd(rows):
    from .autodiff import nondiff_kernel

    return nondiff_kernel(lambda *a: _any_call(list(a[:7]), a[7], rows))


def intersect_closest_pallas_raw(o, d, v0, e0, e1):
    """Sweep only: (best_t, best_i) with t = BIG_T on miss."""
    planes, rows, n = _pack_rays(o, d)
    tri_tab = _tri_table(v0, e0, e1)
    best_t, best_i = _closest_nd(rows)(*planes[:6], tri_tab)
    return best_t.reshape(-1)[:n], best_i.reshape(-1)[:n]


def intersect_closest_pallas(o, d, v0, e0, e1, t_max=None) -> ClosestHit:
    """Pallas closest-hit; drop-in for intersect.intersect_closest."""
    best_t, best_i = intersect_closest_pallas_raw(o, d, v0, e0, e1)
    return closest_epilogue(o, d, v0, e0, e1, best_t, best_i, t_max)


def intersect_any_pallas(o, d, v0, e0, e1, t_max):
    """Pallas occlusion test; drop-in for intersect.intersect_any."""
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))
    planes, rows, n = _pack_rays(o, d, t_max_arr)
    tri_tab = _tri_table(v0, e0, e1)
    occ = _any_nd(rows)(*planes, tri_tab)
    return occ.reshape(-1)[:n] > 0
