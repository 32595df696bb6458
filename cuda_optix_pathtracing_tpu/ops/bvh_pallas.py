"""Pallas TPU packet traversal of the 8-wide BVH (ops/bvh.py).

TPU re-imagination of the reference's AVX2 per-ray stack traversal
(core-bvh-builder.cpp:770-1008): one **ray tile** of (BLOCK_ROWS × 128)
rays shares a single scalar traversal stack (SMEM); each popped node's 8
child slabs are tested against the whole tile; a child is descended if
*any* ray in the tile wants it. Leaves are fixed blocks of LEAF_SIZE
triangles (padded with degenerate triangles at build time).

Layout (v2 — dense, VMEM/SMEM-frugal; replaces the r3 whole-table
(8-octant-replicated, lane-padded) design that VMEM-OOM'd at 8.3k tris):

- ``nodebox``  (M, 128) f32 VMEM — one row per node: the 8 children's
  slabs comp-major ``[lox×8 | loy×8 | loz×8 | hix×8 | hiy×8 | hiz×8]``
  (48 lanes used). 512 B/node, zero lane-padding waste.
- ``nodemeta`` (M·16,) i32 SMEM — per node: 8 slotwords (physical child
  order) ``(payload << 6) | code`` with code 0=empty / 1=internal
  (payload = child node row) / 2=leaf (payload = triangle *block* row),
  then 8 per-octant permcodes packing the far-to-near child visit order
  as 8×3 bits. 64 B/node. This is the de-replicated form of the
  reference's 8 precomputed traversal orders per cluster
  (buildPermutationsBoxproj, core-bvh-builder.cpp:500-546).
- ``tri``      (B, 128) f32 VMEM — 8 triangles per row comp-major
  ``[v0x×8|v0y×8|v0z×8|e0x×8|e0y×8|e0z×8|e1x×8|e1y×8|e1z×8]``
  (72 lanes used). 64 B/triangle.

Mosaic ground rules this design was *measured* against (probe scripts
scripts/probe_layouts*.py on a v5e): dynamic **sublane** slicing is fast
(~40 ns), dynamic lane slicing / in-kernel reshape / transpose are
unsupported, SMEM inputs up to 256 KB read scalars at ~3 ns with fully
dynamic indices, and static lane extracts of a loaded row are ~1 ns.
Hence: all per-node/per-triangle values are fetched as SCALARS (static
lane positions, dynamic sublane row) and broadcast against the full
(8, 128) ray tile — 8-child slab test ≈ 47 ns, 8-tri MT block ≈ 61 ns
per 1024 rays.

Scalar branches cost ~190 ns on TPU (pipeline flush), so each pop takes
exactly one two-way branch (leaf body | node body, lax.cond); pushes are
branchless (always store, conditionally advance the stack pointer).
Children are pushed far-to-near per the tile's direction octant so pops
are near-first and per-ray ``t_best`` (closest) / found-occluder state
(anyhit) prunes far subtrees. Coherent tiles (camera rays, Morton/octant
-sorted bounce rays, ops/raysort.py) touch only their frustum's subtree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LEAF_SIZE
from .intersect import BIG_T, MT_TOLERANCE, T_MIN, ClosestHit, closest_epilogue

LANES = 128
BLOCK_ROWS = 8  # rays per program = 1024: small tiles cull better
STACK_DEPTH = 256
_TRI_SUB = 8  # triangles per packed row

CODE_EMPTY = 0
CODE_INTERNAL = 1
CODE_LEAF = 2


def _traverse_kernel(
    anyhit: bool,
    meta,  # SMEM (M*16,) i32
    ox, oy, oz, dx, dy, dz, tmax,  # VMEM ray planes (BLOCK_ROWS, 128)
    nodebox, tri,  # VMEM tables
    out_t, out_i,  # VMEM outputs (BLOCK_ROWS, 128)
    stack,  # SMEM scratch
):
    tiny = jnp.float32(1e-12)
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    invx = 1.0 / jnp.where(jnp.abs(dxv) < tiny, tiny, dxv)
    invy = 1.0 / jnp.where(jnp.abs(dyv) < tiny, tiny, dyv)
    invz = 1.0 / jnp.where(jnp.abs(dzv) < tiny, tiny, dzv)
    tmaxv = tmax[...]

    # Tile direction octant (majority sign) selects the far-to-near child
    # visit order. Tiles are octant-sorted (ops/raysort.py), so the
    # majority sign is exact for all but boundary tiles — and for those
    # it is merely a weaker ordering, never a correctness issue.
    oct_ = (
        (jnp.sum(dxv) < 0.0).astype(jnp.int32)
        + 2 * (jnp.sum(dyv) < 0.0).astype(jnp.int32)
        + 4 * (jnp.sum(dzv) < 0.0).astype(jnp.int32)
    )

    stack[0] = 0
    big = jnp.full((BLOCK_ROWS, LANES), BIG_T, jnp.float32)
    zero_i = jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)

    def leaf_body(entry, ptr, t_best, i_best):
        base = -entry - 1  # triangle block row
        for blk in range(LEAF_SIZE // _TRI_SUB):
            row = tri[pl.ds(base + blk, 1), :]
            for c in range(_TRI_SUB):
                v0x = row[0, c]
                v0y = row[0, 8 + c]
                v0z = row[0, 16 + c]
                e0x = row[0, 24 + c]
                e0y = row[0, 32 + c]
                e0z = row[0, 40 + c]
                e1x = row[0, 48 + c]
                e1y = row[0, 56 + c]
                e1z = row[0, 64 + c]
                px = dyv * e1z - dzv * e1y
                py = dzv * e1x - dxv * e1z
                pz = dxv * e1y - dyv * e1x
                det = px * e0x + py * e0y + pz * e0z
                parallel = jnp.abs(det) < MT_TOLERANCE
                inv_det = 1.0 / jnp.where(parallel, 1.0, det)
                tx = oxv - v0x
                ty = oyv - v0y
                tz = ozv - v0z
                qx = ty * e0z - tz * e0y
                qy = tz * e0x - tx * e0z
                qz = tx * e0y - ty * e0x
                u = inv_det * (px * tx + py * ty + pz * tz)
                v = inv_det * (qx * dxv + qy * dyv + qz * dzv)
                t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
                ok = (
                    (~parallel)
                    & (u >= -MT_TOLERANCE)
                    & (v >= -MT_TOLERANCE)
                    & (u + v <= 1.0 + MT_TOLERANCE)
                    & (t > T_MIN)
                )
                if anyhit:
                    i_best = i_best | (ok & (t < tmaxv)).astype(jnp.int32)
                else:
                    better = ok & (t < t_best)
                    tid = (base + blk) * _TRI_SUB + c
                    t_best = jnp.where(better, t, t_best)
                    i_best = jnp.where(better, tid, i_best)
        return ptr, t_best, i_best

    def node_body(entry, ptr, t_best, i_best):
        node = entry
        row = nodebox[pl.ds(node, 1), :]
        if anyhit:
            # rays already occluded contribute nothing (limit -1)
            limit = jnp.where(i_best > 0, -1.0, tmaxv)
        else:
            limit = t_best
        hitmask = jnp.int32(0)
        for c in range(8):
            lox = row[0, c]
            loy = row[0, 8 + c]
            loz = row[0, 16 + c]
            hix = row[0, 24 + c]
            hiy = row[0, 32 + c]
            hiz = row[0, 40 + c]
            t0x = (lox - oxv) * invx
            t1x = (hix - oxv) * invx
            t0y = (loy - oyv) * invy
            t1y = (hiy - oyv) * invy
            t0z = (loz - ozv) * invz
            t1z = (hiz - ozv) * invz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), limit),
            )
            hitmask = hitmask | (jnp.any(tn <= tf).astype(jnp.int32) << c)

        pc = meta[node * 16 + 8 + oct_]
        new_ptr = ptr
        # branchless pushes: always store, conditionally advance
        for k in range(8):
            ch = (pc >> (3 * k)) & 7
            w = meta[node * 16 + ch]
            code = w & 63
            payload = lax.shift_right_logical(w, 6)
            wanted = (((hitmask >> ch) & 1) > 0) & (code != CODE_EMPTY)
            enc = jnp.where(code == CODE_LEAF, -payload - 1, payload)
            stack[new_ptr] = enc
            new_ptr = new_ptr + wanted.astype(jnp.int32)
        return new_ptr, t_best, i_best

    def body(carry):
        ptr, t_best, i_best = carry
        entry = stack[ptr - 1]
        ptr = ptr - 1
        return lax.cond(
            entry < 0, leaf_body, node_body, entry, ptr, t_best, i_best
        )

    def cond(carry):
        ptr, _, i_best = carry
        alive = ptr > 0
        if anyhit:
            # whole-tile early exit once every ray has found an occluder
            alive = alive & ~jnp.all(i_best > 0)
        return alive

    _, t_best, i_best = lax.while_loop(
        cond, body, (jnp.int32(1), big, zero_i)
    )
    out_t[...] = t_best
    out_i[...] = i_best


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


def _call(anyhit, planes, nodebox, nodemeta, tri_rows, rows, interpret=False):
    grid = rows // BLOCK_ROWS
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_traverse_kernel, anyhit),
        grid=(grid,),
        in_specs=[smem] + [ray_spec] * 7 + [full] * 2,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        ],
        interpret=interpret,
    )(nodemeta, *planes, nodebox, tri_rows)


def tri_rows_pack(v0, e0, e1):
    """(Tp, 3)×3 packed-order triangle SoA → (B, 128) comp-major rows of
    8 triangles (72 lanes used; see module docstring). Tp must be a
    multiple of 8 (LEAF_SIZE-padded by pack_bvh)."""
    tp = v0.shape[0]
    assert tp % _TRI_SUB == 0, "triangle array must be LEAF_SIZE-padded"
    b = tp // _TRI_SUB
    cols = []
    for arr in (v0, e0, e1):
        for k in range(3):
            cols.append(arr[:, k].reshape(b, _TRI_SUB))
    packed = jnp.concatenate(cols, axis=1)  # (B, 72)
    return jnp.pad(packed, ((0, 0), (0, LANES - 9 * _TRI_SUB)))


def bvh_closest_raw(o, d, nodebox, nodemeta, tri_rows, interpret=False):
    """Kernel only: (t, packed-row index) in the given ray order."""
    planes, rows, n = _pack_rays(o, d)
    best_t, best_i = _call(
        False, planes, nodebox, nodemeta, tri_rows, rows, interpret
    )
    return (
        best_t.reshape(-1)[:n],
        jnp.maximum(best_i.reshape(-1)[:n], 0),
    )


def bvh_closest_pallas(
    o, d, v0, e0, e1, nodebox, nodemeta, tri_rows, t_max=None,
    interpret=False,
) -> ClosestHit:
    """Closest hit through the BVH. Triangle arrays must already be in
    BVH (leaf-major, LEAF_SIZE-padded) order."""
    best_t, best_i = bvh_closest_raw(
        o, d, nodebox, nodemeta, tri_rows, interpret
    )
    return closest_epilogue(o, d, v0, e0, e1, best_t, best_i, t_max)


def bvh_any_raw(o, d, nodebox, nodemeta, tri_rows, t_max, interpret=False):
    """Kernel only: (N,) i32 occlusion flags in the given ray order."""
    t_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))
    planes, rows, n = _pack_rays(o, d, t_arr)
    _, occ = _call(
        True, planes, nodebox, nodemeta, tri_rows, rows, interpret
    )
    return occ.reshape(-1)[:n]


def bvh_any_pallas(o, d, nodebox, nodemeta, tri_rows, t_max, interpret=False):
    return bvh_any_raw(
        o, d, nodebox, nodemeta, tri_rows, t_max, interpret
    ) > 0
