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
BLOCK_ROWS = 16  # rays per program = 2048 (sweep: 16 beats 8 at LEAF=16)
STACK_DEPTH = 256
_TRI_SUB = 8  # triangles per packed row

CODE_EMPTY = 0
CODE_INTERNAL = 1
CODE_LEAF = 2


def _mt_scalar_tri(o, d, row, c):
    """MT of packed-row triangle ``c`` (scalars) against the whole tile.

    ``o``/``d`` are component tuples of (R, 128) planes. Returns
    (ok, t, u, v) as (R, 128) values."""
    v0x = row[0, c]
    v0y = row[0, 8 + c]
    v0z = row[0, 16 + c]
    e0x = row[0, 24 + c]
    e0y = row[0, 32 + c]
    e0z = row[0, 40 + c]
    e1x = row[0, 48 + c]
    e1y = row[0, 56 + c]
    e1z = row[0, 64 + c]
    px = d[1] * e1z - d[2] * e1y
    py = d[2] * e1x - d[0] * e1z
    pz = d[0] * e1y - d[1] * e1x
    det = px * e0x + py * e0y + pz * e0z
    parallel = jnp.abs(det) < MT_TOLERANCE
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    tx = o[0] - v0x
    ty = o[1] - v0y
    tz = o[2] - v0z
    qx = ty * e0z - tz * e0y
    qy = tz * e0x - tx * e0z
    qz = tx * e0y - ty * e0x
    u = inv_det * (px * tx + py * ty + pz * tz)
    v = inv_det * (qx * d[0] + qy * d[1] + qz * d[2])
    t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
    ok = (
        (~parallel)
        & (u >= -MT_TOLERANCE)
        & (v >= -MT_TOLERANCE)
        & (u + v <= 1.0 + MT_TOLERANCE)
        & (t > T_MIN)
    )
    return ok, t, u, v


def tile_traverse(mode, o, d, meta, nodebox, tri, stack, tmax=None, alive=None):
    """Shared-stack packet traversal of one ray tile, for use INSIDE a
    Pallas kernel (also called by the fused path-loop megakernel,
    models/megakernel_pallas.py).

    ``o``/``d`` are 3-tuples of (R, 128) planes; ``meta`` an SMEM ref,
    ``nodebox``/``tri`` VMEM refs (PackedBVH layout), ``stack`` an SMEM
    scratch of STACK_DEPTH i32.

    mode:
    - "closest": returns (t_best, i_best) — packed triangle row index.
    - "attrs":   returns (t_best, u, v, matid, p0, e0, e1) with the
      winner's attributes accumulated during the sweep (p0/e0/e1 are
      component tuples; matid comes from tri-row lanes 72..79).
    - "any":     returns occ (R, 128) i32; requires ``tmax`` (R, 128).

    ``alive`` (R, 128) bool, optional: dead lanes are excluded from the
    slab ANY-vote (closest/attrs: t_best starts at 0, so nothing can
    beat it; any: the lane starts "occluded"), so mostly-dead tiles
    prune to the live rays' frustum and all-dead tiles exit after one
    root pop — load-bearing for the fused megakernel's later bounces,
    where misses and Russian roulette have killed most lanes but the
    kernel cannot compact them.
    """
    shape = o[0].shape
    tiny = jnp.float32(1e-12)
    invx = 1.0 / jnp.where(jnp.abs(d[0]) < tiny, tiny, d[0])
    invy = 1.0 / jnp.where(jnp.abs(d[1]) < tiny, tiny, d[1])
    invz = 1.0 / jnp.where(jnp.abs(d[2]) < tiny, tiny, d[2])
    anyhit = mode == "any"
    attrs = mode == "attrs"

    # Tile direction octant (majority sign) selects the far-to-near child
    # visit order. Tiles are octant-sorted (ops/raysort.py), so the
    # majority sign is exact for all but boundary tiles — and for those
    # it is merely a weaker ordering, never a correctness issue.
    oct_ = (
        (jnp.sum(d[0]) < 0.0).astype(jnp.int32)
        + 2 * (jnp.sum(d[1]) < 0.0).astype(jnp.int32)
        + 4 * (jnp.sum(d[2]) < 0.0).astype(jnp.int32)
    )

    stack[0] = 0
    big = jnp.full(shape, BIG_T, jnp.float32)
    if alive is not None:
        big = jnp.where(alive, big, 0.0)
    zf = jnp.zeros(shape, jnp.float32)
    zi = jnp.zeros(shape, jnp.int32)
    if anyhit:
        occ0 = zi if alive is None else (~alive).astype(jnp.int32)
        state0 = (big, occ0)  # (unused t, occ)
    elif attrs:
        state0 = (big, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf)
        # (t, u, v, mat, p0xyz, e0xyz, e1xyz)
    else:
        state0 = (big, zi)

    def leaf_body(entry, ptr, *state):
        base = -entry - 1  # triangle block row
        for blk in range(LEAF_SIZE // _TRI_SUB):
            row = tri[pl.ds(base + blk, 1), :]
            if anyhit:
                t_b, occ = state
                hit_any = None
                for c in range(_TRI_SUB):
                    ok, t, _, _ = _mt_scalar_tri(o, d, row, c)
                    h = ok & (t < tmax)
                    hit_any = h if hit_any is None else (hit_any | h)
                occ = occ | hit_any.astype(jnp.int32)
                state = (t_b, occ)
                continue
            # The 8 tris are data-independent: evaluate them all, then a
            # pairwise min-TREE picks the block winner, and the carried
            # best is updated ONCE. A sequential where-chain here put
            # ~3 dependent ops per triangle on the loop-carried critical
            # path (~25 ns each on the VPU) — the tree form keeps the
            # chain at log2(8)+1 steps per block.
            cand = []
            for c in range(_TRI_SUB):
                ok, t, u, v = _mt_scalar_tri(o, d, row, c)
                cand.append((jnp.where(ok, t, BIG_T), jnp.int32(c), u, v))
            while len(cand) > 1:
                nxt = []
                for j in range(0, len(cand), 2):
                    ta, ca, ua, va = cand[j]
                    tb, cb, ub, vb = cand[j + 1]
                    sel = ta <= tb
                    nxt.append((
                        jnp.minimum(ta, tb),
                        jnp.where(sel, ca, cb),
                        jnp.where(sel, ua, ub),
                        jnp.where(sel, va, vb),
                    ))
                cand = nxt
            t_w, c_w, u_w, v_w = cand[0]
            if attrs:
                (t_b, u_b, v_b, m_b, p0x, p0y, p0z,
                 e0x_, e0y_, e0z_, e1x_, e1y_, e1z_) = state
                better = t_w < t_b
                # winner attribute rows: 8-way scalar select by c_w
                sels = []
                for lane0 in (72, 0, 8, 16, 24, 32, 40, 48, 56, 64):
                    acc = row[0, lane0] * (c_w == 0).astype(jnp.float32)
                    for c in range(1, _TRI_SUB):
                        acc = acc + row[0, lane0 + c] * (
                            c_w == c
                        ).astype(jnp.float32)
                    sels.append(acc)
                state = (
                    jnp.where(better, t_w, t_b),
                    jnp.where(better, u_w, u_b),
                    jnp.where(better, v_w, v_b),
                    jnp.where(better, sels[0], m_b),
                    jnp.where(better, sels[1], p0x),
                    jnp.where(better, sels[2], p0y),
                    jnp.where(better, sels[3], p0z),
                    jnp.where(better, sels[4], e0x_),
                    jnp.where(better, sels[5], e0y_),
                    jnp.where(better, sels[6], e0z_),
                    jnp.where(better, sels[7], e1x_),
                    jnp.where(better, sels[8], e1y_),
                    jnp.where(better, sels[9], e1z_),
                )
            else:
                t_b, i_b = state
                better = t_w < t_b
                tid = (base + blk) * _TRI_SUB + c_w
                state = (
                    jnp.where(better, t_w, t_b),
                    jnp.where(better, tid, i_b),
                )
        return (ptr,) + state

    def node_body(entry, ptr, *state):
        node = entry
        row = nodebox[pl.ds(node, 1), :]
        if anyhit:
            # rays already occluded contribute nothing (limit -1)
            limit = jnp.where(state[1] > 0, -1.0, tmax)
        else:
            limit = state[0]
        hm = jnp.zeros(shape, jnp.int32)
        for c in range(8):
            lox = row[0, c]
            loy = row[0, 8 + c]
            loz = row[0, 16 + c]
            hix = row[0, 24 + c]
            hiy = row[0, 32 + c]
            hiz = row[0, 40 + c]
            t0x = (lox - o[0]) * invx
            t1x = (hix - o[0]) * invx
            t0y = (loy - o[1]) * invy
            t1y = (hiy - o[1]) * invy
            t0z = (loz - o[2]) * invz
            t1z = (hiz - o[2]) * invz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), limit),
            )
            hm = hm | ((tn <= tf).astype(jnp.int32) << c)
        # OR-reduce hm to one scalar via a roll tree: the former 8
        # per-child jnp.any readbacks each synchronized the scalar unit
        # with a full-vector reduction; one log-depth OR tree + a single
        # element extract is ~10-20% whole-kernel throughput (measured:
        # camera 24.1 -> 26.5 Mrays/s, sorted bounce 7.0 -> 8.3).
        for shift in (64, 32, 16, 8, 4, 2, 1):
            hm = hm | pltpu.roll(hm, shift, 1)
        sub = 1
        while sub < shape[0]:
            hm = hm | pltpu.roll(hm, sub, 0)
            sub *= 2
        hitmask = hm[0, 0]

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
        return (new_ptr,) + state

    def body(carry):
        ptr = carry[0]
        entry = stack[ptr - 1]
        ptr = ptr - 1
        return lax.cond(
            entry < 0, leaf_body, node_body, entry, ptr, *carry[1:]
        )

    def cond(carry):
        keep = carry[0] > 0
        if anyhit:
            # whole-tile early exit once every ray has found an occluder
            # (min-roll-tree + one extract, not jnp.all — same readback
            # economics as the hitmask OR tree above)
            mn = carry[2]
            for shift in (64, 32, 16, 8, 4, 2, 1):
                mn = jnp.minimum(mn, pltpu.roll(mn, shift, 1))
            sub = 1
            while sub < mn.shape[0]:
                mn = jnp.minimum(mn, pltpu.roll(mn, sub, 0))
                sub *= 2
            keep = keep & (mn[0, 0] == 0)
        return keep

    out = lax.while_loop(cond, body, (jnp.int32(1),) + state0)
    if anyhit:
        return out[2]
    if attrs:
        t_b, u_b, v_b, m_b = out[1], out[2], out[3], out[4]
        p0 = (out[5], out[6], out[7])
        e0 = (out[8], out[9], out[10])
        e1 = (out[11], out[12], out[13])
        return t_b, u_b, v_b, m_b, p0, e0, e1
    return out[1], out[2]


def _traverse_kernel(
    anyhit: bool,
    meta,  # SMEM (M*16,) i32
    ox, oy, oz, dx, dy, dz, tmax,  # VMEM ray planes (BLOCK_ROWS, 128)
    nodebox, tri,  # VMEM tables
    out_t, out_i,  # VMEM outputs (BLOCK_ROWS, LANES)
    stack,  # SMEM scratch
):
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    if anyhit:
        occ = tile_traverse(
            "any", o, d, meta, nodebox, tri, stack, tmax=tmax[...]
        )
        out_t[...] = jnp.full(o[0].shape, BIG_T, jnp.float32)
        out_i[...] = occ
    else:
        t_best, i_best = tile_traverse(
            "closest", o, d, meta, nodebox, tri, stack
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


def tri_rows_pack(v0, e0, e1, mat_id=None):
    """(Tp, 3)×3 packed-order triangle SoA → (B, 128) comp-major rows of
    8 triangles (72 lanes used; see module docstring). Tp must be a
    multiple of 8 (LEAF_SIZE-padded by pack_bvh). When ``mat_id`` (Tp,)
    is given, material ids ride in lanes 72..79 as f32 (exact < 2^24) —
    the fused megakernel reads them during its winner-attribute sweep."""
    tp = v0.shape[0]
    assert tp % _TRI_SUB == 0, "triangle array must be LEAF_SIZE-padded"
    b = tp // _TRI_SUB
    cols = []
    for arr in (v0, e0, e1):
        for k in range(3):
            cols.append(arr[:, k].reshape(b, _TRI_SUB))
    if mat_id is not None:
        cols.append(mat_id.astype(jnp.float32).reshape(b, _TRI_SUB))
    packed = jnp.concatenate(cols, axis=1)  # (B, 72|80)
    return jnp.pad(packed, ((0, 0), (0, LANES - packed.shape[1])))


@functools.lru_cache(maxsize=None)
def _closest_nd(rows, interpret):
    """Zero-VJP closest-hit kernel entry (see ops/autodiff.py): the
    discrete (t, index) events are constants under reverse-mode; shading
    derivatives flow through closest_epilogue's recomputation."""
    from .autodiff import nondiff_kernel

    def f(*arrays):
        planes = list(arrays[:7])
        nodebox, nodemeta, tri_rows = arrays[7:]
        return _call(False, planes, nodebox, nodemeta, tri_rows, rows, interpret)

    return nondiff_kernel(f)


@functools.lru_cache(maxsize=None)
def _any_nd(rows, interpret):
    from .autodiff import nondiff_kernel

    def f(*arrays):
        planes = list(arrays[:7])
        nodebox, nodemeta, tri_rows = arrays[7:]
        return _call(True, planes, nodebox, nodemeta, tri_rows, rows, interpret)

    return nondiff_kernel(f)


def bvh_closest_raw(o, d, nodebox, nodemeta, tri_rows, interpret=False):
    """Kernel only: (t, packed-row index) in the given ray order."""
    planes, rows, n = _pack_rays(o, d)
    best_t, best_i = _closest_nd(rows, interpret)(
        *planes, nodebox, nodemeta, tri_rows
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
    _, occ = _any_nd(rows, interpret)(*planes, nodebox, nodemeta, tri_rows)
    return occ.reshape(-1)[:n]


def bvh_any_pallas(o, d, nodebox, nodemeta, tri_rows, t_max, interpret=False):
    return bvh_any_raw(
        o, d, nodebox, nodemeta, tri_rows, t_max, interpret
    ) > 0
