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
LEAF_STACK_DEPTH = 8192  # in-flight leaf BLOCKS awaiting drain (LIFO);
# bounded by the blocks a single tile has discovered but not yet
# MT-tested — worst case the scene's whole block count. 32 KB SMEM.
DRAIN = 4  # leaf blocks MT-tested per loop iteration (see tile_traverse)
UNROLL = 1  # pop-and-drain steps per while_loop cond evaluation
NODES_SMEM = True  # node slabs as a flat SMEM table when they fit: the
# pop's 48 slab scalars become ~3 ns dynamic SMEM reads instead of a
# data-dependent VMEM row load (r5 experiment)
TRI_VMEM_LIMIT = 10 * 1024 * 1024  # triangle-table bytes above which the
# kernel switches to the HBM-streaming drain (leaf rows DMA'd into a
# VMEM scratch; ~230k padded tris was the whole-resident ceiling)
_TRI_SUB = 8  # triangles per packed row

CODE_EMPTY = 0
CODE_INTERNAL = 1
CODE_LEAF = 2
_BIG_BOX = 3.0e38


def degen_tables(nodebox, nodemeta, tri_rows):
    """Append the DEGENERATE rows the branchless pop-and-drain loop
    substitutes when a stack runs dry (see tile_traverse): a node whose
    8 child slabs are inverted (lo=+BIG, hi=−BIG → no ray ever hits →
    its 16 meta slots, all CODE_EMPTY, are never *wanted*) and a
    triangle block of zeros (e1 = 0 → det = 0 → parallel → no hit).
    Their row ids are recovered statically inside the kernel as
    ``shape[0] − 1``."""
    degen_box = jnp.concatenate(
        [
            jnp.full((1, 24), _BIG_BOX, jnp.float32),
            jnp.full((1, 24), -_BIG_BOX, jnp.float32),
            jnp.zeros((1, LANES - 48), jnp.float32),
        ],
        axis=1,
    )
    return (
        jnp.concatenate([nodebox, degen_box]),
        jnp.concatenate([nodemeta, jnp.zeros((16,), nodemeta.dtype)]),
        jnp.concatenate(
            [tri_rows, jnp.zeros((1, LANES), tri_rows.dtype)]
        ),
    )


def _mt_scalar_tri(o, d, row, c):
    """MT of packed-row triangle ``c`` (scalars) against the whole tile.

    ``o``/``d`` are component tuples of (R, 128) planes. Returns
    (ok, t, u, v) as (R, 128) values."""
    ok, t, u, v = _mt_rows8(o, d, lambda lane: row[0, lane])
    return ok[c], t[c], u[c], v[c]


_R8 = range(_TRI_SUB)


def _mt_rows8(o, d, getv):
    """MT of ALL 8 triangles of one packed row against the whole tile.

    ``getv(lane)`` fetches one scalar of the row — in the hot kernel it
    is a STATIC SMEM read of a prefetched row (r5: each vreg→scalar
    lane extract is a vector/scalar-unit sync; 72 of them per block
    measured ~45% of bounce-tile traversal time, scripts/probe_* +
    the NO_EXTRACT in-situ experiment: 8.0 → 14.0 Mrays/s).
    Returns (ok, t, u, v) as lists of 8 (R, 128) values."""
    ok, t, u, v = [], [], [], []
    # per-triangle chain emission order (the 8-way step-interleaved
    # form was measured ~5-15% SLOWER in situ — more simultaneous live
    # temps; Mosaic schedules ILP fine on its own)
    for c in _R8:
        v0x, v0y, v0z = getv(c), getv(8 + c), getv(16 + c)
        e0x, e0y, e0z = getv(24 + c), getv(32 + c), getv(40 + c)
        e1x, e1y, e1z = getv(48 + c), getv(56 + c), getv(64 + c)
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
        uc = inv_det * (px * tx + py * ty + pz * tz)
        vc = inv_det * (qx * d[0] + qy * d[1] + qz * d[2])
        tc = inv_det * (qx * e1x + qy * e1y + qz * e1z)
        okc = (
            (~parallel)
            & (uc >= -MT_TOLERANCE)
            & (vc >= -MT_TOLERANCE)
            & (uc + vc <= 1.0 + MT_TOLERANCE)
            & (tc > T_MIN)
        )
        ok.append(okc)
        t.append(tc)
        u.append(uc)
        v.append(vc)
    return ok, t, u, v


def tile_traverse(mode, o, d, meta, nodebox, tri, stack, lstack,
                  tmax=None, alive=None, stream=None):
    """Shared-stack packet traversal of one ray tile, for use INSIDE a
    Pallas kernel (also called by the fused path-loop megakernel,
    models/megakernel_pallas.py).

    ``o``/``d`` are 3-tuples of (R, 128) planes; ``meta`` an SMEM ref,
    ``nodebox``/``tri`` VMEM refs (PackedBVH layout **with the
    degenerate rows of degen_tables appended**), ``stack`` an SMEM
    scratch of STACK_DEPTH i32 (internal nodes only) and ``lstack`` an
    SMEM scratch of LEAF_STACK_DEPTH i32 (pending leaf BLOCK rows).

    r5 redesign — branchless pop-and-drain with SMEM row prefetch. The
    r4 loop alternated node pops and leaf bodies behind a per-iteration
    ``lax.cond`` and fetched every per-node/per-triangle scalar by
    vreg lane extract. Two in-situ findings (scripts/xplane_prof.py +
    the NO_EXTRACT experiment) drove this version: (1) per-iteration
    control flow, not vector work, dominated the old loop; (2) the 72
    lane extracts per MT block are vector/scalar-unit syncs costing as
    much as the MT math itself on bounce tiles. So the loop now has NO
    conditional control flow — every iteration unconditionally pops one
    node and drains DRAIN leaf blocks, with DEGENERATE rows substituted
    when a stack runs dry — Row data is fetched by (1,128)
    vector load + static lane extracts — measured EQUAL to direct ref
    scalar reads and to DMA-prefetched SMEM rows (r5 A/B: 24.5/8.0 vs
    22.0/6.9 vs 22.6/7.0 Mrays/s camera/bounce), so the simplest form
    is kept. In-situ cost fit (DRAIN sweep 2/4/8): ~185 ns per MT
    block, ~1.3 µs per pop iteration — the pop cost is NOT explained
    by isolated probes of any constituent (rolls, extracts, branches,
    SMEM, DMA waits all measure fast); see docs/perf_notes.md r5.

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

    ``stream`` (r5, HBM-streaming tier): ``(scratch, sems)`` where
    ``scratch`` is a VMEM (DRAIN, 128) f32 scratch and ``sems`` a DMA
    semaphore array of DRAIN slots. When given, ``tri`` is an
    HBM-resident (ANY-space) table and each drained leaf row is DMA'd
    into its scratch slot — all DRAIN copies are issued before the
    first wait, so their latencies overlap. This is how scenes whose
    triangle table exceeds the VMEM budget (~230k padded tris, the r4
    ceiling) traverse: the TPU re-design of the reference's DRAM
    traversal (core-bvh-builder.cpp:770-1008).
    """
    shape = o[0].shape
    tiny = jnp.float32(1e-12)
    invx = 1.0 / jnp.where(jnp.abs(d[0]) < tiny, tiny, d[0])
    invy = 1.0 / jnp.where(jnp.abs(d[1]) < tiny, tiny, d[1])
    invz = 1.0 / jnp.where(jnp.abs(d[2]) < tiny, tiny, d[2])
    anyhit = mode == "any"
    attrs = mode == "attrs"
    if len(nodebox.shape) == 1:  # flat SMEM node table (48 f32 per node)
        degen_node = nodebox.shape[0] // 48 - 1
    else:
        degen_node = nodebox.shape[0] - 1
    degen_block = tri.shape[0] - 1

    # Tile direction octant (majority sign) selects the far-to-near child
    # visit order. Tiles are octant-sorted (ops/raysort.py), so the
    # majority sign is exact for all but boundary tiles — and for those
    # it is merely a weaker ordering, never a correctness issue.
    oct_ = (
        (jnp.sum(d[0]) < 0.0).astype(jnp.int32)
        + 2 * (jnp.sum(d[1]) < 0.0).astype(jnp.int32)
        + 4 * (jnp.sum(d[2]) < 0.0).astype(jnp.int32)
    )

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

    def mt_block(getv, base, limit):
        """One 8-tri packed row → per-mode block result. ``getv(lane)``
        reads the prefetched row's scalars (static SMEM); ``base`` is
        the block row id (for the closest-mode triangle index)."""
        ok8, t8, u8, v8 = _mt_rows8(o, d, getv)
        if anyhit:
            hit = [ok8[c] & (t8[c] < tmax) for c in range(_TRI_SUB)]
            while len(hit) > 1:
                hit = [
                    hit[j] | hit[j + 1] for j in range(0, len(hit), 2)
                ]
            return hit[0].astype(jnp.int32)
        # data-independent 8-candidate min-tree (log2(8) dependency
        # depth); the carried best is merged ONCE per drain batch
        cand = [
            (jnp.where(ok8[c], t8[c], BIG_T), jnp.int32(c), u8[c], v8[c])
            for c in range(_TRI_SUB)
        ]
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
            # winner attribute rows: 8-way scalar select by c_w
            sels = []
            for lane0 in (72, 0, 8, 16, 24, 32, 40, 48, 56, 64):
                acc = getv(lane0) * (c_w == 0).astype(jnp.float32)
                for c in range(1, _TRI_SUB):
                    acc = acc + getv(lane0 + c) * (
                        c_w == c
                    ).astype(jnp.float32)
                sels.append(acc)
            return (t_w, u_w, v_w) + tuple(sels)
        tid = base * _TRI_SUB + c_w
        return t_w, tid

    def merge_two(a, b):
        """Tree-merge two block results (closest/attrs tuples)."""
        sel = a[0] <= b[0]
        return tuple(
            jnp.minimum(a[0], b[0]) if i == 0 else jnp.where(sel, a[i], b[i])
            for i in range(len(a))
        )

    db = jnp.int32(degen_block)

    def body(carry):
        nptr, lptr = carry[0], carry[1]
        state = carry[2:]
        if anyhit:
            # rays already occluded contribute nothing (limit -1)
            limit = jnp.where(state[1] > 0, -1.0, tmax)
        else:
            limit = state[0]

        # --- (a) node pop (degenerate no-hit node when stack is dry):
        # slab-test its 8 children against the whole tile ---
        pnode = jnp.where(
            nptr > 0, stack[jnp.maximum(nptr - 1, 0)], degen_node
        )
        nptr = jnp.maximum(nptr - 1, 0)
        r8 = range(8)
        if nodebox.shape == (nodebox.shape[0],) or len(nodebox.shape) == 1:
            # flat SMEM node table (node*48 + lane): scalar reads with a
            # fully dynamic index (~3 ns each) replace the data-dependent
            # VMEM row load whose latency can't be prefetched
            nbase = pnode * 48
            nb = lambda lane: nodebox[nbase + lane]  # noqa: E731
        else:
            nrow = nodebox[pl.ds(pnode, 1), :]
            nb = lambda lane: nrow[0, lane]  # noqa: E731
        t0x = [(nb(c) - o[0]) * invx for c in r8]
        t1x = [(nb(24 + c) - o[0]) * invx for c in r8]
        t0y = [(nb(8 + c) - o[1]) * invy for c in r8]
        t1y = [(nb(32 + c) - o[1]) * invy for c in r8]
        t0z = [(nb(16 + c) - o[2]) * invz for c in r8]
        t1z = [(nb(40 + c) - o[2]) * invz for c in r8]
        tn = [
            jnp.maximum(
                jnp.maximum(
                    jnp.minimum(t0x[c], t1x[c]), jnp.minimum(t0y[c], t1y[c])
                ),
                jnp.maximum(jnp.minimum(t0z[c], t1z[c]), T_MIN),
            )
            for c in r8
        ]
        tf = [
            jnp.minimum(
                jnp.minimum(
                    jnp.maximum(t0x[c], t1x[c]), jnp.maximum(t0y[c], t1y[c])
                ),
                jnp.minimum(jnp.maximum(t0z[c], t1z[c]), limit),
            )
            for c in r8
        ]
        hmb = [(tn[c] <= tf[c]).astype(jnp.int32) << c for c in r8]
        while len(hmb) > 1:
            hmb = [hmb[j] | hmb[j + 1] for j in range(0, len(hmb), 2)]
        hm = hmb[0]
        # OR-reduce hm to ONE scalar via a roll tree (a single
        # vector→scalar readback per iteration; per-child jnp.any
        # readbacks measured 10-20% whole-kernel throughput)
        for shift in (64, 32, 16, 8, 4, 2, 1):
            hm = hm | pltpu.roll(hm, shift, 1)
        sub = 1
        while sub < shape[0]:
            hm = hm | pltpu.roll(hm, sub, 0)
            sub *= 2
        hitmask = hm[0, 0]

        # --- (b) drain DRAIN leaf blocks discovered by EARLIER pops
        # (degenerate all-miss rows substitute when lstack is dry) ---
        blk_res = []
        if stream is not None:
            scratch_t, sems = stream
            bases, copies = [], []
            for j in range(DRAIN):
                idx = lptr - 1 - j
                base = jnp.where(idx >= 0, lstack[jnp.maximum(idx, 0)], db)
                bases.append(base)
                cp = pltpu.make_async_copy(
                    tri.at[pl.ds(base, 1), :],
                    scratch_t.at[pl.ds(j, 1), :],
                    sems.at[j],
                )
                cp.start()
                copies.append(cp)
            for j in range(DRAIN):
                copies[j].wait()
                lrow = scratch_t[pl.ds(j, 1), :]
                blk_res.append(
                    mt_block(lambda lane, r=lrow: r[0, lane], bases[j], limit)
                )
        else:
            for j in range(DRAIN):
                idx = lptr - 1 - j
                base = jnp.where(idx >= 0, lstack[jnp.maximum(idx, 0)], db)
                lrow = tri[pl.ds(base, 1), :]
                blk_res.append(
                    mt_block(lambda lane, r=lrow: r[0, lane], base, limit)
                )
        lptr = jnp.maximum(lptr - DRAIN, 0)

        # --- pushes: branchless store + conditional advance ---
        pc = meta[pnode * 16 + 8 + oct_]
        for k in range(8):
            ch = (pc >> (3 * k)) & 7
            w = meta[pnode * 16 + ch]
            code = w & 63
            payload = lax.shift_right_logical(w, 6)
            hit_k = ((hitmask >> ch) & 1) > 0
            pn = (hit_k & (code == CODE_INTERNAL)).astype(jnp.int32)
            stack[nptr] = payload
            nptr = nptr + pn
            plf = (hit_k & (code == CODE_LEAF)).astype(jnp.int32)
            for b in range(LEAF_SIZE // _TRI_SUB):
                lstack[lptr] = payload + b
                lptr = lptr + plf

        # --- merge the drained blocks into the carried state ---
        if anyhit:
            t_b, occ = state
            hit_any = blk_res[0]
            for r in blk_res[1:]:
                hit_any = hit_any | r
            state = (t_b, occ | hit_any)
        else:
            while len(blk_res) > 1:
                blk_res = [
                    merge_two(blk_res[j], blk_res[j + 1])
                    for j in range(0, len(blk_res), 2)
                ]
            win = blk_res[0]
            better = win[0] < state[0]
            state = tuple(
                jnp.where(better, win[i], state[i])
                for i in range(len(state))
            )
        return (nptr, lptr) + state

    def cond(carry):
        keep = (carry[0] > 0) | (carry[1] > 0)
        if anyhit:
            # whole-tile early exit once every ray has found an occluder
            # (min-roll-tree + one extract, not jnp.all — same readback
            # economics as the hitmask OR tree above)
            mn = carry[3]
            for shift in (64, 32, 16, 8, 4, 2, 1):
                mn = jnp.minimum(mn, pltpu.roll(mn, shift, 1))
            sub = 1
            while sub < mn.shape[0]:
                mn = jnp.minimum(mn, pltpu.roll(mn, sub, 0))
                sub *= 2
            keep = keep & (mn[0, 0] == 0)
        return keep

    def body_n(carry):
        # UNROLL pop-and-drain steps per while_loop cond check: the cond
        # runs on the scalar core between iterations and acts as a
        # vector/scalar sync barrier; unrolling amortizes it. Dry stacks
        # substitute degenerate rows, so over-running is correct (and
        # costs at most UNROLL-1 no-op steps at drain-out).
        for _ in range(UNROLL):
            carry = body(carry)
        return carry

    stack[0] = 0  # root
    out = lax.while_loop(
        cond, body_n, (jnp.int32(1), jnp.int32(0)) + state0
    )
    s0 = 2
    if anyhit:
        return out[s0 + 1]
    if attrs:
        t_b, u_b, v_b, m_b = out[s0], out[s0 + 1], out[s0 + 2], out[s0 + 3]
        p0 = (out[s0 + 4], out[s0 + 5], out[s0 + 6])
        e0 = (out[s0 + 7], out[s0 + 8], out[s0 + 9])
        e1 = (out[s0 + 10], out[s0 + 11], out[s0 + 12])
        return t_b, u_b, v_b, m_b, p0, e0, e1
    return out[s0], out[s0 + 1]


def _traverse_kernel(
    anyhit: bool,
    streaming: bool,  # tri table in HBM (ANY) + per-leaf DMA drain
    meta,  # SMEM ((M+1)*16,) i32 (degen row appended)
    ox, oy, oz, dx, dy, dz, tmax,  # VMEM ray planes (BLOCK_ROWS, 128)
    nodebox, tri,  # node table (SMEM flat | VMEM rows), tri (VMEM | ANY)
    out_t, out_i,  # VMEM outputs (BLOCK_ROWS, LANES)
    stack, lstack,  # scratch
    *dma_scratch,  # streaming only: (tri_scratch VMEM, DMA sems)
):
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    stream = tuple(dma_scratch) if streaming else None
    if anyhit:
        occ = tile_traverse(
            "any", o, d, meta, nodebox, tri, stack, lstack, tmax=tmax[...],
            stream=stream,
        )
        out_t[...] = jnp.full(o[0].shape, BIG_T, jnp.float32)
        out_i[...] = occ
    else:
        t_best, i_best = tile_traverse(
            "closest", o, d, meta, nodebox, tri, stack, lstack,
            stream=stream,
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
    nodebox, nodemeta, tri_rows = degen_tables(nodebox, nodemeta, tri_rows)
    if NODES_SMEM and nodebox.shape[0] * 192 <= 200 * 1024:
        nodebox = nodebox[:, :48].reshape(-1)
        node_spec = smem
    else:
        node_spec = full
    # HBM-streaming tier: above the VMEM budget the triangle table stays
    # in HBM and leaf rows are DMA'd per drain (tile_traverse stream=)
    streaming = tri_rows.nbytes > TRI_VMEM_LIMIT
    tri_spec = (
        pl.BlockSpec(memory_space=pltpu.ANY) if streaming else full
    )
    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.SMEM((LEAF_STACK_DEPTH,), jnp.int32),
    ]
    if streaming:
        scratch += [
            pltpu.VMEM((DRAIN, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((DRAIN,)),
        ]
    return pl.pallas_call(
        functools.partial(_traverse_kernel, anyhit, streaming),
        grid=(grid,),
        in_specs=[smem] + [ray_spec] * 7 + [node_spec, tri_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
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
