"""8-wide BVH: host-side binned-SAH build + flattened array layout.

Capability parity with the reference's BVH subsystem
(src/core/public/core-bvh-builder.h:15-117, core-bvh-builder.cpp:49-1008):
binned SAH build collapsed to branching factor 8, ≤8 triangles per leaf,
flattened into dense arrays. The *traversal* is TPU-re-imagined: instead
of a per-ray scalar stack with AVX 8-wide slab tests (traverseRay,
core-bvh-builder.cpp:770-1008), a whole **ray tile shares one scalar
stack** and the slab/triangle tests are vector ops over the tile
(ops/bvh_pallas.py) — packet traversal, the natural fit for a (8,128)
vector unit. Coherent (camera / sorted) ray batches descend only the
nodes their frustum touches; fully incoherent batches degrade toward the
brute-force sweep, which is exactly the reference's own wavefront
fallback behaviour.

Build is host-side numpy (happens once per scene, like the reference's
CPU build); arrays then live in HBM/VMEM as jit constants.

Layout (node-major):
- ``child_lo/child_hi``  (M, 8, 3) f32   child AABBs (empty → +inf/-inf)
- ``child_node``         (M, 8)    i32   internal: child node index
- ``child_leaf_start``   (M, 8)    i32   leaf: first tri in reordered array
- ``child_leaf_count``   (M, 8)    i32   0 = internal, >0 = leaf, -1 = empty
- ``tri_order``          (T,)      i32   reordered-tri → original-tri index
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 16  # tris per leaf; kernel intersects whole 8-tri blocks, so
# leaf size trades MT padding waste (avg leaf fill is ~60-70%) against
# node-pop count. Sweep on a v5e (scripts/bvh_sweep.py, mesh Cornell):
# camera-coherent 15.7 (leaf 8) / 24.1 (leaf 16) Mrays/s; sorted bounce
# 3.9 / 7.0 — leaf 16 wins both.
N_BINS = 16
BRANCHING = 8


class BVHArrays(NamedTuple):
    child_lo: jnp.ndarray  # (M, 8, 3)
    child_hi: jnp.ndarray  # (M, 8, 3)
    child_node: jnp.ndarray  # (M, 8) i32
    child_leaf_start: jnp.ndarray  # (M, 8) i32
    child_leaf_count: jnp.ndarray  # (M, 8) i32
    tri_order: jnp.ndarray  # (T,) i32

    @property
    def num_nodes(self):
        return self.child_lo.shape[0]


class _BinNode:
    __slots__ = ("lo", "hi", "left", "right", "start", "count")

    def __init__(self, lo, hi, left=None, right=None, start=-1, count=0):
        self.lo, self.hi = lo, hi
        self.left, self.right = left, right
        self.start, self.count = start, count

    @property
    def is_leaf(self):
        return self.left is None


def _build_binary(lo_all, hi_all, cent, order, start, end, out_order):
    """Recursive binned-SAH binary build over tri index range [start,end)
    of ``order``; writes the final permutation into ``out_order``."""
    lo = lo_all[order[start:end]].min(axis=0)
    hi = hi_all[order[start:end]].max(axis=0)
    count = end - start
    if count <= LEAF_SIZE:
        out_order[start:end] = order[start:end]
        return _BinNode(lo, hi, start=start, count=count)

    c = cent[order[start:end]]
    clo, chi = c.min(axis=0), c.max(axis=0)
    axis = int(np.argmax(chi - clo))
    extent = chi[axis] - clo[axis]
    if extent < 1e-12:
        # degenerate spread: median split
        mid = start + count // 2
    else:
        # binned SAH (reference evaluateSAH, core-bvh-builder.cpp:14-47)
        rel = np.clip(
            ((c[:, axis] - clo[axis]) / extent * N_BINS).astype(np.int32),
            0,
            N_BINS - 1,
        )
        best_cost, best_bin = np.inf, -1
        for b in range(1, N_BINS):
            lmask = rel < b
            nl = int(lmask.sum())
            nr = count - nl
            if nl == 0 or nr == 0:
                continue
            li = order[start:end][lmask]
            ri = order[start:end][~lmask]
            llo, lhi = lo_all[li].min(axis=0), hi_all[li].max(axis=0)
            rlo, rhi = lo_all[ri].min(axis=0), hi_all[ri].max(axis=0)

            def area(a, b_):
                d = np.maximum(b_ - a, 0.0)
                return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

            cost = area(llo, lhi) * nl + area(rlo, rhi) * nr
            if cost < best_cost:
                best_cost, best_bin = cost, b
        if best_bin < 0:
            mid = start + count // 2
        else:
            lmask = rel < best_bin
            left_ids = order[start:end][lmask]
            right_ids = order[start:end][~lmask]
            order[start : start + len(left_ids)] = left_ids
            order[start + len(left_ids) : end] = right_ids
            mid = start + len(left_ids)
            if mid == start or mid == end:
                mid = start + count // 2

    left = _build_binary(lo_all, hi_all, cent, order, start, mid, out_order)
    right = _build_binary(lo_all, hi_all, cent, order, mid, end, out_order)
    return _BinNode(lo, hi, left=left, right=right)


def _collapse8(node):
    """Greedy collapse of a binary node into ≤8 children: repeatedly split
    the child with the largest surface area (reference buildBVHWive's
    8-wide cluster idea, core-bvh-builder.cpp:579-739)."""
    kids = [node.left, node.right]

    def area(n):
        d = np.maximum(n.hi - n.lo, 0.0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    while len(kids) < BRANCHING:
        best, besta = -1, -1.0
        for i, k in enumerate(kids):
            if not k.is_leaf and area(k) > besta:
                best, besta = i, area(k)
        if best < 0:
            break
        k = kids.pop(best)
        kids.extend([k.left, k.right])
    return kids


def build_bvh(v0, e0, e1) -> BVHArrays:
    """Host build: (T,3) triangle SoA (numpy or jnp) → BVHArrays.

    Production path is the native C++ builder (native/src/native.cpp,
    bit-identical output, ~1000× faster); this numpy implementation is
    the fallback + the readable specification.
    """
    from ..native import bvh_build_native

    nat = bvh_build_native(
        np.asarray(v0, np.float32), np.asarray(e0, np.float32),
        np.asarray(e1, np.float32), LEAF_SIZE, N_BINS,
    )
    if nat is not None:
        # keep numpy: the consumer is host-side pack_bvh, and np.asarray
        # on a (tunneled) device array costs a full D2H transfer
        lo, hi, cn, ls, lc, order = nat
        return BVHArrays(lo, hi, cn, ls, lc, order)
    v0 = np.asarray(v0, np.float32)
    p1 = v0 + np.asarray(e0, np.float32)
    p2 = v0 + np.asarray(e1, np.float32)
    t = v0.shape[0]
    lo_all = np.minimum(np.minimum(v0, p1), p2)
    hi_all = np.maximum(np.maximum(v0, p1), p2)
    cent = (lo_all + hi_all) * 0.5

    order = np.arange(t, dtype=np.int64)
    out_order = np.empty(t, dtype=np.int64)
    root = _build_binary(lo_all, hi_all, cent, order, 0, t, out_order)

    nodes = []  # rows of (lo(8,3), hi(8,3), node(8), lstart(8), lcount(8))

    def emit(n) -> int:
        """DFS-emit internal node ``n`` (must not be a leaf), return row."""
        kids = _collapse8(n) if not n.is_leaf else [n]
        row = len(nodes)
        lo = np.full((BRANCHING, 3), np.inf, np.float32)
        hi = np.full((BRANCHING, 3), -np.inf, np.float32)
        cn = np.zeros(BRANCHING, np.int32)
        ls = np.zeros(BRANCHING, np.int32)
        lc = np.full(BRANCHING, -1, np.int32)
        nodes.append([lo, hi, cn, ls, lc])
        for i, k in enumerate(kids):
            lo[i], hi[i] = k.lo, k.hi
            if k.is_leaf:
                ls[i], lc[i] = k.start, k.count
            else:
                lc[i] = 0
                cn[i] = emit(k)
        return row

    if root.is_leaf:
        # single-leaf scene: one node whose child 0 is the leaf
        lo = np.full((BRANCHING, 3), np.inf, np.float32)
        hi = np.full((BRANCHING, 3), -np.inf, np.float32)
        lo[0], hi[0] = root.lo, root.hi
        cn = np.zeros(BRANCHING, np.int32)
        ls = np.zeros(BRANCHING, np.int32)
        lc = np.full(BRANCHING, -1, np.int32)
        ls[0], lc[0] = root.start, root.count
        nodes.append([lo, hi, cn, ls, lc])
    else:
        emit(root)

    m = len(nodes)
    child_lo = np.stack([n[0] for n in nodes])
    child_hi = np.stack([n[1] for n in nodes])
    child_node = np.stack([n[2] for n in nodes])
    child_leaf_start = np.stack([n[3] for n in nodes])
    child_leaf_count = np.stack([n[4] for n in nodes])
    return BVHArrays(
        child_lo,
        child_hi,
        child_node,
        child_leaf_start,
        child_leaf_count,
        out_order.astype(np.int32),
    )


class PackedBVH(NamedTuple):
    """Device-ready BVH: 8-padded leaf-major triangle order + dense
    node tables (see ops/bvh_pallas.py module docstring for the kernel
    -side rationale and measured Mosaic layout rules).

    Every leaf owns exactly LEAF_SIZE consecutive rows of the
    (re-ordered, degenerate-padded) triangle arrays, so the traversal
    kernel intersects fixed blocks with no count masking (pads have zero
    edges → det 0 → rejected by the MT tolerance test).

    - ``box`` (M, 128) f32: per node, the 8 child slabs comp-major
      ``[lox×8|loy×8|loz×8|hix×8|hiy×8|hiz×8]`` (48 lanes used; empty
      children zeroed — they are excluded by their slotword, not their
      slab). 512 B/node in VMEM.
    - ``meta`` (M·16,) i32 for SMEM: per node, 8 slotwords
      ``(payload << 6) | code`` (code 0 empty / 1 internal / 2 leaf;
      payload = child node row or triangle-block row) followed by 8
      per-octant permcodes: 8×3-bit far-to-near child visit order for
      rays of that direction octant — the de-replicated form of the
      reference's 8 precomputed traversal orders per cluster
      (buildPermutationsBoxproj, core-bvh-builder.cpp:500-546). The
      kernel pushes children in permcode order so pops are near-first
      and per-ray ``t_best`` prunes far subtrees. 64 B/node.
    - ``perm`` (Tp,) i32: padded packed row → original tri (-1 = pad).
    """

    box: jnp.ndarray  # (M, 128) f32
    meta: jnp.ndarray  # (M*16,) i32
    perm: np.ndarray  # (Tp,) i32 HOST array: padded row → original tri
    # (-1 = pad). Kept numpy on purpose — it is only ever consumed by
    # host-side permutes (permute_tri_array), and np.asarray on a
    # (tunneled) device array costs a blocking D2H round-trip.

    @property
    def num_nodes(self):
        return self.box.shape[0]


CODE_EMPTY = 0
CODE_INTERNAL = 1
CODE_LEAF = 2


def _permcodes(lo, hi, valid):
    """(M, 8) u32 per-octant permcodes: child visit order far-to-near
    along each octant direction, packed 3 bits per slot."""
    cent = np.where(valid[..., None], (lo + hi) * 0.5, 0.0)  # (M, 8, 3)
    m = lo.shape[0]
    codes = np.zeros((m, 8), np.int64)
    for oct_ in range(8):
        sign = np.asarray(
            [
                -1.0 if (oct_ >> 0) & 1 else 1.0,
                -1.0 if (oct_ >> 1) & 1 else 1.0,
                -1.0 if (oct_ >> 2) & 1 else 1.0,
            ],
            np.float32,
        )
        key = cent @ sign  # (M, 8) centroid distance along the octant dir
        order = np.argsort(-key, axis=1, kind="stable")  # far-to-near
        code = np.zeros(m, np.int64)
        for k in range(8):
            code |= order[:, k] << (3 * k)
        codes[:, oct_] = code
    return codes.astype(np.int32)


def pack_bvh(bvh: BVHArrays) -> PackedBVH:
    """Re-base leaves onto LEAF_SIZE-padded blocks and pack the dense
    node tables (box rows + slotword/permcode meta)."""
    ls = np.asarray(bvh.child_leaf_start)
    lc = np.asarray(bvh.child_leaf_count)
    cn = np.asarray(bvh.child_node)
    order = np.asarray(bvh.tri_order)
    lo = np.nan_to_num(
        np.asarray(bvh.child_lo), nan=0.0, posinf=0.0, neginf=0.0
    )
    hi = np.nan_to_num(
        np.asarray(bvh.child_hi), nan=0.0, posinf=0.0, neginf=0.0
    )

    leaf_pos = np.argwhere(lc > 0)  # (L, 2) rows of (node, child)
    perm = np.full(len(leaf_pos) * LEAF_SIZE, -1, np.int32)
    new_start = np.zeros_like(ls)
    ni, ci = leaf_pos[:, 0], leaf_pos[:, 1]
    cnt = lc[ni, ci].astype(np.int64)
    base = np.arange(len(leaf_pos), dtype=np.int64) * LEAF_SIZE
    new_start[ni, ci] = base.astype(np.int32)
    # ragged scatter, vectorized: element j of leaf li goes to base[li]+j
    within = np.arange(cnt.sum(), dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt
    )
    perm[np.repeat(base, cnt) + within] = order[
        np.repeat(ls[ni, ci].astype(np.int64), cnt) + within
    ]

    m = lo.shape[0]
    valid = lc >= 0
    # box rows: comp-major child slabs (empty children zeroed)
    box = np.zeros((m, 128), np.float32)
    for k in range(3):
        box[:, 8 * k : 8 * (k + 1)] = np.where(valid, lo[:, :, k], 0.0)
        box[:, 24 + 8 * k : 24 + 8 * (k + 1)] = np.where(
            valid, hi[:, :, k], 0.0
        )

    # slotwords: (payload << 6) | code
    is_leaf = lc > 0
    block_base = new_start // 8  # triangle *block* row (LEAF_SIZE | 8)
    payload = np.where(is_leaf, block_base, cn).astype(np.int64)
    code = np.where(
        ~valid, CODE_EMPTY, np.where(is_leaf, CODE_LEAF, CODE_INTERNAL)
    ).astype(np.int64)
    slotwords = ((payload << 6) | code).astype(np.int32)  # (M, 8)

    meta = np.zeros((m, 16), np.int32)
    meta[:, 0:8] = slotwords
    meta[:, 8:16] = _permcodes(lo, hi, valid)
    return PackedBVH(jnp.asarray(box), jnp.asarray(meta.reshape(-1)), perm)


def permute_tri_array(arr, perm, pad_value=0):
    """Host-side reorder of a per-triangle array into packed-BVH order.

    ``arr`` (T, ...) numpy/jnp → (Tp, ...) with pad rows = pad_value.
    """
    arr = np.asarray(arr)
    perm = np.asarray(perm)
    out = np.full((perm.shape[0],) + arr.shape[1:], pad_value, arr.dtype)
    valid = perm >= 0
    out[valid] = arr[perm[valid]]
    return jnp.asarray(out)


def bvh_stats(bvh: BVHArrays) -> dict:
    lc = np.asarray(bvh.child_leaf_count)
    return dict(
        nodes=int(bvh.num_nodes),
        leaves=int((lc > 0).sum()),
        max_leaf=int(lc.max(initial=0)),
        tris=int(bvh.tri_order.shape[0]),
    )


# ---------------------------------------------------------------------------
# Reference traversal (numpy, scalar) — test oracle only
# ---------------------------------------------------------------------------


def traverse_ref(bvh: BVHArrays, v0, e0, e1, o, d, t_min=1e-4):
    """Scalar stack traversal per ray (numpy). Returns (t, tri) with
    tri = -1 on miss. For tests; O(rays · nodes) python loop."""
    child_lo = np.asarray(bvh.child_lo)
    child_hi = np.asarray(bvh.child_hi)
    child_node = np.asarray(bvh.child_node)
    ls = np.asarray(bvh.child_leaf_start)
    lc = np.asarray(bvh.child_leaf_count)
    order = np.asarray(bvh.tri_order)
    v0 = np.asarray(v0)
    e0 = np.asarray(e0)
    e1 = np.asarray(e1)
    o = np.asarray(o)
    d = np.asarray(d)

    n = o.shape[0]
    t_best = np.full(n, np.inf, np.float32)
    i_best = np.full(n, -1, np.int32)
    for r in range(n):
        inv = 1.0 / np.where(np.abs(d[r]) < 1e-12, np.copysign(1e-12, d[r]), d[r])
        stack = [0]
        while stack:
            node = stack.pop()
            t0 = (child_lo[node] - o[r]) * inv
            t1 = (child_hi[node] - o[r]) * inv
            tn = np.minimum(t0, t1).max(axis=1)
            tf = np.maximum(t0, t1).min(axis=1)
            hit = (tn <= tf) & (tf >= t_min) & (tn <= t_best[r])
            for c in range(BRANCHING):
                if not hit[c] or lc[node, c] < 0:
                    continue
                if lc[node, c] == 0:
                    stack.append(child_node[node, c])
                    continue
                for k in range(ls[node, c], ls[node, c] + lc[node, c]):
                    tri = order[k]
                    h = _mt_one(o[r], d[r], v0[tri], e0[tri], e1[tri], t_min)
                    if h is not None and h < t_best[r]:
                        t_best[r] = h
                        i_best[r] = tri
    return t_best, i_best


def _mt_one(o, d, a0, ea, eb, t_min):
    p = np.cross(d, eb)
    det = float(p @ ea)
    if abs(det) < 1e-7:
        return None
    inv_det = 1.0 / det
    tv = o - a0
    u = inv_det * float(p @ tv)
    q = np.cross(tv, ea)
    v = inv_det * float(q @ d)
    t = inv_det * float(q @ eb)
    if u < -1e-7 or v < -1e-7 or u + v > 1.0 + 1e-7 or t <= t_min:
        return None
    return t
