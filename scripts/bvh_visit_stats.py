"""Host-side simulation of packet traversal: count node pops and leaf
visits per tile for camera rays, to separate per-visit overhead from
vector work in the Pallas kernel timing."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
from cuda_optix_pathtracing_tpu.ops.bvh import LEAF_SIZE, CODE_EMPTY, CODE_INTERNAL, CODE_LEAF


def simulate(scene, o, d, rows_per_tile=8):
    box = np.asarray(scene.bvh.box)
    meta = np.asarray(scene.bvh.meta).reshape(-1, 16)
    sw = meta[:, :8]
    code = sw & 63
    payload = sw >> 6
    lo = np.stack([box[:, 0:8], box[:, 8:16], box[:, 16:24]], -1)  # (M,8,3)
    hi = np.stack([box[:, 24:32], box[:, 32:40], box[:, 40:48]], -1)

    o = np.asarray(o)
    d = np.asarray(d)
    n = o.shape[0]
    tile = rows_per_tile * 128
    pops_all, leaves_all = [], []
    for t0 in range(0, n, tile):
        ot = o[t0:t0 + tile]
        dt = d[t0:t0 + tile]
        inv = 1.0 / np.where(np.abs(dt) < 1e-12, 1e-12, dt)
        t_best = np.full(ot.shape[0], np.inf, np.float32)
        stack = [0]
        pops = leaves = 0
        while stack:
            node = stack.pop()
            if node < 0:
                leaves += 1
                # approximate leaf: shrink t_best by real MT? cheap proxy:
                # skip updating t_best (UNDER-counts pruning); count only
                continue
            pops += 1
            t0x = (lo[node][None, :, :] - ot[:, None, :]) * inv[:, None, :]
            t1x = (hi[node][None, :, :] - ot[:, None, :]) * inv[:, None, :]
            tn = np.minimum(t0x, t1x).max(-1)  # (rays, 8)
            tf = np.maximum(t0x, t1x).min(-1)
            hit = (tn <= np.minimum(tf, t_best[:, None])) & (tf >= 1e-4)
            childhit = hit.any(0)
            for c in range(8):
                if not childhit[c] or code[node, c] == CODE_EMPTY:
                    continue
                if code[node, c] == CODE_LEAF:
                    stack.append(-int(payload[node, c]) - 1)
                else:
                    stack.append(int(payload[node, c]))
        pops_all.append(pops)
        leaves_all.append(leaves)
    return np.asarray(pops_all), np.asarray(leaves_all)


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    w = h = 256
    scene = cornell_box_mesh(w, h, subdiv=subdiv)
    meta = np.asarray(scene.bvh.meta).reshape(-1, 16)
    n_leaf = int(((meta[:, :8] & 63) == CODE_LEAF).sum())
    print(f"rows={scene.tri_v0.shape[0]} nodes={meta.shape[0]} leaves={n_leaf} "
          f"blocks={scene.tri_v0.shape[0]//8}")
    p_film = pixel_centers(w, h)
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
    pops, leaves = simulate(scene, o, d)
    lb = LEAF_SIZE // 8
    print(f"camera tiles: pops avg {pops.mean():.0f} max {pops.max()}, "
          f"leaf visits avg {leaves.mean():.0f} max {leaves.max()} "
          f"({leaves.mean()*lb:.0f} blocks)")
    # expected vector-work-only time per tile: pops*47ns + blocks*61ns
    est = pops.mean() * 47e-9 + leaves.mean() * lb * 61e-9
    print(f"vector-work estimate/tile: {est*1e6:.1f} us -> "
          f"{0.0655 / (est * 64 / 1e-6 / 1e6):.0f}")
    print(f"total iterations/tile avg: {(pops+leaves).mean():.0f}")


if __name__ == "__main__":
    main()
