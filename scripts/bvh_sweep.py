"""Sweep LEAF_SIZE x BLOCK_ROWS for the packet-BVH kernel on the TPU.

Monkeypatches the module constants before building, runs raw closest on
(a) coherent camera rays, (b) octant/Morton-sorted surface-bounce rays.

Usage: python scripts/bvh_sweep.py LEAF BLOCK_ROWS
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LEAF = int(sys.argv[1])
ROWS = int(sys.argv[2])
DRAIN = int(sys.argv[3]) if len(sys.argv) > 3 else 4
UNROLL = int(sys.argv[4]) if len(sys.argv) > 4 else 1

import cuda_optix_pathtracing_tpu.ops.bvh as B
import cuda_optix_pathtracing_tpu.ops.bvh_pallas as BP

B.LEAF_SIZE = LEAF
BP.LEAF_SIZE = LEAF
BP.BLOCK_ROWS = ROWS
BP.DRAIN = DRAIN
BP.UNROLL = UNROLL

from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
from cuda_optix_pathtracing_tpu.ops.raysort import (
    ray_sort_key, scene_bounds, sorted_apply,
)


def timeit(f, *a, iters=20):
    r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters, r


def main():
    w = h = 256
    scene = cornell_box_mesh(w, h, subdiv=64)
    n = w * h
    p_film = pixel_centers(w, h)
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
    tri_rows = BP.tri_rows_pack(scene.tri_v0, scene.tri_e0, scene.tri_e1)
    print(f"LEAF={LEAF} ROWS={ROWS} DRAIN={DRAIN} UNROLL={UNROLL}: {scene.tri_v0.shape[0]} rows, "
          f"{scene.bvh.num_nodes} nodes, tri_vmem={tri_rows.nbytes/1e6:.2f}MB")

    f = jax.jit(lambda o, d: BP.bvh_closest_raw(
        o, d, scene.bvh.box, scene.bvh.meta, tri_rows))
    dt, (t, i) = timeit(f, o, d)
    print(f"  camera coherent : {n/dt/1e6:6.1f} Mrays/s")

    REPS = 16
    o16 = jnp.tile(o, (REPS, 1))
    d16 = jnp.tile(d, (REPS, 1))
    dt16, _ = timeit(f, o16, d16, iters=5)
    print(f"  camera x{REPS}     : {n*REPS/dt16/1e6:6.1f} Mrays/s")

    # bounce-like: origins at first-hit points, random cosine dirs, sorted
    key = jax.random.PRNGKey(0)
    hitp = o + d * jnp.where(t[:, None] < 1e30, t[:, None], 1.0) * 0.999
    d2 = jax.random.normal(key, (n, 3), jnp.float32)
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    blo, bhi = scene_bounds(scene.tri_v0, scene.tri_e0, scene.tri_e1)

    def sorted_closest(o_, d_):
        k = ray_sort_key(o_, d_, blo, bhi)
        return sorted_apply(
            o_, d_, k,
            lambda so, sd: BP.bvh_closest_raw(
                so, sd, scene.bvh.box, scene.bvh.meta, tri_rows), 2)

    f2 = jax.jit(sorted_closest)
    dt2, _ = timeit(f2, hitp, d2)
    print(f"  bounce sorted   : {n/dt2/1e6:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
