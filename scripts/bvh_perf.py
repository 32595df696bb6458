"""Measure packet-BVH traversal + full mesh-Cornell render on the TPU.

Usage: python scripts/bvh_perf.py [subdiv]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render_progressive,
    )
    from cuda_optix_pathtracing_tpu.ops.bvh_pallas import (
        bvh_closest_raw,
        tri_rows_pack,
    )
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
    from cuda_optix_pathtracing_tpu.ops.film import film_new

    width = height = 256
    t0 = time.perf_counter()
    scene = cornell_box_mesh(width, height, subdiv=subdiv)
    print(f"scene: {scene.tri_v0.shape[0]} padded tris, "
          f"{scene.bvh.num_nodes} nodes, build {time.perf_counter()-t0:.2f}s")

    # --- raw closest-hit kernel: camera-coherent rays ---
    from cuda_optix_pathtracing_tpu.ops.camera import (
        generate_rays,
        pixel_centers,
    )

    n = width * height
    p_film = pixel_centers(width, height)
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
    tri_rows = tri_rows_pack(scene.tri_v0, scene.tri_e0, scene.tri_e1)

    f = jax.jit(lambda o, d: bvh_closest_raw(
        o, d, scene.bvh.box, scene.bvh.meta, tri_rows))
    t0 = time.perf_counter()
    t, i = f(o, d)
    t.block_until_ready()
    print(f"kernel compile+run: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        t, i = f(o, d)
    t.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"closest (camera rays): {n/dt/1e6:.1f} Mrays/s  ({dt*1e3:.2f} ms)")
    hits = float(jnp.mean((t < 1e30).astype(jnp.float32)))
    print(f"hit fraction: {hits:.3f}")

    # --- full depth-5 render ---
    cfg = MegakernelConfig(
        max_depth=5, remat=False,
        features=mat_features_from_table(scene.materials),
    )
    kspp = 4
    film = film_new(height, width)
    t0 = time.perf_counter()
    film = render_progressive(scene, film, cfg, width, height,
                              jnp.uint32(0), kspp, 1)
    film.mean.block_until_ready()
    print(f"render compile+run: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    iters = 3
    for k in range(iters):
        film = render_progressive(scene, film, cfg, width, height,
                                  jnp.uint32((k + 1) * kspp), kspp, 1)
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    mpaths = width * height * kspp * iters / dt / 1e6
    print(f"mesh-cornell depth-5 render: {mpaths:.2f} Mpaths/s")


if __name__ == "__main__":
    main()
