"""Fused-megakernel-with-BVH throughput on mesh Cornell (TPU)."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_progressive,
    resolve_fused,
)
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.film import film_new


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    w = h = 256
    kspp = 4
    scene = cornell_box_mesh(w, h, subdiv=subdiv)
    cfg = resolve_fused(
        scene,
        MegakernelConfig(
            max_depth=5, remat=False,
            features=mat_features_from_table(scene.materials),
        ),
    )
    print(f"subdiv={subdiv}: {scene.tri_v0.shape[0]} rows, fused={cfg.fused}")
    film = film_new(h, w)
    t0 = time.perf_counter()
    film = render_progressive(scene, film, cfg, w, h, jnp.uint32(0), kspp, 1)
    film.mean.block_until_ready()
    print(f"compile+run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    iters = 4
    for k in range(iters):
        film = render_progressive(
            scene, film, cfg, w, h, jnp.uint32((k + 1) * kspp), kspp, 1
        )
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"fused BVH mesh-cornell: {w*h*kspp*iters/dt/1e6:.2f} Mpaths/s")


if __name__ == "__main__":
    main()
