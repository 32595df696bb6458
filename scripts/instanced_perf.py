"""Instanced vs baked mesh-Cornell throughput (VERDICT r4 next-4 bar:
instanced within 2x of non-instanced)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig, render_progressive)
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.film import film_new
from cuda_optix_pathtracing_tpu.scene.procedural import (
    cornell_box_mesh, cornell_box_mesh_instanced)

w = h = 256
SPP = 16
for name, scene in (
    ("baked    ", cornell_box_mesh(w, h, subdiv=64)),
    ("instanced", cornell_box_mesh_instanced(w, h, subdiv=64, use_bvh=True)),
):
    cfg = MegakernelConfig(max_depth=5, remat=False, fused="off",
                           features=mat_features_from_table(scene.materials))
    film = film_new(h, w)
    film = render_progressive(scene, film, cfg, w, h, jnp.uint32(0), SPP, SPP)
    film.mean.block_until_ready()
    t0 = time.perf_counter()
    iters = 2
    for i in range(iters):
        film = render_progressive(
            scene, film, cfg, w, h, jnp.uint32((i + 1) * SPP), SPP, SPP)
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    m = np.asarray(film.mean)
    assert np.isfinite(m).all()
    print(f"{name}: {w*h*SPP*iters/dt/1e6:.2f} Mpaths/s  "
          f"mean={m.mean():.4f}  tris={scene.tri_v0.shape[0]}")
