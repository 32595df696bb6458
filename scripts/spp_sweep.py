"""Sweep spp_per_pass on the mesh-Cornell XLA wavefront: sorted-tile
coherence grows with the flattened batch (denser hit-point sampling ->
tighter tile frusta)."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig, render_progressive)
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.film import film_new

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 32
w = h = 256
scene = cornell_box_mesh(w, h, subdiv=64)
cfg = MegakernelConfig(max_depth=5, remat=False, fused="off",
                       features=mat_features_from_table(scene.materials))
film = film_new(h, w)
film = render_progressive(scene, film, cfg, w, h, jnp.uint32(0), spp, spp)
film.mean.block_until_ready()
t0 = time.perf_counter()
iters = 2
for i in range(iters):
    film = render_progressive(
        scene, film, cfg, w, h, jnp.uint32((i + 1) * spp), spp, spp)
film.mean.block_until_ready()
dt = time.perf_counter() - t0
print(f"spp_per_pass={spp}: {w*h*spp*iters/dt/1e6:.2f} Mpaths/s "
      f"({dt/iters*1e3:.0f} ms/pass)")
