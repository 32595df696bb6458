"""Pool wavefront (path regeneration) vs dense megakernel on mesh
Cornell + plain Cornell — the VERDICT r4 next-9 'benchmark it or retire
it' measurement."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig, render)
from cuda_optix_pathtracing_tpu.models.wavefront import (
    WavefrontConfig, render_pool_wavefront)
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.scene import cornell_box
from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh

w = h = 256
SPP = 16
for name, scene in (("cornell", cornell_box(w, h)),
                    ("mesh-cornell", cornell_box_mesh(w, h, subdiv=64))):
    wcfg = WavefrontConfig(max_depth=5,
                           features=mat_features_from_table(scene.materials))
    t0 = time.perf_counter()
    film = render_pool_wavefront(scene, w, h, SPP, cfg=wcfg)
    film.mean.block_until_ready()
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    film = render_pool_wavefront(scene, w, h, SPP, cfg=wcfg)
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    m = np.asarray(film.mean)
    assert np.isfinite(m).all()
    print(f"{name} pool wavefront: {w*h*SPP/dt/1e6:.2f} Mpaths/s "
          f"(mean={m.mean():.4f}, warm {warm:.0f}s)")

    mcfg = MegakernelConfig(max_depth=5, remat=False,
                            features=mat_features_from_table(scene.materials))
    film = render(scene, w, h, SPP, cfg=mcfg, kspp=SPP,
                  spp_per_pass=16 if name == "mesh-cornell" else 1)
    film.mean.block_until_ready()
    t0 = time.perf_counter()
    film = render(scene, w, h, SPP, cfg=mcfg, kspp=SPP,
                  spp_per_pass=16 if name == "mesh-cornell" else 1)
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    m2 = np.asarray(film.mean)
    print(f"{name} megakernel    : {w*h*SPP/dt/1e6:.2f} Mpaths/s "
          f"(mean={m2.mean():.4f})")
