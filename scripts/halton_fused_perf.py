"""Fused megakernel with in-kernel Owen-Halton (config 2) vs hash."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig, render_progressive, resolve_fused)
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.film import film_new
from cuda_optix_pathtracing_tpu.scene import cornell_box

w = h = 256
scene = cornell_box(w, h)
for sampler in ("hash", "halton"):
    cfg = resolve_fused(scene, MegakernelConfig(
        max_depth=5, remat=False, sampler=sampler,
        features=mat_features_from_table(scene.materials)))
    assert cfg.fused == "on", cfg.fused
    film = film_new(h, w)
    film = render_progressive(scene, film, cfg, w, h, jnp.uint32(0), 8, 1)
    film.mean.block_until_ready()
    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        film = render_progressive(
            scene, film, cfg, w, h, jnp.uint32((i + 1) * 8), 8, 1)
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    m = np.asarray(film.mean)
    assert np.isfinite(m).all()
    print(f"{sampler:6s}: {w*h*8*iters/dt/1e6:.2f} Mpaths/s  mean={m.mean():.4f}")
