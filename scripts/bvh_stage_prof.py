"""Where does the mesh-Cornell render time go? Depth sweep + pass timing."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_sample_batch,
    _closest,
    _any,
)
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers


def t_it(f, *a, iters=10):
    r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    w = h = 256
    scene = cornell_box_mesh(w, h, subdiv=64)
    cfg = MegakernelConfig(
        max_depth=5, remat=False,
        features=mat_features_from_table(scene.materials),
    )
    n = w * h
    p_film = pixel_centers(w, h)
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)

    # closest on coherent camera rays
    f1 = jax.jit(lambda o, d: _closest(scene, cfg, o, d))
    print(f"closest coherent : {t_it(f1, o, d)*1e3:7.2f} ms")

    # closest on incoherent rays (shuffled dirs)
    key = jax.random.PRNGKey(0)
    o2 = jax.random.uniform(key, (n, 3), jnp.float32, -0.9, 0.9)
    d2 = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    print(f"closest incoherent: {t_it(f1, o2, d2)*1e3:7.2f} ms")

    # anyhit
    f2 = jax.jit(lambda o, d: _any(scene, cfg, o, d, 1.0))
    print(f"any incoherent   : {t_it(f2, o2, d2)*1e3:7.2f} ms")

    # depth sweep of the full sample batch
    prev = 0.0
    for depth in (1, 2, 3, 5):
        cfg_d = MegakernelConfig(
            max_depth=depth, remat=False,
            features=mat_features_from_table(scene.materials),
        )
        fd = jax.jit(
            lambda s: render_sample_batch(scene, cfg_d, w, h, s)
        )
        dt = t_it(fd, jnp.uint32(0), iters=3)
        print(f"depth {depth}: {dt*1e3:7.2f} ms/sample-batch (+{(dt-prev)*1e3:6.2f})")
        prev = dt


if __name__ == "__main__":
    main()
