"""Benchmark: Cornell-box path tracing throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CUDA megakernel renders 256²×2048spp in ≈15,546 ms
on a GTX 1070 (docs/dmt-mk_roofline_point.txt, BASELINE.md) →
≈ 8.63 M camera paths/s. We report camera paths/s on the same scene and
resolution with the depth-5 NEE integrator.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from cuda_optix_pathtracing_tpu.scene import cornell_box
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render_progressive,
        resolve_fused,
    )
    from cuda_optix_pathtracing_tpu.ops.film import film_new
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table

    width = height = 256
    kspp = 8
    scene = cornell_box(width, height)
    cfg = resolve_fused(scene, MegakernelConfig(
        max_depth=5, remat=False, features=mat_features_from_table(scene.materials)
    ))
    film = film_new(height, width)

    spp_per_pass = 1

    # warmup / compile
    film = render_progressive(
        scene, film, cfg, width, height, jnp.uint32(0), kspp, spp_per_pass
    )
    film.mean.block_until_ready()

    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        film = render_progressive(
            scene, film, cfg, width, height, jnp.uint32((i + 1) * kspp), kspp,
            spp_per_pass,
        )
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0

    paths = width * height * kspp * iters
    mpaths_s = paths / dt / 1e6
    baseline_mpaths_s = 8.63  # GTX 1070 reference megakernel
    print(
        json.dumps(
            {
                "metric": "cornell256_depth5_throughput",
                "value": round(mpaths_s, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(mpaths_s / baseline_mpaths_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
