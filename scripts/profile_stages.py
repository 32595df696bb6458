"""Stage-level timing of the megakernel integrator on the local chip.

Times each component of a bounce in isolation (jitted separately) and the
full pipeline, to locate the bottleneck. Not a test; a perf tool.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.scene import cornell_box
from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_sample_batch,
    trace_paths,
)
from cuda_optix_pathtracing_tpu.ops import rng as R
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
from cuda_optix_pathtracing_tpu.ops.intersect_pallas import (
    intersect_any_pallas,
    intersect_closest_pallas,
)
from cuda_optix_pathtracing_tpu.ops.bsdf import eval_bsdf, sample_bsdf
from cuda_optix_pathtracing_tpu.ops.envmap import eval_envmap
from cuda_optix_pathtracing_tpu.ops.lights import eval_light, sample_light


def bench(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return out


def main():
    width = height = 256
    scene = cornell_box(width, height)
    n = width * height

    pix = pixel_centers(width, height)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)
    sampler = R.Sampler("hash", 0)
    jx, jy = sampler.sample_2d(px, py, jnp.uint32(0), R.Dim.CAMERA_U)
    p_film = pix + jnp.stack([jx, jy], axis=-1)
    o, d = jax.jit(generate_rays)(p_film, scene.cam_from_raster, scene.world_from_cam)
    o, d = jax.block_until_ready((o, d))

    print(f"N rays = {n}, tris = {scene.num_triangles}")

    hit = bench(
        "closest_pallas",
        lambda o, d: intersect_closest_pallas(
            o, d, scene.tri_v0, scene.tri_e0, scene.tri_e1
        ),
        o,
        d,
    )
    bench(
        "any_pallas",
        lambda o, d: intersect_any_pallas(
            o, d, scene.tri_v0, scene.tri_e0, scene.tri_e1, 100.0
        ),
        o,
        d,
    )

    wo = -d
    inside = jnp.zeros((n,), bool)

    def nee_math(hitpos, hitnormal, tri):
        ul = sampler.sample_1d(px, py, jnp.uint32(0), R.Dim.LIGHT_SELECT)
        light_idx = jnp.minimum(
            (ul * scene.num_lights).astype(jnp.int32), scene.num_lights - 1
        )
        lt = scene.lights.gather(light_idx)
        u1, u2 = sampler.sample_2d(px, py, jnp.uint32(0), R.Dim.LIGHT_U)
        ls = sample_light(lt, hitpos, u1, u2, jnp.zeros_like(inside), hitnormal)
        f_cos, bsdf_pdf = eval_bsdf(
            scene.materials.gather(scene.tri_mat[tri]),
            wo,
            ls.direction,
            hitnormal,
            hitnormal,
            inside,
        )
        return eval_light(lt, ls) * f_cos

    bench("nee math (no shadow ray)", nee_math, hit.pos, hit.normal, hit.tri)

    def bsdf_sample(hitnormal, tri):
        u1, u2 = sampler.sample_2d(px, py, jnp.uint32(0), R.Dim.BSDF_U)
        uc = sampler.sample_1d(px, py, jnp.uint32(0), R.Dim.BSDF_UC)
        mat = scene.materials.gather(scene.tri_mat[tri])
        bs = sample_bsdf(mat, wo, hitnormal, hitnormal, u1, u2, uc, inside)
        return bs.f_cos, bs.pdf, bs.wi

    bench("bsdf sample", bsdf_sample, hit.normal, hit.tri)

    bench("envmap eval", lambda d: eval_envmap(scene.env, d), d)

    def samples_only(px, py):
        acc = jnp.zeros((n,), jnp.float32)
        for dim in range(12):
            u1, u2 = sampler.sample_2d(px, py, jnp.uint32(0), dim)
            acc = acc + u1 + u2
        return acc

    bench("12x sample_2d (hash)", samples_only, px, py)

    cfg = MegakernelConfig(max_depth=5, remat=False)
    bench(
        "full trace depth5 (1 spp)",
        lambda o, d: trace_paths(scene, cfg, px, py, jnp.uint32(0), o, d),
        o,
        d,
        iters=5,
    )
    bench(
        "render_sample_batch (1 spp)",
        lambda s: render_sample_batch(scene, cfg, width, height, s),
        jnp.uint32(0),
        iters=5,
    )

    cfg1 = MegakernelConfig(max_depth=1, remat=False)
    bench(
        "full trace depth1 (1 spp)",
        lambda o, d: trace_paths(scene, cfg1, px, py, jnp.uint32(0), o, d),
        o,
        d,
        iters=5,
    )


if __name__ == "__main__":
    main()
