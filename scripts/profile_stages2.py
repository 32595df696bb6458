"""In-jit (scan-amplified) timing of integrator components — avoids the
~0.6 ms per-dispatch overhead of the tunneled device polluting readings.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.scene import cornell_box
from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig, trace_paths
from cuda_optix_pathtracing_tpu.ops import rng as R
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
from cuda_optix_pathtracing_tpu.ops.intersect_pallas import (
    intersect_any_pallas,
    intersect_closest_pallas,
)
from cuda_optix_pathtracing_tpu.ops.gather import onehot_gather
from cuda_optix_pathtracing_tpu.ops.bsdf import eval_bsdf, sample_bsdf
from cuda_optix_pathtracing_tpu.ops.envmap import eval_envmap
from cuda_optix_pathtracing_tpu.ops.lights import eval_light, sample_light
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table

K = 16


def bench(name, fn, *args, iters=10):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3/K:9.4f} ms/op")


def amplify(fn):
    """Scan fn K times with a perturbed input so XLA can't hoist it."""

    def run(o, d):
        def step(c, _):
            r = fn(o + c * 1e-12, d)
            return c + jnp.sum(r) * 1e-12, None

        return lax.scan(step, jnp.float32(0), None, length=K)[0]

    return run


width = height = 256
scene = cornell_box(width, height)
n = width * height
pix = pixel_centers(width, height)
px = pix[:, 0].astype(jnp.uint32)
py = pix[:, 1].astype(jnp.uint32)
sampler = R.Sampler("hash", 0)
jx, jy = sampler.sample_2d(px, py, jnp.uint32(0), R.Dim.CAMERA_U)
o, d = jax.jit(generate_rays)(
    pix + jnp.stack([jx, jy], axis=-1), scene.cam_from_raster, scene.world_from_cam
)
o, d = jax.block_until_ready((o, d))
hit = jax.jit(
    lambda o, d: intersect_closest_pallas(o, d, scene.tri_v0, scene.tri_e0, scene.tri_e1)
)(o, d)
hit = jax.block_until_ready(hit)
inside = jnp.zeros((n,), bool)
wo = -d

bench(
    "closest_pallas",
    amplify(lambda o, d: intersect_closest_pallas(o, d, scene.tri_v0, scene.tri_e0, scene.tri_e1).t),
    o,
    d,
)
bench(
    "any_pallas",
    amplify(lambda o, d: intersect_any_pallas(o, d, scene.tri_v0, scene.tri_e0, scene.tri_e1, 100.0).astype(jnp.float32)),
    o,
    d,
)
bench(
    "mat gather (tri->mat->table)",
    amplify(lambda o, d: scene.materials.gather(onehot_gather(scene.tri_mat, hit.tri)).albedo),
    o,
    d,
)

mat = jax.jit(lambda: scene.materials.gather(onehot_gather(scene.tri_mat, hit.tri)))()
mat = jax.block_until_ready(mat)

ftx = mat_features_from_table(scene.materials)
bench(
    "eval_bsdf",
    amplify(lambda o, d: eval_bsdf(mat, wo + o * 1e-12, d, hit.normal, hit.normal, inside, ft=ftx)[0]),
    o,
    d,
)
bench(
    "sample_bsdf",
    amplify(
        lambda o, d: sample_bsdf(
            mat, wo + o * 1e-12, hit.normal, hit.normal,
            o[:, 0] * 0 + 0.3, o[:, 1] * 0 + 0.7, o[:, 2] * 0 + 0.5, inside,
            ft=ftx,
        ).f_cos
    ),
    o,
    d,
)


def light_part(o, d):
    ul = sampler.sample_1d(px, py, jnp.uint32(0), R.Dim.LIGHT_SELECT)
    li = jnp.minimum((ul * scene.num_lights).astype(jnp.int32), scene.num_lights - 1)
    lt = scene.lights.gather(li)
    u1, u2 = sampler.sample_2d(px, py, jnp.uint32(0), R.Dim.LIGHT_U)
    ls = sample_light(lt, hit.pos + o * 1e-12, u1, u2, inside, hit.normal)
    return eval_light(lt, ls)


bench("light select+sample+eval", amplify(light_part), o, d)
bench("eval_envmap", amplify(lambda o, d: eval_envmap(scene.env, d + o * 1e-12)[0]), o, d)


def rng_bounce(o, d):
    acc = 0.0
    for dim in (R.Dim.LIGHT_SELECT, R.Dim.BSDF_UC, R.Dim.RR):
        acc = acc + sampler.sample_1d(px, py, jnp.uint32(0), int(dim))
    for dim in (R.Dim.LIGHT_U, R.Dim.BSDF_U):
        a, b = sampler.sample_2d(px, py, jnp.uint32(0), int(dim))
        acc = acc + a + b
    return acc + o[:, 0] * 1e-12


bench("rng per bounce (7 dims)", amplify(rng_bounce), o, d)

cfg = MegakernelConfig(max_depth=5, remat=False, features=mat_features_from_table(scene.materials))
bench(
    "full trace depth5",
    amplify(lambda o, d: trace_paths(scene, cfg, px, py, jnp.uint32(0), o, d)),
    o,
    d,
    iters=3,
)
