"""Why does the bench's depth-0 closest call cost 2.8x the standalone
kernel at the same batch size? Isolate: jitter, sort wrapper, scan."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cuda_optix_pathtracing_tpu.ops.bvh_pallas as BP
from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
from cuda_optix_pathtracing_tpu.ops.raysort import (
    ray_sort_key, scene_bounds, sorted_apply)
import cuda_optix_pathtracing_tpu.ops.rng as R

w = h = 256
SPP = 16
scene = cornell_box_mesh(w, h, subdiv=64)
tri_rows = BP.tri_rows_pack(scene.tri_v0, scene.tri_e0, scene.tri_e1)

pix = jnp.tile(pixel_centers(w, h), (SPP, 1))
sample = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), w * h)
px = pix[:, 0].astype(jnp.uint32); py = pix[:, 1].astype(jnp.uint32)
sampler = R.Sampler("hash", 0)
u1, u2 = sampler.sample_2d(px, py, sample, R.Dim.CAMERA_U)
p_film = pix + jnp.stack([u1, u2], axis=-1)
o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
n = o.shape[0]

def timeit(f, *a, iters=6):
    r = f(*a); jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters

raw = jax.jit(lambda o, d: BP.bvh_closest_raw(
    o, d, scene.bvh.box, scene.bvh.meta, tri_rows))
dt = timeit(raw, o, d)
print(f"raw kernel, jittered 16spp rays   : {n/dt/1e6:6.1f} Mrays/s")

blo, bhi = scene_bounds(scene.tri_v0, scene.tri_e0, scene.tri_e1)
def srt(o, d):
    key = ray_sort_key(o, d, blo, bhi)
    return sorted_apply(o, d, key, lambda so, sd: BP.bvh_closest_raw(
        so, sd, scene.bvh.box, scene.bvh.meta, tri_rows), 2)
f2 = jax.jit(srt)
dt2 = timeit(f2, o, d)
print(f"sorted_apply wrapper              : {n/dt2/1e6:6.1f} Mrays/s")

# pre-sorted rays, raw kernel (is it the POST-SORT ORDER?)
key = ray_sort_key(o, d, blo, bhi)
from jax import lax
_, so0, so1, so2, sd0, sd1, sd2 = lax.sort(
    (key, o[:,0], o[:,1], o[:,2], d[:,0], d[:,1], d[:,2]), num_keys=1,
    is_stable=True)
so = jnp.stack([so0, so1, so2], 1); sd = jnp.stack([sd0, sd1, sd2], 1)
so = jax.device_put(so); sd = jax.device_put(sd)
dt3 = timeit(raw, so, sd)
print(f"raw kernel on PRE-SORTED rays     : {n/dt3/1e6:6.1f} Mrays/s")
