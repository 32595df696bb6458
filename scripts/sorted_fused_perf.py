"""Measure the r5 depth-sorted fused wavefront vs the XLA wavefront on
the mesh-Cornell bench leg (256^2, depth 5, 16 spp flattened)."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os as _os
import cuda_optix_pathtracing_tpu.models.megakernel_pallas as MP
if _os.environ.get("SKIP_SHADOW"):
    MP._DEBUG_SKIP_SHADOW = True
from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig, trace_paths)
from cuda_optix_pathtracing_tpu.models.megakernel_pallas import (
    trace_paths_fused_sorted)
from cuda_optix_pathtracing_tpu.ops.camera import generate_rays, pixel_centers
import cuda_optix_pathtracing_tpu.ops.rng as R

w = h = 256
SPP = 16
subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 5
scene = cornell_box_mesh(w, h, subdiv=subdiv)
print(f"{scene.tri_v0.shape[0]} padded tris, {scene.bvh.num_nodes} nodes")
pix = pixel_centers(w, h)
pix = jnp.tile(pix, (SPP, 1))
sample = jnp.uint32(0) + jnp.repeat(
    jnp.arange(SPP, dtype=jnp.uint32), w * h)
px = pix[:, 0].astype(jnp.uint32)
py = pix[:, 1].astype(jnp.uint32)
sampler = R.Sampler("hash", 0)
u1, u2 = sampler.sample_2d(px, py, sample, R.Dim.CAMERA_U)
p_film = pix + jnp.stack([u1, u2], axis=-1)
o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
n = o.shape[0]


def timeit(f, *a, iters=8):
    r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters, r


f_sorted = jax.jit(lambda o, d: trace_paths_fused_sorted(
    scene, px, py, sample, o, d, max_depth=DEPTH, rr_start_depth=2))
dt, r = timeit(f_sorted, o, d)
print(f"depth-sorted fused : {n/dt/1e6:6.2f} Mpaths/s  ({dt*1e3:.1f} ms)"
      f"  mean={float(jnp.mean(r)):.5f}")

cfg = MegakernelConfig(max_depth=DEPTH, fused="off")
f_xla = jax.jit(lambda o, d: trace_paths(scene, cfg, px, py, sample, o, d))
dt2, r2 = timeit(f_xla, o, d, iters=4)
print(f"XLA wavefront      : {n/dt2/1e6:6.2f} Mpaths/s  ({dt2*1e3:.1f} ms)"
      f"  mean={float(jnp.mean(r2)):.5f}")
