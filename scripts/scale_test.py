"""Large-scene scale test (VERDICT r3 ask #3): prove the dense-layout
packet-BVH path compiles and renders big meshes on the TPU where the r3
whole-table design OOM'd at 8.3k triangles.

Scenes:
  1. teapot.fbx (9.2k tris) loaded through scene/meshio, lit like the
     reference fbx_example class.
  2. Two subdiv-128 spheres (~130k tris) in the Cornell shell.

Each renders 256² depth-5 at 4 spp on the real chip; prints tri count,
BVH sizes, compile time, render time, Mpaths/s, and the VMEM footprint
of the traversal tables. Output is recorded in docs/perf_notes.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale_test.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.models.megakernel import (
    MegakernelConfig,
    render_progressive,
)
from cuda_optix_pathtracing_tpu.ops import bsdf as B
from cuda_optix_pathtracing_tpu.ops import lights as L
from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
from cuda_optix_pathtracing_tpu.ops.bvh_pallas import tri_rows_pack
from cuda_optix_pathtracing_tpu.ops.camera import CameraConfig
from cuda_optix_pathtracing_tpu.ops.film import film_new
from cuda_optix_pathtracing_tpu.scene.meshio import load_fbx
from cuda_optix_pathtracing_tpu.scene.procedural import (
    cornell_box_mesh,
    generate_sphere,
)
from cuda_optix_pathtracing_tpu.scene.types import HostScene, scene_from_host


def teapot_scene(w, h):
    tris = load_fbx("/root/repo/scenes/res/fbx/teapot.fbx")
    tris = np.asarray(tris, np.float32)
    # normalize into view: center at (0, 2.2, -0.4), unit-ish scale
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    scale = 1.6 / float((hi - lo).max())
    tris = (tris - (lo + hi) * 0.5) * scale + np.array(
        [0.0, 2.2, -0.4], np.float32
    )
    hs = HostScene()
    hs.camera = CameraConfig(width=w, height=h)
    hs.add_model(list(tris), 0)
    hs.materials = [B.oren_nayar((0.8, 0.5, 0.3), 0.3)]
    hs.lights = [L.point_light((30.0, 30.0, 30.0), (1.5, 0.5, 1.5), 1e-3)]
    return scene_from_host(hs, use_bvh=True)


def run(name, scene, w, h, kspp=4):
    t = scene.tri_v0.shape[0]
    tri_rows = tri_rows_pack(scene.tri_v0, scene.tri_e0, scene.tri_e1)
    vmem = tri_rows.nbytes + scene.bvh.box.nbytes
    print(
        f"{name}: {t} padded tri rows, {scene.bvh.num_nodes} nodes, "
        f"traversal tables {vmem/1e6:.1f} MB VMEM "
        f"(+{scene.bvh.meta.nbytes//1024} KB SMEM meta)"
    )
    cfg = MegakernelConfig(
        max_depth=5, remat=False, fused="off",
        features=mat_features_from_table(scene.materials),
    )
    film = film_new(h, w)
    t0 = time.perf_counter()
    film = render_progressive(
        scene, film, cfg, w, h, jnp.uint32(0), kspp, kspp
    )
    film.mean.block_until_ready()
    print(f"  compile+first batch: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    film = render_progressive(
        scene, film, cfg, w, h, jnp.uint32(kspp), kspp, kspp
    )
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    m = np.asarray(film.mean)
    assert np.isfinite(m).all(), "non-finite radiance"
    print(
        f"  render: {dt*1e3:.0f} ms for {w}x{h}x{kspp}spp depth-5 "
        f"({w*h*kspp/dt/1e6:.2f} Mpaths/s); mean radiance {m.mean():.4f}"
    )


def main():
    import sys

    w = h = 256
    if "--stream-only" not in sys.argv:
        run("teapot.fbx   (9.2k tris)", teapot_scene(w, h), w, h)
        run(
            "spheres-128  (~131k tris)",
            cornell_box_mesh(w, h, subdiv=128),
            w, h,
        )
    # r5 HBM-streaming tier: ~525k tris — 2.3x past the whole-resident
    # VMEM ceiling (~230k padded rows); leaf rows DMA from HBM
    run(
        "spheres-256  (~525k tris)",
        cornell_box_mesh(w, h, subdiv=256),
        w, h,
    )


if __name__ == "__main__":
    main()
