"""Benchmark: path-tracing throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: Cornell box 256² depth-5 camera paths/s through the
fused Pallas megakernel (the reference CUDA megakernel's own measured
workload — 256²×2048spp in ≈15,546 ms on a GTX 1070 ⇒ ≈8.63 Mpaths/s,
docs/dmt-mk_roofline_point.txt, BASELINE.md).

extra:
- cornell_mesh_bvh_mpaths: the same estimator on the BVH-exercising
  mesh Cornell (two subdiv-64 spheres ≈ 8.3k tris, BASELINE config 4
  class) through the XLA wavefront + packet-BVH kernels with
  octant/Morton ray sorting, 16 spp flattened per pass (r4 tuning:
  LEAF_SIZE=16, 16-row tiles, dead-ray parking — docs/perf_notes.md).
- fwd_bwd_mpaths: ONE value_and_grad step of the albedo L2 loss at 256²
  depth-5 (path-replay backward via remat) in paths/s counting forward
  paths only — BASELINE.md's north-star "fwd+bwd Mpaths/s/chip" metric.
- vpu_tflops / vpu_fraction: sustained fp32 FLOP/s of the headline run
  against the ~3.9 TFLOP/s v5e VPU fp32 ceiling (flop count per path:
  5 bounces × [26 tris × (45 MT closest + 45 fetch + 45 anyhit)] +
  5 × ~800 shading ≈ 21.5 kflop) — the roofline fraction VERDICT r2
  asked for.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _throughput(scene, cfg, width, height, kspp, iters=4, spp_per_pass=1):
    from cuda_optix_pathtracing_tpu.models.megakernel import render_progressive
    from cuda_optix_pathtracing_tpu.ops.film import film_new

    film = film_new(height, width)
    film = render_progressive(
        scene, film, cfg, width, height, jnp.uint32(0), kspp, spp_per_pass
    )
    film.mean.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        film = render_progressive(
            scene, film, cfg, width, height, jnp.uint32((i + 1) * kspp),
            kspp, spp_per_pass,
        )
    film.mean.block_until_ready()
    dt = time.perf_counter() - t0
    return width * height * kspp * iters / dt / 1e6


def _fwd_bwd(scene, width, height, spp=4, iters=4):
    """paths/s of one albedo-gradient step (spp flattened into one ray
    batch, depth 5). r5: the r4 leg ran spp=1 steps and was dispatch-
    dominated — driver 2.13 vs re-run 3.72 Mpaths/s (VERDICT r4 weak
    #2). Batching 4 spp per step makes kernel time dominate; measured
    run-to-run spread ≤1% on a v5e (scripts/fwd_bwd_perf.py sweep:
    spp=4/remat_every=1 = 5.8 Mpaths/s beats spp=8 and remat_every=2).
    Returns (Mpaths/s best-of-two, spread)."""
    from cuda_optix_pathtracing_tpu.models.differentiable import (
        init_params,
        make_loss,
    )
    from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig

    cfg = MegakernelConfig(max_depth=5, remat=True, fused="off")
    target = jnp.zeros((height, width, 3), jnp.float32)
    loss = make_loss(
        scene, cfg, width, height, spp=spp, target=target, spp_per_pass=spp
    )
    params = init_params(scene)
    step = jax.jit(jax.value_and_grad(loss))
    l, g = step(params)
    l.block_until_ready()
    vals = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            l, g = step(params)
        l.block_until_ready()
        dt = time.perf_counter() - t0
        vals.append(width * height * spp * iters / dt / 1e6)
    spread = abs(vals[0] - vals[1]) / max(vals)
    return max(vals), spread


def smoke():
    """Hardware-compile gate (VERDICT r4 weak #5): compile the fused
    megakernel AND the packet-BVH kernels on the REAL backend at 64²,
    render 1 spp each, assert finiteness. Run before end-of-round
    commits: `python bench.py --smoke` (rc 0 = both kernels compile and
    produce finite images on the chip)."""
    from cuda_optix_pathtracing_tpu.scene import cornell_box
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render,
        resolve_fused,
    )
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table

    results = {}
    for name, scene, fused in (
        ("fused", cornell_box(64, 64), "on"),
        ("bvh", cornell_box_mesh(64, 64, subdiv=16), "off"),
    ):
        cfg = resolve_fused(
            scene,
            MegakernelConfig(
                max_depth=4,
                remat=False,
                fused=fused,
                features=mat_features_from_table(scene.materials),
            ),
        )
        film = render(scene, 64, 64, 1, cfg=cfg, kspp=1)
        finite = bool(jnp.all(jnp.isfinite(film.mean)))
        mean = float(jnp.mean(film.mean))
        results[name] = {"finite": finite, "mean": round(mean, 5)}
        assert finite, f"{name}: non-finite film"
        assert mean > 0.0, f"{name}: black film"
    print(json.dumps({"metric": "smoke", "backend": jax.default_backend(),
                      "results": results}))


def main():
    from cuda_optix_pathtracing_tpu.scene import cornell_box
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        resolve_fused,
    )
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table

    width = height = 256
    kspp = 8

    # --- headline: procedural Cornell through the fused Pallas kernel ---
    scene = cornell_box(width, height)
    cfg = resolve_fused(
        scene,
        MegakernelConfig(
            max_depth=5,
            remat=False,
            features=mat_features_from_table(scene.materials),
        ),
    )
    mpaths_s = _throughput(scene, cfg, width, height, kspp)

    # --- BVH metric: mesh Cornell through the packet-BVH kernel ---
    scene_m = cornell_box_mesh(width, height, subdiv=64)
    cfg_m = MegakernelConfig(
        max_depth=5,
        remat=False,
        fused="off",
        features=mat_features_from_table(scene_m.materials),
    )
    mpaths_bvh = _throughput(
        scene_m, cfg_m, width, height, 16, iters=2, spp_per_pass=16
    )

    # --- differentiable: fwd+bwd albedo gradient step ---
    fwd_bwd, fwd_bwd_spread = _fwd_bwd(scene, width, height)

    # --- roofline fraction of the headline run ---
    flops_per_path = 5 * (26 * (45 + 45 + 45)) + 5 * 800  # ≈ 21.5 kflop
    vpu_tflops = mpaths_s * 1e6 * flops_per_path / 1e12
    vpu_peak = 3.9  # v5e fp32 VPU (8×128 lanes × 4 ALUs × 0.94 GHz)

    baseline_mpaths_s = 8.63  # GTX 1070 reference megakernel
    print(
        json.dumps(
            {
                "metric": "cornell256_depth5_throughput",
                "value": round(mpaths_s, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(mpaths_s / baseline_mpaths_s, 3),
                "extra": {
                    "cornell_mesh_bvh_mpaths": round(mpaths_bvh, 3),
                    "fwd_bwd_mpaths": round(fwd_bwd, 3),
                    "fwd_bwd_spread": round(fwd_bwd_spread, 3),
                    "vpu_tflops": round(vpu_tflops, 3),
                    "vpu_fraction": round(vpu_tflops / vpu_peak, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--smoke" in sys.argv:
        smoke()
    else:
        main()
