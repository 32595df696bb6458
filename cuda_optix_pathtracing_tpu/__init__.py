"""TPU-native differentiable path tracer.

A ground-up re-design of the capabilities of the reference CUDA renderer
(``alexoz12v2/cuda-optix-pathtracing``, "DumbTracer") for TPU hardware:

- compute path: JAX / XLA / Pallas, SPMD over ``jax.sharding.Mesh``
- wavefront loops become ``lax.scan`` over depth with masked dense execution
  or sorted-ray compaction (no queues, no atomics)
- RNG is counter-based (hash / Halton-Owen keyed on pixel,sample,depth,dim)
  so every path is replayable — which is also what makes the renderer
  differentiable via recompute-on-backward (``jax.checkpoint``)
- host runtime (BVH build, mesh IO) is native C++ reached over ctypes

Subpackage map (mirrors the reference's layer map, SURVEY.md §1):

- ``ops``       — math, sampling, RNG, BSDFs, lights, intersection, film
                  (reference: ``examples/triangles/cuda-core``, ``src/core``)
- ``scene``     — scene model, procedural shapes, JSON/PBRT parsers
                  (reference: ``host_scene.cu``, ``core-parser.cpp``)
- ``models``    — integrators: direct, megakernel, wavefront, differentiable
                  (reference: ``megakernel/``, ``wavefront/``, ``core-render.cpp``)
- ``parallel``  — device mesh, shard_map tiling, multi-host entry
                  (net-new; the reference is single-GPU)
- ``utils``     — config, CLI, logging, timers, image IO, checkpointing
                  (reference: ``host_utils.cu``, ``cli/``, ``platform/``)
- ``native``    — C++ host runtime (BVH builders, mesh loaders) via ctypes
"""

__version__ = "0.1.0"
