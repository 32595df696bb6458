"""fwd+bwd gradient-step throughput: sweep spp_per_pass x remat_every.

Usage: python scripts/fwd_bwd_perf.py [spp_per_pass] [remat_every]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuda_optix_pathtracing_tpu.scene import cornell_box
from cuda_optix_pathtracing_tpu.models.differentiable import (
    init_params, make_loss)
from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
remat_every = int(sys.argv[2]) if len(sys.argv) > 2 else 1
w = h = 256
scene = cornell_box(w, h)
cfg = MegakernelConfig(max_depth=5, remat=True, remat_every=remat_every,
                       fused="off")
target = jnp.zeros((h, w, 3), jnp.float32)
loss = make_loss(scene, cfg, w, h, spp=spp, target=target,
                 spp_per_pass=spp)
params = init_params(scene)
step = jax.jit(jax.value_and_grad(loss))
l, g = step(params)
l.block_until_ready()

vals = []
for rep in range(2):
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        l, g = step(params)
    l.block_until_ready()
    dt = time.perf_counter() - t0
    vals.append(w * h * spp * iters / dt / 1e6)
spread = abs(vals[0] - vals[1]) / max(vals)
print(f"spp={spp} remat_every={remat_every}: "
      f"{vals[0]:.2f} / {vals[1]:.2f} Mpaths/s (spread {spread*100:.0f}%)")
