"""Fast eager-mode shape/NaN shakedown of the integrator stack.

Usage: python scripts/debug_render.py [res] [spp] [depth]
Writes /tmp/cornell_debug.png.
"""

import os
import sys
import time

import jax
import numpy as np

# default to CPU so debug runs never contend for the single TPU client;
# set DTPT_DEVICE=tpu to use the chip. (The axon sitecustomize overrides
# jax_platforms at interpreter start, so set the config knob, not the env.)
if os.environ.get("DTPT_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cuda_optix_pathtracing_tpu.scene import cornell_box
from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig, render
from cuda_optix_pathtracing_tpu.ops.film import srgb_encode, to_uint8, film_sqrt_mse
from cuda_optix_pathtracing_tpu.utils.imageio import write_png


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sc = cornell_box(res, res)
    print(f"tris={sc.num_triangles} lights={sc.num_lights}")
    t0 = time.time()
    film = render(
        sc, res, res, spp=spp, cfg=MegakernelConfig(max_depth=depth, remat=False), kspp=spp
    )
    m = np.asarray(film.mean)
    print(f"render {time.time()-t0:.1f}s  min={m.min():.4f} max={m.max():.4f} "
          f"mean={m.mean():.4f} nan={np.isnan(m).sum()}")
    write_png("/tmp/cornell_debug.png", np.asarray(to_uint8(srgb_encode(film.mean))))
    write_png(
        "/tmp/cornell_debug_mse.png",
        np.asarray(to_uint8(srgb_encode(film_sqrt_mse(film)))),
    )
    print("wrote /tmp/cornell_debug.png")


if __name__ == "__main__":
    main()
