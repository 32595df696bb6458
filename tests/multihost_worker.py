"""Worker for tests/test_multihost.py: one of N processes of a
multi-host render. Invoked as

    python tests/multihost_worker.py <process_id> <num_processes> \
        <coordinator> <out_dir>

Each process exposes 4 virtual CPU devices; the global mesh spans
4*N devices. Process 0 writes the assembled film to <out_dir>/film.npz.
"""

import os
import sys


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, out_dir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    # initialize BEFORE importing package modules — several build jnp
    # tables at import time, which would initialise the XLA backend
    from cuda_optix_pathtracing_tpu.parallel.distributed import init_distributed

    init_distributed(coordinator, nproc, pid)

    import numpy as np

    from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig
    from cuda_optix_pathtracing_tpu.parallel.distributed import render_multihost
    from cuda_optix_pathtracing_tpu.scene import cornell_box

    assert jax.process_index() == pid
    assert jax.device_count() == 4 * nproc, jax.device_count()

    width, height = 16, 16
    scene = cornell_box(width, height)
    cfg = MegakernelConfig(max_depth=3, remat=False)
    film = render_multihost(scene, cfg, width, height, spp=4)

    if pid == 0:
        np.savez(
            os.path.join(out_dir, "film.npz"),
            mean=film.mean, m2=film.m2, n=film.n,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
