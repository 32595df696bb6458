"""Sharded-render scaling harness (VERDICT r2 ask #5).

Measures render_sharded throughput at mesh sizes 1..8 on the virtual CPU
device mesh, each size in its own subprocess (device count is fixed at
process start). Prints a Markdown table for docs/perf_notes.md.

Caveat printed with the table: virtual CPU devices SHARE the host's
cores, so this measures *sharding overhead* (shard_map partitioning,
collective insertion, per-shard dispatch), not hardware speedup — ideal
is a flat line, and efficiency(n) = t(1)/t(n of equal total work) would
need n real chips. On a TPU pod the same code path shards over ICI.

Run: python scripts/scaling_efficiency.py
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import os, sys, time, json
    n = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig
    from cuda_optix_pathtracing_tpu.parallel.render import make_mesh, render_sharded
    from cuda_optix_pathtracing_tpu.scene import cornell_box

    W = H = 128
    SPP = 8
    scene = cornell_box(W, H)
    cfg = MegakernelConfig(max_depth=5, remat=False)
    mesh = make_mesh(n)
    film = render_sharded(scene, cfg, W, H, SPP, mesh)  # compile
    film.mean.block_until_ready()
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        film = render_sharded(scene, cfg, W, H, SPP, mesh)
        film.mean.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"n": n, "mpaths_s": W * H * SPP / dt / 1e6}))
    """
)


def main():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(n)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        if out.returncode:
            sys.exit(
                f"child (n={n}) failed rc={out.returncode}:\n{out.stderr}"
            )
        lines = out.stdout.strip().splitlines()
        if not lines:
            sys.exit(f"child (n={n}) produced no output:\n{out.stderr}")
        line = lines[-1]
        rows.append(json.loads(line))
        print(line, flush=True)

    base = rows[0]["mpaths_s"]
    print("\n| mesh devices | Mpaths/s | vs 1-device |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['n']} | {r['mpaths_s']:.2f} | {r['mpaths_s'] / base:.2f}x |")
    print(
        "\n(virtual CPU devices share host cores: flat == zero sharding "
        "overhead; real speedup needs real chips)"
    )


if __name__ == "__main__":
    main()
