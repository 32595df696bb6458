"""Multi-host (multi-process) entry: ``jax.distributed`` wiring + film
assembly across hosts.

Reference mapping (SURVEY.md §2.5): the reference scales by MPI-style
process-per-GPU with NCCL all-reduce; the TPU-native equivalent is one
JAX process per host, ``jax.distributed.initialize`` against a
coordinator, a GLOBAL ``Mesh`` spanning every chip of every host, and
the SAME ``shard_map`` renderer (parallel/render.py) — XLA routes the
gradient ``psum`` over ICI within a host and DCN across hosts; the
forward render needs no collective at all (each chip owns its film
rows).

On CPU (tests / no TPU pod) the same code runs with Gloo-backed
collectives: each process exposes ``--xla_force_host_platform_device_count``
virtual devices and the global mesh stitches them together. This is how
``tests/test_multihost.py`` validates the multi-process path with two
real OS processes.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..ops.film import Film


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialize the JAX distributed runtime and return process_index.

    With no arguments, auto-detects from the environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or a recognised cluster env — TPU pod metadata,
    SLURM …). Safe to call when already initialized (no-op) or when
    single-process (returns 0 without starting the runtime).
    """
    if jax.distributed.is_initialized():
        return jax.process_index()
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator is None and num_processes is None:
        # Single-process runs (the common CLI case) need no runtime.
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def global_mesh(axis: str = "rays"):
    """1D mesh over every device of every process (ICI+DCN)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def gather_film(film: Film) -> Film:
    """Assemble the globally-sharded film into host-local numpy arrays.

    ``render_sharded`` leaves the film row-sharded across all chips of
    all processes; each process can only read its addressable shards.
    This all-gathers the pixel rows (one DCN collective per field) so
    every host holds the full image — the reference's equivalent is the
    final device→host copy in megakernel/main.cu:141-193 (single GPU
    had no assembly step; multi-host is net-new scope).
    """
    from jax.experimental import multihost_utils as mhu

    def _full(x):
        x = jax.numpy.asarray(x)
        if getattr(x, "is_fully_replicated", True):
            return np.asarray(x)
        return np.asarray(mhu.process_allgather(x, tiled=True))

    return Film(_full(film.mean), _full(film.m2), _full(film.n))


def render_multihost(scene, cfg, width, height, spp, axis: str = "rays") -> Film:
    """Render with pixels sharded over the GLOBAL mesh; returns the fully
    assembled film on every process (numpy-backed)."""
    from .render import render_sharded

    mesh = global_mesh(axis)
    film = render_sharded(scene, cfg, width, height, spp, mesh, axis)
    jax.block_until_ready(film.mean)
    return gather_film(film)
