"""shard_map renderer: pixels sharded over a 1D device mesh.

Mapping of the reference's parallelism axes (SURVEY.md §2.5):
- CPU 32×32 tile jobs / CUDA grid-stride pixels → pixel-row shards per chip
- warp-level tiles → (8,128) vector lanes inside each chip (XLA/Pallas)
- NEW: multi-chip — scene+BVH replicated per chip (traversal stays
  communication-free), film rows owned per chip, parameter gradients
  ``psum``-reduced over ICI for inverse rendering.

Multi-host note: with ``jax.distributed.initialize`` the same code runs
data-parallel across hosts; each host feeds its addressable shard of the
pixel axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.megakernel import MegakernelConfig, trace_paths
from ..ops import rng as R
from ..ops.camera import generate_rays, pixel_centers
from ..ops.film import Film
from ..scene.types import Scene

# JAX 0.9's direct-linearize path has no linearization rule for ``remat2``
# under shard_map: chained ``jax.checkpoint`` bounces inside a sharded
# value_and_grad fail with "Linearization failed to produce known values
# for all output primals" (plain grads are fine; only shard_map + remat
# trips it). Fall back to the classic JVP+partial-eval linearizer, which
# handles remat everywhere. Scoped here: this module is the multi-chip
# entry point, and the flag must be set before the sharded train step is
# traced.
jax.config.update("jax_use_direct_linearize", False)

shard_map = jax.shard_map


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def _render_pixels(scene: Scene, cfg: MegakernelConfig, px, py, sample):
    """Radiance for one sample of the given pixel list (device-local)."""
    sampler = R.Sampler(cfg.sampler, cfg.seed)
    jx, jy = sampler.sample_2d(px, py, sample, R.Dim.CAMERA_U)
    p_film = jnp.stack(
        [px.astype(jnp.float32) + jx, py.astype(jnp.float32) + jy], axis=-1
    )
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
    return trace_paths(scene, cfg, px, py, sample, o, d)


@partial(
    jax.jit, static_argnames=("cfg", "width", "height", "spp", "mesh", "axis")
)
def render_sharded(
    scene: Scene,
    cfg: MegakernelConfig,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    axis: str = "rays",
):
    """Render spp samples with pixels sharded across ``mesh`` → Film.

    The pixel id array is sharded; every chip traces only its own rays.
    No collective is needed in the forward pass — each chip owns its film
    rows (out_specs keeps them sharded until the host gathers).
    """
    pix = pixel_centers(width, height)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)

    def shard_body(scene, px, py):
        def sample_step(carry, s):
            mean, m2 = carry
            radiance = _render_pixels(scene, cfg, px, py, s)
            n = s.astype(jnp.float32) + 1.0
            delta = radiance - mean
            mean = mean + delta / n
            m2 = m2 + delta * (radiance - mean)
            return (mean, m2), None

        z = jnp.zeros((px.shape[0], 3), jnp.float32)
        (mean, m2), _ = jax.lax.scan(
            sample_step, (z, z), jnp.arange(spp, dtype=jnp.uint32)
        )
        return mean, m2

    mean, m2 = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,  # scan carries start as replicated constants
    )(scene, px, py)
    return Film(
        mean.reshape(height, width, 3),
        m2.reshape(height, width, 3),
        jnp.float32(spp),
    )


def train_step_sharded(
    opt_update,
    scene_of_params,
    cfg: MegakernelConfig,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    axis: str = "rays",
):
    """Build a jitted inverse-rendering step with pixels sharded over the
    mesh and parameter gradients psum-reduced over ICI.

    ``scene_of_params(params) -> Scene`` injects optimizable parameters
    (albedos, light/env emission) into the scene pytree.
    Returns step(params, opt_state, target, sample_offset) →
    (params, opt_state, loss).
    """
    pix = pixel_centers(width, height)
    px_all = pix[:, 0].astype(jnp.uint32)
    py_all = pix[:, 1].astype(jnp.uint32)

    def local_loss(params, px, py, target_rows, sample_offset):
        scene = scene_of_params(params)

        def sample_step(mean, s):
            radiance = _render_pixels(scene, cfg, px, py, sample_offset + s)
            return mean + radiance / spp, None

        mean, _ = jax.lax.scan(
            sample_step,
            jnp.zeros((px.shape[0], 3), jnp.float32),
            jnp.arange(spp, dtype=jnp.uint32),
        )
        # mean of squared error over *global* pixels: scale by shard count
        return jnp.mean((mean - target_rows) ** 2)

    def shard_body(params, px, py, target_rows, sample_offset):
        loss, grads = jax.value_and_grad(local_loss)(
            params, px, py, target_rows, sample_offset
        )
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)  # ← ICI all-reduce
        return loss, grads

    @jax.jit
    def step(params, opt_state, target, sample_offset):
        target_flat = target.reshape(-1, 3)
        loss, grads = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,  # scan carries start as replicated constants
        )(params, px_all, py_all, target_flat, sample_offset)
        updates, opt_state = opt_update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
