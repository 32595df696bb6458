"""Wavefront integrator: depth-synchronized passes with live-path early
exit and sorted ray regrouping.

TPU re-design of the reference's two wavefront renderers:

- `dmt-wavefront` (one persistent cooperative kernel with 5 block roles,
  lock-free queues, distributed termination votes —
  examples/triangles/wavefront/main.cu:344-881) and
- `dmt-wavefront-stream` (host-sequenced raygen→closesthit→anyhit→shade→
  miss kernels over double-buffered queues —
  examples/triangles/wavefront-stream/main.cu:221-319).

Neither atomics, queues, nor persistent-thread protocols exist here. The
TPU equivalents are:

- queue regrouping     → octant/Morton ray sorting (ops/raysort.py),
  applied inside the intersection dispatch per depth;
- per-stage kernels    → one fused bounce step (models/megakernel.py's
  bounce_step), which XLA splits into its own optimal kernel schedule;
- `checkDoneDepth` / termination votes → a `lax.while_loop` whose
  condition is `depth < max_depth AND any(alive)` — the whole batch
  retires as soon as russian roulette / misses kill the last path, which
  is the wavefront architecture's actual payoff vs. the megakernel's
  fixed unroll (reference: zero-copy `h_done` flag, utils.cu:154).

Restrictions vs the megakernel: the depth index is traced, so the QMC
(Halton) sampler's static prime-base selection is unavailable — hash
sampler only — and `lax.while_loop` is not reverse-differentiable, so
training goes through the megakernel (remat) path. Same estimator,
bit-identical image for a fixed depth count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import rng as R
from ..ops.film import Film, film_add_sample, film_new
from ..ops.filters import make_filter_sampler, sample_filter
from ..ops.camera import generate_rays, pixel_centers
from ..ops.morton import morton_pixel_order, unmorton_image
from ..scene.types import Scene
from .megakernel import (
    MegakernelConfig,
    PathState,
    _use_morton,
    bounce_step,
    init_path_state,
)


@dataclass(frozen=True)
class WavefrontConfig(MegakernelConfig):
    """Same knobs as the megakernel; sampler must be "hash"."""


def trace_paths_wavefront(scene: Scene, cfg, px, py, sample, o, d):
    """Dynamic-depth path trace: loops while any path is alive."""
    if cfg.sampler != "hash":
        raise ValueError(
            "wavefront model requires the hash sampler (traced depth index)"
        )
    n = o.shape[0]
    sampler = R.Sampler(cfg.sampler, cfg.seed)

    state = init_path_state(scene, n, o, d)

    def cond(carry):
        depth, state = carry
        return (depth < cfg.max_depth) & jnp.any(state.alive)

    def body(carry):
        depth, state = carry
        state = bounce_step(scene, cfg, sampler, px, py, sample, depth, state)
        return depth + 1, state

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    return state.radiance


def render_sample_batch_wavefront(scene: Scene, cfg, width, height, sample):
    """Render one sample per pixel → (H, W, 3) radiance."""
    if cfg.sampler != "hash":
        raise ValueError(
            "wavefront model requires the hash sampler (traced depth index)"
        )
    morton = _use_morton(cfg, scene, width, height)
    if morton:
        import numpy as np

        ys, xs = np.mgrid[0:height, 0:width]
        flat = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
        pix = jnp.asarray(flat[morton_pixel_order(width, height)])
    else:
        pix = pixel_centers(width, height)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)
    sampler = R.Sampler(cfg.sampler, cfg.seed)
    u1, u2 = sampler.sample_2d(px, py, sample, R.Dim.CAMERA_U)
    if cfg.pixel_filter == "mitchell":
        fs = make_filter_sampler()
        dx, dy, fw = sample_filter(fs, u1, u2)
        p_film = pix + 0.5 + jnp.stack([dx, dy], axis=-1)
    else:
        fw = None
        p_film = pix + jnp.stack([u1, u2], axis=-1)
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
    radiance = trace_paths_wavefront(scene, cfg, px, py, sample, o, d)
    if fw is not None:
        radiance = radiance * fw[:, None]
    if morton:
        return unmorton_image(radiance, height, width)
    return radiance.reshape(height, width, 3)


@partial(jax.jit, static_argnames=("cfg", "width", "height", "kspp"))
def render_progressive_wavefront(scene: Scene, film: Film, cfg, width, height, sample_offset, kspp):
    """Accumulate ``kspp`` samples into the film (progressive batching,
    megakernel/main.cu:141-193 parity)."""

    def step(film, k):
        radiance = render_sample_batch_wavefront(
            scene, cfg, width, height, sample_offset + k
        )
        return film_add_sample(film, radiance), None

    film, _ = lax.scan(step, film, jnp.arange(kspp, dtype=jnp.uint32))
    return film


def render_wavefront(scene: Scene, width, height, spp, cfg=None, kspp: int = 4, film: Film | None = None, progress_cb=None):
    """Host-side progressive loop."""
    cfg = cfg or WavefrontConfig()
    film = film if film is not None else film_new(height, width)
    done = int(film.n)
    while done < spp:
        batch = min(kspp, spp - done)
        film = render_progressive_wavefront(
            scene, film, cfg, width, height, jnp.uint32(done), batch
        )
        done += batch
        if progress_cb is not None:
            progress_cb(film, done)
    return film
