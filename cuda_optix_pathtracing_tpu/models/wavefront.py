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
    sampler = R.Sampler(cfg.sampler, cfg.seed)
    state = init_path_state(scene, o.shape[0], o, d)

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


# ---------------------------------------------------------------------------
# Pool wavefront with path regeneration — the compaction design
# ---------------------------------------------------------------------------
#
# The early-exit model above still *carries* dead lanes: after russian
# roulette and misses thin a sample batch out, every remaining bounce
# re-traces the full dense batch with most lanes masked off. The
# reference's wavefront queues exist precisely to avoid that
# (wavefront-stream/main.cu:221-319: per-depth queues hold only live
# work). On TPU, shapes are static, so "shrinking the batch" is
# impossible — but its dual is not: keep the batch FULL by refilling
# every dead lane with a fresh (pixel, sample) work item in the same
# iteration (path regeneration — the standard wavefront formulation for
# wide-SIMD machines). Occupancy stays ~100 % at every depth; total
# iterations ≈ total_bounce_work / pool_size instead of spp × max_depth.
#
# Film accumulation cannot use the dense per-sample Welford update (paths
# retire out of order), so finished paths scatter per-ITERATION batch
# moments by pixel id and those are merged into running Welford
# (mean, M2, count) state with Chan's parallel update each iteration.
# A batch holds ≤ a few samples per pixel, so its local Σ²−Σ²/n closure
# is benign; the running state never holds raw power sums — this is the
# numerically-safe form (a global (Σ, Σ²) closure at spp≫1 cancels
# catastrophically once mean² ≫ variance).


def render_pool_wavefront(
    scene: Scene, width: int, height: int, spp: int, cfg=None,
    pool: int | None = None,
):
    """Full render via the regenerating path pool → Film.

    Matches the megakernel/hash-sampler estimator sample-for-sample (same
    RNG keying), differing only in fp reduction order. Box pixel filter
    (filter-importance weights would need a per-lane carry; use the
    megakernel for Mitchell).
    """
    cfg = cfg or WavefrontConfig()
    if cfg.sampler != "hash":
        raise ValueError("pool wavefront requires the hash sampler")
    if cfg.pixel_filter != "box":
        raise ValueError("pool wavefront supports the box pixel filter only")
    npix = width * height
    m = pool or min(npix, 1 << 16)
    total = npix * spp
    sampler = R.Sampler(cfg.sampler, cfg.seed)

    def raygen(w):
        """Work item id → (o, d, px, py, sample, pix_id)."""
        pix_id = (w % npix).astype(jnp.int32)
        s = (w // npix).astype(jnp.uint32)
        px = (pix_id % width).astype(jnp.uint32)
        py = (pix_id // width).astype(jnp.uint32)
        u1, u2 = sampler.sample_2d(px, py, s, R.Dim.CAMERA_U)
        p_film = jnp.stack(
            [px.astype(jnp.float32) + u1, py.astype(jnp.float32) + u2], -1
        )
        o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
        return o, d, px, py, s, pix_id

    w0 = jnp.arange(m, dtype=jnp.uint32)
    o, d, px, py, sample, pix = raygen(w0)
    state = init_path_state(scene, m, o, d)
    state = state._replace(alive=w0 < total)
    pix = jnp.where(w0 < total, pix, npix)  # inert lanes scatter nowhere

    carry = (
        state, px, py, sample, pix,
        jnp.zeros((m,), jnp.int32),  # per-lane depth
        jnp.uint32(m),  # next work item
        jnp.zeros((npix, 3), jnp.float32),  # running mean
        jnp.zeros((npix, 3), jnp.float32),  # running M2
        jnp.zeros((npix,), jnp.float32),  # running count
    )

    def cond(c):
        return jnp.any(c[0].alive)

    def body(c):
        state, px, py, sample, pix, depth, next_w, mean, m2, cnt = c
        pre = state.alive
        state = bounce_step(scene, cfg, sampler, px, py, sample, depth, state)
        depth = depth + 1
        finished = pre & (~state.alive | (depth >= cfg.max_depth))

        # retire: scatter THIS iteration's batch moments by pixel
        # (duplicates in `pix` are fine — scatter-add; inert lanes carry
        # pix == npix → dropped), then Chan-merge into (mean, M2, cnt).
        rad = jnp.where(finished[..., None], state.radiance, 0.0)
        fpix = jnp.where(finished, pix, npix)
        nb = jnp.zeros((npix,), jnp.float32).at[fpix].add(
            finished.astype(jnp.float32), mode="drop"
        )
        sb = jnp.zeros((npix, 3), jnp.float32).at[fpix].add(rad, mode="drop")
        qb = jnp.zeros((npix, 3), jnp.float32).at[fpix].add(
            rad * rad, mode="drop"
        )
        nb_safe = jnp.maximum(nb, 1.0)[:, None]
        mb = sb / nb_safe
        m2b = jnp.maximum(qb - sb * sb / nb_safe, 0.0)
        ntot = cnt + nb
        w = (nb / jnp.maximum(ntot, 1.0))[:, None]
        delta = mb - mean
        has = (nb > 0.0)[:, None]
        mean = jnp.where(has, mean + delta * w, mean)
        m2 = jnp.where(
            has, m2 + m2b + delta * delta * cnt[:, None] * w, m2
        )
        cnt = ntot

        # refill: finished lanes claim the next work items (prefix ranks)
        rank = jnp.cumsum(finished.astype(jnp.uint32)) - 1
        w_new = next_w + rank
        valid = finished & (w_new < total)
        o2, d2, px2, py2, smp2, pix2 = raygen(jnp.where(finished, w_new, 0))
        fresh = init_path_state(scene, m, o2, d2)
        fin3 = finished[..., None]

        def sel(new, old):
            mask = fin3 if new.ndim == 2 else finished
            return jnp.where(mask, new, old)

        state = jax.tree_util.tree_map(sel, fresh, state)
        state = state._replace(alive=jnp.where(finished, valid, state.alive))
        px = jnp.where(finished, px2, px)
        py = jnp.where(finished, py2, py)
        sample = jnp.where(finished, smp2, sample)
        pix = jnp.where(finished, jnp.where(valid, pix2, npix), pix)
        depth = jnp.where(finished, 0, depth)
        next_w = next_w + jnp.sum(finished.astype(jnp.uint32))
        return state, px, py, sample, pix, depth, next_w, mean, m2, cnt

    out = lax.while_loop(cond, body, carry)
    mean, m2 = out[7], out[8]
    return Film(
        mean=mean.reshape(height, width, 3),
        m2=m2.reshape(height, width, 3),
        n=jnp.float32(spp),
    )


render_pool_wavefront_jit = jax.jit(
    render_pool_wavefront,
    static_argnames=("width", "height", "spp", "cfg", "pool"),
)
