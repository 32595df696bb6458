"""CLI renderer entry (reference: cli/main.cpp guardedMain flow +
megakernel/main.cu host loop): parse flags → load scene → progressive
render with per-batch stats → write mean + sqrt-MSE PNGs.

Run as: ``python -m cuda_optix_pathtracing_tpu.utils.cli --scene cornell``
or via the repo's ``dtpt`` wrapper.
"""

from __future__ import annotations

import os
import sys


def _select_device(device: str):
    if device == "cpu" or (device == "auto" and os.environ.get("JAX_PLATFORMS") is None):
        # default to CPU unless the env explicitly provides an accelerator;
        # 'tpu' uses whatever accelerator platform the env exposes
        if device == "cpu":
            os.environ["JAX_PLATFORMS"] = "cpu"


def main(argv=None) -> int:
    from .config import parse_args

    cfg = parse_args(argv)
    _select_device(cfg.device)

    process_index = 0
    if cfg.coordinator or cfg.num_processes:
        # must run before any package import that touches the XLA backend
        from ..parallel.distributed import init_distributed

        process_index = init_distributed(
            cfg.coordinator or None,
            cfg.num_processes or None,
            cfg.process_id if cfg.process_id >= 0 else None,
        )

    import numpy as np

    from ..models.megakernel import MegakernelConfig, render
    from ..ops.film import film_sqrt_mse, srgb_encode, to_uint8
    from ..scene import cornell_box
    from .checkpoint import load_film, save_film
    from .imageio import write_png
    from .logging import get_logger
    from .timers import AvgAndTotalTimer

    log = get_logger(level=cfg.log_level)

    if cfg.scene == "cornell":
        scene = cornell_box(cfg.width, cfg.height)
    elif cfg.scene == "cornell-mesh":
        from ..scene.procedural import cornell_box_mesh

        scene = cornell_box_mesh(cfg.width, cfg.height)
    elif cfg.scene.endswith(".pbrt"):
        from ..scene.pbrt import load_pbrt

        scene, meta = load_pbrt(cfg.scene)
        cfg.width, cfg.height = meta.width, meta.height
        if meta.spp and cfg.spp == 128:
            cfg.spp = meta.spp
    else:
        from ..scene.parser import load_scene

        scene, parsed = load_scene(cfg.scene)
        cfg.width, cfg.height = parsed.width, parsed.height
        if parsed.spp and cfg.spp == 128:
            cfg.spp = parsed.spp
        if parsed.max_depth:
            cfg.max_depth = parsed.max_depth
    log.info(
        "scene=%s %dx%d spp=%d depth=%d sampler=%s",
        cfg.scene, cfg.width, cfg.height, cfg.spp, cfg.max_depth, cfg.sampler,
    )

    from ..ops.bsdf import mat_features_from_table

    mk = MegakernelConfig(
        max_depth=cfg.max_depth, sampler=cfg.sampler, seed=cfg.seed, remat=False,
        features=mat_features_from_table(scene.materials),
    )

    film = None
    if cfg.checkpoint and os.path.exists(cfg.checkpoint):
        film, _ = load_film(cfg.checkpoint)
        log.info("resumed film at %d spp from %s", int(film.n), cfg.checkpoint)

    timer = AvgAndTotalTimer().start()
    npix = cfg.width * cfg.height

    def on_batch(f, done):
        dt = timer.lap()
        log.info(
            "spp %d/%d  %.2f Mpaths/s (ema)  total %.1fs",
            done, cfg.spp, npix * cfg.kspp / max(timer.ema, 1e-9) / 1e6, timer.total,
        )
        if cfg.save_partial:
            base, ext = os.path.splitext(cfg.out)
            _write_outputs(f, f"{base}_spp{done}{ext}")
        if cfg.checkpoint:
            save_film(cfg.checkpoint, f, cfg.seed)

    def _write_outputs(f, out_path):
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        write_png(out_path, np.asarray(to_uint8(srgb_encode(f.mean))))
        base, ext = os.path.splitext(out_path)
        write_png(
            f"{base}_sqrt_mse{ext}",
            np.asarray(to_uint8(srgb_encode(film_sqrt_mse(f)))),
        )

    if cfg.coordinator or cfg.num_processes:
        # multi-host: pixels sharded over the global mesh, film assembled
        # on every host; rank 0 writes outputs
        if film is not None:
            log.warning(
                "--checkpoint resume is not supported in multi-host mode; "
                "re-rendering %d spp from scratch", cfg.spp,
            )
        if cfg.save_partial:
            log.warning(
                "--save-partial / kspp batching is not supported in "
                "multi-host mode; only the final image is written"
            )
        from ..parallel.distributed import render_multihost

        film = render_multihost(
            scene, mk, cfg.width, cfg.height, cfg.spp
        )
        if process_index == 0:
            _write_outputs(film, cfg.out)
            log.info("wrote %s (total %.1fs)", cfg.out, timer.total)
        return 0

    film = render(
        scene, cfg.width, cfg.height, cfg.spp,
        cfg=mk, kspp=cfg.kspp, film=film, progress_cb=on_batch,
    )
    _write_outputs(film, cfg.out)
    log.info("wrote %s (total %.1fs)", cfg.out, timer.total)
    return 0


if __name__ == "__main__":
    sys.exit(main())
