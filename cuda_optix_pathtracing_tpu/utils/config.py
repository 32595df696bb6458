"""Run configuration (reference Config, host_utils.cuh:25-75 + CLI tier of
cli/CLIManager.h): width/height/spp/kspp/log level/save-partial, plus the
TPU-specific knobs (sampler, depth, mesh shape, device)."""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field


@dataclass
class RunConfig:
    scene: str = "cornell"  # "cornell" or a path to a JSON/PBRT scene
    out: str = "out/render.png"
    width: int = 256
    height: int = 256
    spp: int = 128
    kspp: int = 8  # samples per jitted batch (reference: per launch)
    max_depth: int = 5
    sampler: str = "hash"  # hash | halton
    seed: int = 0
    device: str = "auto"  # auto | cpu | tpu
    save_partial: bool = False  # dump mean/MSE images every batch
    log_level: str = "info"
    mesh: int = 0  # shard over N devices (0 = all available)
    checkpoint: str = ""  # resume/persist film state (.npz)
    # multi-host (one process per host, jax.distributed):
    coordinator: str = ""  # "host:port" of process 0 ("" = single-process)
    num_processes: int = 0  # total processes (0 = auto/env)
    process_id: int = -1  # this process's rank (-1 = auto/env)


def parse_args(argv=None) -> RunConfig:
    p = argparse.ArgumentParser(
        prog="dtpt-render",
        description="TPU-native path tracer (capability parity with the "
        "dmt-megakernel / dmt-tracer reference CLIs)",
    )
    d = RunConfig()
    p.add_argument("--scene", default=d.scene, help="'cornell' or scene file path")
    p.add_argument("--out", default=d.out, help="output PNG path")
    p.add_argument("--width", type=int, default=d.width)
    p.add_argument("--height", type=int, default=d.height)
    p.add_argument("--spp", type=int, default=d.spp)
    p.add_argument("--kspp", type=int, default=d.kspp, help="samples per batch")
    p.add_argument("--max-depth", type=int, default=d.max_depth)
    p.add_argument("--sampler", choices=["hash", "halton"], default=d.sampler)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--device", choices=["auto", "cpu", "tpu"], default=d.device)
    p.add_argument("--save-partial", action="store_true")
    p.add_argument("--log-level", default=d.log_level,
                   choices=["trace", "debug", "info", "warn", "error"])
    p.add_argument("--mesh", type=int, default=d.mesh,
                   help="shard pixels over N devices (0 = all)")
    p.add_argument("--checkpoint", default=d.checkpoint,
                   help="film checkpoint .npz to resume from / save to")
    p.add_argument("--coordinator", default=d.coordinator,
                   help="multi-host: host:port of process 0")
    p.add_argument("--num-processes", type=int, default=d.num_processes,
                   help="multi-host: total number of processes")
    p.add_argument("--process-id", type=int, default=d.process_id,
                   help="multi-host: this process's rank")
    a = p.parse_args(argv)
    return RunConfig(
        scene=a.scene, out=a.out, width=a.width, height=a.height, spp=a.spp,
        kspp=a.kspp, max_depth=a.max_depth, sampler=a.sampler, seed=a.seed,
        device=a.device, save_partial=a.save_partial, log_level=a.log_level,
        mesh=a.mesh, checkpoint=a.checkpoint, coordinator=a.coordinator,
        num_processes=a.num_processes, process_id=a.process_id,
    )
