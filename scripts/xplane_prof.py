"""Profile a render leg on the real chip and parse the xplane by hand.

Executes the r4 VERDICT lead: `jax.profiler.trace` works through the
axon tunnel (xplane.pb lands locally); tensorflow's bundled
`xplane_pb2` parses it, splitting true device-busy time per op from
host/tunnel skew. Prints the top device ops by total self time plus the
line-level split (traversal kernels vs XLA fusions vs sort).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/xplane_prof.py \
      [mesh|cornell|fwd_bwd] [--spp-per-pass N]
"""

import glob
import os
import shutil
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/xplane_trace"


def parse_xplane(trace_dir):
    """→ list of (plane_name, line_name, event_name, total_ps, count)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    out = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                agg = defaultdict(lambda: [0, 0])
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name][0] += ev.duration_ps
                    agg[name][1] += 1
                for name, (ps, cnt) in agg.items():
                    out.append((plane.name, line.name, name, ps, cnt))
    return out


def report(rows, min_ms=0.01):
    device_rows = [r for r in rows if "TPU" in r[0] or "/device" in r[0]]
    if not device_rows:
        print("--- no device plane found; plane names: ---")
        for p in sorted({r[0] for r in rows}):
            print("   ", p)
        device_rows = rows
    # per (plane, line) totals
    by_line = defaultdict(int)
    for p, l, n, ps, c in device_rows:
        by_line[(p, l)] += ps
    print("\n=== planes/lines (total ms) ===")
    for (p, l), ps in sorted(by_line.items(), key=lambda kv: -kv[1]):
        if ps / 1e9 >= min_ms:
            print(f"  {ps/1e9:10.3f} ms  {p} :: {l}")
    # classify the synchronous op timeline ("XLA Ops" line) by op kind
    def kind(n):
        body = n.split(" = ", 1)[1] if " = " in n else n
        for k in ("custom-call", "sort", "fusion", "dynamic-slice",
                  "dynamic-update-slice", "copy", "slice", "iota",
                  "reduce", "transpose", "convert", "bitcast", "scatter",
                  "gather", "select", "concatenate", "broadcast", "pad"):
            if body.startswith("(") and k in body.split("(", 2)[-1][:200]:
                continue
            if k in body[:200].split("(")[0] or f" {k}(" in body[:300]:
                return k
        return "other"

    sync = [r for r in device_rows if r[1] == "XLA Ops"]
    by_kind = defaultdict(lambda: [0, 0])
    for p, l, n, ps, c in sync:
        by_kind[kind(n)][0] += ps
        by_kind[kind(n)][1] += c
    print("\n=== XLA Ops line by kind ===")
    for k, (ps, c) in sorted(by_kind.items(), key=lambda kv: -kv[1][0]):
        print(f"  {ps/1e9:10.3f} ms  n={c:6d}  {k}")

    print("\n=== all custom-calls (XLA Ops line) ===")
    for p, l, n, ps, c in sorted(sync, key=lambda r: -r[3]):
        if kind(n) == "custom-call":
            print(f"  {ps/1e9:10.3f} ms  n={c:4d}  {n[:130]}")

    print("\n=== top ops by total time (XLA Ops line) ===")
    for p, l, n, ps, c in sorted(sync, key=lambda r: -r[3])[:30]:
        if ps / 1e9 >= min_ms:
            print(f"  {ps/1e9:10.3f} ms  n={c:6d}  {n[:120]}")


def run_mesh(spp_per_pass=16, kspp=16, subdiv=64):
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render_progressive,
    )
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
    from cuda_optix_pathtracing_tpu.ops.film import film_new
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh

    w = h = 256
    scene = cornell_box_mesh(w, h, subdiv=subdiv)
    cfg = MegakernelConfig(
        max_depth=5, remat=False, fused="off",
        features=mat_features_from_table(scene.materials),
    )
    film = film_new(h, w)
    film = render_progressive(
        scene, film, cfg, w, h, jnp.uint32(0), kspp, spp_per_pass
    )
    film.mean.block_until_ready()

    t0 = time.perf_counter()
    film = render_progressive(
        scene, film, cfg, w, h, jnp.uint32(kspp), kspp, spp_per_pass
    )
    film.mean.block_until_ready()
    wall_unprof = time.perf_counter() - t0

    with jax.profiler.trace(TRACE_DIR):
        film = render_progressive(
            scene, film, cfg, w, h, jnp.uint32(2 * kspp), kspp, spp_per_pass
        )
        film.mean.block_until_ready()
    print(f"wall (unprofiled): {wall_unprof*1e3:.1f} ms for {kspp} spp "
          f"({w*h*kspp/wall_unprof/1e6:.2f} Mpaths/s)")
    return wall_unprof


def run_cornell():
    from cuda_optix_pathtracing_tpu.models.megakernel import (
        MegakernelConfig,
        render_progressive,
        resolve_fused,
    )
    from cuda_optix_pathtracing_tpu.ops.bsdf import mat_features_from_table
    from cuda_optix_pathtracing_tpu.ops.film import film_new
    from cuda_optix_pathtracing_tpu.scene import cornell_box

    w = h = 256
    kspp = 8
    scene = cornell_box(w, h)
    cfg = resolve_fused(scene, MegakernelConfig(
        max_depth=5, remat=False,
        features=mat_features_from_table(scene.materials),
    ))
    film = film_new(h, w)
    film = render_progressive(scene, film, cfg, w, h, jnp.uint32(0), kspp, 1)
    film.mean.block_until_ready()
    t0 = time.perf_counter()
    film = render_progressive(scene, film, cfg, w, h, jnp.uint32(8), kspp, 1)
    film.mean.block_until_ready()
    wall = time.perf_counter() - t0
    with jax.profiler.trace(TRACE_DIR):
        film = render_progressive(scene, film, cfg, w, h, jnp.uint32(16), kspp, 1)
        film.mean.block_until_ready()
    print(f"wall (unprofiled): {wall*1e3:.1f} ms for {kspp} spp "
          f"({w*h*kspp/wall/1e6:.2f} Mpaths/s)")


def run_sorted(subdiv=64, spp=16, depth=5):
    """Profile the r5 depth-sorted fused wavefront (one bounce kernel
    per depth + one XLA state co-sort between depths)."""
    from cuda_optix_pathtracing_tpu.models.megakernel_pallas import (
        trace_paths_fused_sorted,
    )
    from cuda_optix_pathtracing_tpu.ops.camera import (
        generate_rays,
        pixel_centers,
    )
    from cuda_optix_pathtracing_tpu.scene.procedural import cornell_box_mesh
    import cuda_optix_pathtracing_tpu.ops.rng as R

    w = h = 256
    scene = cornell_box_mesh(w, h, subdiv=subdiv)
    pix = jnp.tile(pixel_centers(w, h), (spp, 1))
    sample = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    px = pix[:, 0].astype(jnp.uint32)
    py = pix[:, 1].astype(jnp.uint32)
    sampler = R.Sampler("hash", 0)
    u1, u2 = sampler.sample_2d(px, py, sample, R.Dim.CAMERA_U)
    p_film = pix + jnp.stack([u1, u2], axis=-1)
    o, d = generate_rays(p_film, scene.cam_from_raster, scene.world_from_cam)
    f = jax.jit(lambda o, d: trace_paths_fused_sorted(
        scene, px, py, sample, o, d, max_depth=depth, rr_start_depth=2))
    r = f(o, d)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = f(o, d)
    r.block_until_ready()
    wall = time.perf_counter() - t0
    with jax.profiler.trace(TRACE_DIR):
        r = f(o, d)
        r.block_until_ready()
    n = o.shape[0]
    print(f"wall (unprofiled): {wall*1e3:.1f} ms for {spp} spp "
          f"({n/wall/1e6:.2f} Mpaths/s)")


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "mesh"
    spp = 16
    if "--spp-per-pass" in sys.argv:
        spp = int(sys.argv[sys.argv.index("--spp-per-pass") + 1])
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    os.makedirs(TRACE_DIR, exist_ok=True)
    if what == "mesh":
        run_mesh(spp_per_pass=spp)
    elif what == "cornell":
        run_cornell()
    elif what == "sorted":
        run_sorted(spp=spp)
    rows = parse_xplane(TRACE_DIR)
    report(rows)


if __name__ == "__main__":
    main()
