"""Probe: cost of fetching 72 per-triangle scalars per block inside a
Mosaic kernel, by strategy. r5: the NO_EXTRACT experiment showed the 72
static lane extracts per MT block cost as much as the whole MT math on
bounce tiles (8.0 -> 14.0 Mrays/s when reduced to one) — this probe
compares fetch strategies in a loop shaped like the drain loop.

  A  load (1,128) row -> 72 vreg lane extracts (current kernel)
  B  72 broadcast_in_dim from (1,1) row slices (vector-domain splat)
  C  async-copy row VMEM->SMEM scratch, then 72 SMEM scalar reads
  D  direct ref scalar indexing tri[base, lane]

Each variant runs ITERS loop iterations; each iteration fetches 9x8
values of a pseudo-random block and consumes them in a cheap vector op.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

ROWS, LANES = 16, 128
B = 512
ITERS = 512


def kernel(variant, tri, out, *scratch):
    acc = jnp.zeros((ROWS, LANES), jnp.float32)

    def body(i, acc):
        base = (i * 40503) % B

        if variant == "A":
            row = tri[pl.ds(base, 1), :]
            vals = [row[0, c] for c in range(72)]
            s = vals[0]
            for v in vals[1:]:
                s = s + v
            return acc + s
        if variant == "B":
            row = tri[pl.ds(base, 1), :]
            s = None
            for c in range(72):
                bc = jnp.broadcast_to(row[0:1, c:c + 1], (ROWS, LANES))
                s = bc if s is None else s + bc
            return acc + s
        if variant == "C":
            smem, sem = scratch
            cp = pltpu.make_async_copy(
                tri.at[pl.ds(base, 1), :], smem, sem
            )
            cp.start()
            cp.wait()
            vals = [smem[0, c] for c in range(72)]
            s = vals[0]
            for v in vals[1:]:
                s = s + v
            return acc + s
        if variant == "D":
            vals = [tri[base, c] for c in range(72)]
            s = vals[0]
            for v in vals[1:]:
                s = s + v
            return acc + s
        raise ValueError(variant)

    acc = lax.fori_loop(0, ITERS, body, acc)
    out[...] = acc


def run(variant):
    tri = jnp.arange(B * LANES, dtype=jnp.float32).reshape(B, LANES)
    scratch = []
    if variant == "C":
        scratch = [
            pltpu.SMEM((1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    f = pl.pallas_call(
        functools.partial(kernel, variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        scratch_shapes=scratch,
    )
    g = jax.jit(lambda t: f(t))
    try:
        r = g(tri)
        r.block_until_ready()
    except Exception as e:
        print(f"  {variant}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        r = g(tri)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"  {variant}: {dt*1e6:8.1f} us total, {dt/ITERS*1e9:7.1f} ns/iter")


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["A", "B", "C", "D"]):
        run(v)
