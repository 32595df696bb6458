"""Probe: per-iteration cost of the roll-tree tile reduction + scalar
extract, in a loop whose next iteration DEPENDS on the extract (the
traversal loop's real shape: hitmask -> pushes -> next node).

Variants:
  roll11  7 lane rolls + 4 sublane rolls (the kernel's OR tree)
  roll7   lane rolls only (sublanes pre-ORed by strided adds? no - just
          measures lane-roll share; WRONG value, timing only)
  roll4   sublane rolls only
  mxu     f32 matvec reduce: (16,128)@(128,1) then (1,16)@(16,1)
  none    no reduction (extract of an un-reduced element; WRONG value)
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
ITERS = 512


def kernel(variant, seed, out):
    base = seed[...]

    def reduce_scalar(hm):
        if variant == "roll11":
            for shift in (64, 32, 16, 8, 4, 2, 1):
                hm = hm | pltpu.roll(hm, shift, 1)
            sub = 1
            while sub < ROWS:
                hm = hm | pltpu.roll(hm, sub, 0)
                sub *= 2
            return hm[0, 0]
        if variant == "roll7":
            for shift in (64, 32, 16, 8, 4, 2, 1):
                hm = hm | pltpu.roll(hm, shift, 1)
            return hm[0, 0]
        if variant == "roll4":
            sub = 1
            while sub < ROWS:
                hm = hm | pltpu.roll(hm, sub, 0)
                sub *= 2
            return hm[0, 0]
        if variant == "mxu":
            f = hm.astype(jnp.float32)
            col = jnp.dot(
                f, jnp.ones((LANES, 1), jnp.float32),
                preferred_element_type=jnp.float32,
            )  # (16,1)
            s = jnp.dot(
                jnp.ones((1, ROWS), jnp.float32), col,
                preferred_element_type=jnp.float32,
            )  # (1,1)
            return s[0, 0].astype(jnp.int32)
        if variant == "none":
            return hm[0, 0]
        raise ValueError(variant)

    def body(i, carry):
        # one cheap vector op standing in for the slab test, seeded by
        # the previous iteration's scalar (the real dependency shape)
        hm = base + carry
        s = reduce_scalar(hm)
        return jnp.zeros((ROWS, LANES), jnp.int32) + (s & 7)

    s = lax.fori_loop(0, ITERS, body, jnp.zeros((ROWS, LANES), jnp.int32))
    out[...] = s + base


def run(variant):
    seed = jnp.ones((ROWS, LANES), jnp.int32)
    f = pl.pallas_call(
        functools.partial(kernel, variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
    )
    g = jax.jit(lambda t: f(t))
    try:
        r = g(seed)
        r.block_until_ready()
    except Exception as e:
        print(f"  {variant}: FAILED {type(e).__name__}: {str(e)[:150]}")
        return
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        r = g(seed)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"  {variant}: {dt/ITERS*1e9:7.1f} ns/iter")





# ---- body-size scaling probe: K MT-block-equivalents per iteration ----
def kernel_bloat(k_blocks, tri, seed, out):
    import cuda_optix_pathtracing_tpu.ops.bvh_pallas as BP
    base = seed[...]
    o = (base * 0.5, base * 0.25, base * 0.125)
    d = (base * 1.0, base * 0.5, base * 0.25)

    def body(i, carry):
        hm = (base + carry).astype(jnp.int32)
        for shift in (64, 32, 16, 8, 4, 2, 1):
            hm = hm | pltpu.roll(hm, shift, 1)
        sub = 1
        while sub < ROWS:
            hm = hm | pltpu.roll(hm, sub, 0)
            sub *= 2
        s = hm[0, 0]
        acc = carry
        for kb in range(k_blocks):
            row_id = (s + kb) & 3
            ok, t, u, v = BP._mt_rows8(
                o, d, lambda lane: tri[row_id, lane])
            m = t[0]
            for tt in t[1:]:
                m = jnp.minimum(m, tt)
            acc = jnp.minimum(acc, m)
        return acc + (s & 1).astype(jnp.float32)

    out[...] = lax.fori_loop(
        0, ITERS, body, jnp.zeros((ROWS, LANES), jnp.float32))


def run_bloat(k):
    tri = jnp.ones((8, LANES), jnp.float32)
    seed = jnp.ones((ROWS, LANES), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel_bloat, k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )
    g = jax.jit(lambda a, b: f(a, b))
    try:
        r = g(tri, seed); r.block_until_ready()
    except Exception as e:
        print(f"  bloat K={k}: FAILED {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(tri, seed)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"  bloat K={k}: {dt/ITERS*1e9:8.1f} ns/iter")


if __name__ == "__main__":
    if sys.argv[1:] and sys.argv[1] == "bloat":
        for k in (0, 1, 2, 4, 8, 16):
            run_bloat(k)
    else:
        for v in (sys.argv[1:] or ["roll11", "roll7", "roll4", "mxu", "none"]):
            run(v)
