"""Probe J/K: does making the NEXT iteration depend on the 8 any()
readbacks reproduce the real kernel's ~800ns/iter? And does a roll-OR
tree + single extract fix it?

J: node body; ptr carried; ptr += f(hitmask from 8 anys); next row index
   = stack[ptr] -> full serialization on readbacks.
K: same but hitmask from OR-roll tree + one element extract.
L: K + leaf mix 1/3 like G.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 210
ITERS = 1000


def slab_hits(row, o, inv, limit):
    hits = []
    for c in range(8):
        lox, loy, loz = row[0, c], row[0, 8 + c], row[0, 16 + c]
        hix, hiy, hiz = row[0, 24 + c], row[0, 32 + c], row[0, 40 + c]
        t0x = (lox - o[0]) * inv[0]
        t1x = (hix - o[0]) * inv[0]
        t0y = (loy - o[1]) * inv[1]
        t1y = (hiy - o[1]) * inv[1]
        t0z = (loz - o[2]) * inv[2]
        t1z = (hiz - o[2]) * inv[2]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), 1e-4))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), limit))
        hits.append(tn <= tf)
    return hits


def mask_8any(hits):
    m = jnp.int32(0)
    for c, h in enumerate(hits):
        m = m | (jnp.any(h).astype(jnp.int32) << c)
    return m


def mask_rolltree(hits):
    acc = jnp.zeros_like(hits[0], dtype=jnp.int32)
    for c, h in enumerate(hits):
        acc = acc | (h.astype(jnp.int32) << c)
    for s in (64, 32, 16, 8, 4, 2, 1):
        acc = acc | pltpu.roll(acc, s, axis=1)
    for s in (4, 2, 1):
        acc = acc | pltpu.roll(acc, s, axis=0)
    return acc[0, 0]


def mk(variant):
    def kern(meta, tbl, ox, oy, oz, ix, iy, iz, out, stack):
        o = (ox[...], oy[...], oz[...])
        inv = (ix[...], iy[...], iz[...])
        big = jnp.full((8, 128), 1e30, jnp.float32)
        stack[0] = 0

        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, ptr, t_b = c
            node = stack[jnp.maximum(ptr, 0) % 256] % M
            row = tbl[pl.ds(node, 1), :]
            hits = slab_hits(row, o, inv, t_b)
            if variant == "J":
                m = mask_8any(hits)
            else:
                m = mask_rolltree(hits)
            pc = meta[node * 16 + 8]
            new_ptr = ptr
            for k in range(8):
                ch = (pc >> (3 * k)) & 7
                w = meta[node * 16 + ch]
                wanted = (((m >> ch) & 1) > 0) & ((w & 63) != 0)
                stack[new_ptr % 256] = w >> 6
                new_ptr = new_ptr + wanted.astype(jnp.int32)
            new_ptr = jnp.where(new_ptr > ptr, ptr - 1, ptr + 1) + 1
            return i + 1, new_ptr % 200, t_b

        _, ptr, _ = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1), big))
        out[...] = jnp.full((8, 128), ptr.astype(jnp.float32))
    return kern


def run(name, kern):
    planes = [jax.random.normal(jax.random.PRNGKey(i), (8, 128), jnp.float32)
              for i in range(6)]
    tbl = jax.random.normal(jax.random.PRNGKey(9), (M, 128), jnp.float32)
    meta = (jnp.arange(M * 16, dtype=jnp.int32) % 97) + 1
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
    ))
    r = f(meta, tbl, *planes); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(meta, tbl, *planes)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10 / ITERS
    print(f"{name}: {dt*1e9:7.1f} ns/iter")


if __name__ == "__main__":
    for v in "JK":
        try:
            run(v, mk(v))
        except Exception as e:
            print(f"{v}: FAIL {str(e)[:200]}")
