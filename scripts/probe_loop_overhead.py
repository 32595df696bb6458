"""Decompose the per-iteration overhead of the traversal loop shape.

Variants (all walk a scripted 1000-step sequence, vector work = 1 slab):
  A: fori_loop + slab + 8x jnp.any readbacks + hitmask  (probe3 shape)
  B: while_loop instead of fori
  C: B + lax.cond(leaf/node) with dummy leaf body
  D: C + SMEM stack push/pop
  E: D + 16 SMEM meta reads + push loop  (== full node body)
  F: E but hitmask from ONE any (combined bits) instead of 8
"""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 210
ITERS = 1000


def slab8(row, o, inv, limit):
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
        hits.append((tn, tf))
    return hits


def mask_8any(hits):
    m = jnp.int32(0)
    for c, (tn, tf) in enumerate(hits):
        m = m | (jnp.any(tn <= tf).astype(jnp.int32) << c)
    return m


def mask_1any(hits):
    acc = jnp.zeros_like(hits[0][0], dtype=jnp.int32)
    for c, (tn, tf) in enumerate(hits):
        acc = acc | ((tn <= tf).astype(jnp.int32) << c)
    # OR across rays == max per bit? Not exactly; use sum of per-bit max.
    # Approximate with one max readback (upper bound on usefulness).
    return jnp.max(acc)


def run(name, kern, extra_scratch=()):
    planes = [jax.random.normal(jax.random.PRNGKey(i), (8, 128), jnp.float32)
              for i in range(6)]
    tbl = jax.random.normal(jax.random.PRNGKey(9), (M, 128), jnp.float32)
    meta = (jnp.arange(M * 16, dtype=jnp.int32) % 97) + 1
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32)] ,
    )
    jf = jax.jit(f)
    r = jf(meta, tbl, *planes); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = jf(meta, tbl, *planes)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10 / ITERS
    print(f"{name}: {dt*1e9:7.1f} ns/iter")


def mk_kernel(variant):
    def kern(meta, tbl, ox, oy, oz, ix, iy, iz, out, stack):
        o = (ox[...], oy[...], oz[...])
        inv = (ix[...], iy[...], iz[...])
        limit = jnp.full((8, 128), 1e30, jnp.float32)

        if variant == "A":
            def body(i, acc):
                row = tbl[pl.ds(i % M, 1), :]
                m = mask_8any(slab8(row, o, inv, limit))
                return acc + m
            acc = lax.fori_loop(0, ITERS, body, jnp.int32(0))
            out[...] = jnp.full((8, 128), acc.astype(jnp.float32))
            return

        stack[0] = 0

        def node_work(i):
            row = tbl[pl.ds(i % M, 1), :]
            return mask_8any(slab8(row, o, inv, limit))

        if variant == "B":
            def cond(c):
                return c[0] < ITERS
            def body(c):
                i, acc = c
                return i + 1, acc + node_work(i)
            _, acc = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        elif variant in ("C", "D", "E", "F"):
            def leaf_body(i, acc):
                return acc + 1
            def node_body(i, acc):
                row = tbl[pl.ds(i % M, 1), :]
                hits = slab8(row, o, inv, limit)
                if variant == "F":
                    m = mask_1any(hits)
                else:
                    m = mask_8any(hits)
                if variant in ("D", "E", "F"):
                    stack[(i + 1) % 256] = m
                    _ = stack[i % 256]
                if variant in ("E", "F"):
                    node = i % M
                    pc = meta[node * 16 + 8]
                    for k in range(8):
                        ch = (pc >> (3 * k)) & 7
                        w = meta[node * 16 + ch]
                        code = w & 63
                        payload = lax.shift_right_logical(w, 6)
                        wanted = (((m >> ch) & 1) > 0) & (code != 0)
                        stack[(i + k) % 256] = jnp.where(code == 2, -payload, payload)
                        _ = wanted
                return acc + m
            def cond(c):
                return c[0] < ITERS
            def body(c):
                i, acc = c
                acc = lax.cond(i % 7 == 6, leaf_body, node_body, i, acc)
                return i + 1, acc
            _, acc = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        out[...] = jnp.full((8, 128), acc.astype(jnp.float32))
    return kern


if __name__ == "__main__":
    for v in "ABCDEF":
        try:
            run(v, mk_kernel(v))
        except Exception as e:
            print(f"{v}: FAIL {str(e)[:160]}")
