"""Probe G/H/I: realistic traversal iterations with vector carries.

G: closest-mode — carry (i, t_best(8,128), i_best), leaf = 4 blocks x 8
   tris sequential t_best update; node = slab8 with limit=t_best.
H: G but per-block min-tree before one t_best update.
I: G without lax.cond (node only, fori) — isolates cond+carry cost.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 210
B = 512
ITERS = 1000


def slab8(row, o, inv, limit):
    m = jnp.int32(0)
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
        m = m | (jnp.any(tn <= tf).astype(jnp.int32) << c)
    return m


def mt8(row, o, d, c):
    v0x, v0y, v0z = row[0, c], row[0, 8 + c], row[0, 16 + c]
    e0x, e0y, e0z = row[0, 24 + c], row[0, 32 + c], row[0, 40 + c]
    e1x, e1y, e1z = row[0, 48 + c], row[0, 56 + c], row[0, 64 + c]
    px = d[1] * e1z - d[2] * e1y
    py = d[2] * e1x - d[0] * e1z
    pz = d[0] * e1y - d[1] * e1x
    det = px * e0x + py * e0y + pz * e0z
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-7, 1.0, det)
    tx = o[0] - v0x
    ty = o[1] - v0y
    tz = o[2] - v0z
    qx = ty * e0z - tz * e0y
    qy = tz * e0x - tx * e0z
    qz = tx * e0y - ty * e0x
    u = inv_det * (px * tx + py * ty + pz * tz)
    v = inv_det * (qx * d[0] + qy * d[1] + qz * d[2])
    t = inv_det * (qx * e1x + qy * e1y + qz * e1z)
    ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 1e-4)
    return ok, t


def mk(variant):
    def kern(meta, tbl, tri, ox, oy, oz, ix, iy, iz, out, stack):
        o = (ox[...], oy[...], oz[...])
        inv = (ix[...], iy[...], iz[...])
        d = inv  # reuse as fake dirs
        big = jnp.full((8, 128), 1e30, jnp.float32)
        zi = jnp.zeros((8, 128), jnp.int32)
        stack[0] = 0

        def leaf_body(i, t_b, i_b):
            base = (i * 4) % (B - 4)
            for blk in range(4):
                row = tri[pl.ds(base + blk, 1), :]
                if variant == "H":
                    ts = []
                    for c in range(8):
                        ok, t = mt8(row, o, d, c)
                        ts.append((jnp.where(ok, t, 1e30), base * 8 + blk * 8 + c))
                    while len(ts) > 1:
                        nxt = []
                        for j in range(0, len(ts), 2):
                            ta, ia = ts[j]
                            tb, ib = ts[j + 1]
                            sel = ta <= tb
                            nxt.append((jnp.minimum(ta, tb),
                                        jnp.where(sel, ia, ib)))
                        ts = nxt
                    t_blk, i_blk = ts[0]
                    better = t_blk < t_b
                    t_b = jnp.where(better, t_blk, t_b)
                    i_b = jnp.where(better, i_blk, i_b)
                else:
                    for c in range(8):
                        ok, t = mt8(row, o, d, c)
                        better = ok & (t < t_b)
                        t_b = jnp.where(better, t, t_b)
                        i_b = jnp.where(better, base * 8 + blk * 8 + c, i_b)
            return t_b, i_b

        def node_body(i, t_b, i_b):
            node = i % M
            row = tbl[pl.ds(node, 1), :]
            m = slab8(row, o, inv, t_b)
            pc = meta[node * 16 + 8]
            for k in range(8):
                ch = (pc >> (3 * k)) & 7
                w = meta[node * 16 + ch]
                stack[(i + k) % 256] = jnp.where((w & 63) == 2, -(w >> 6), w >> 6)
            _ = m
            return t_b, i_b

        if variant == "I":
            def body(i, c):
                t_b, i_b = c
                return node_body(i, t_b, i_b)
            t_b, i_b = lax.fori_loop(0, ITERS, body, (big, zi))
        else:
            def cond(c):
                return c[0] < ITERS
            def body(c):
                i, t_b, i_b = c
                t_b, i_b = lax.cond(
                    i % 3 == 2, leaf_body, node_body, i, t_b, i_b
                )
                return i + 1, t_b, i_b
            _, t_b, i_b = lax.while_loop(cond, body, (jnp.int32(0), big, zi))
        out[...] = t_b + i_b.astype(jnp.float32)
    return kern


def run(name, kern):
    planes = [jax.random.normal(jax.random.PRNGKey(i), (8, 128), jnp.float32)
              for i in range(6)]
    tbl = jax.random.normal(jax.random.PRNGKey(9), (M, 128), jnp.float32)
    tri = jax.random.normal(jax.random.PRNGKey(10), (B, 128), jnp.float32)
    meta = (jnp.arange(M * 16, dtype=jnp.int32) % 97) + 1
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
    ))
    r = f(meta, tbl, tri, *planes); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(meta, tbl, tri, *planes)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10 / ITERS
    print(f"{name}: {dt*1e9:7.1f} ns/iter")


if __name__ == "__main__":
    for v in "GHI":
        try:
            run(v, mk(v))
        except Exception as e:
            print(f"{v}: FAIL {str(e)[:200]}")
