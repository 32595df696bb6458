"""Probe 3: SMEM input capacity, dynamic scalar extract, scalar-broadcast slab cost."""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def trial(name, fn):
    try:
        dt = fn()
        print(f"{name}: OK {dt}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:250]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def smem_cap(n_words):
    def k(tbl, out):
        out[...] = jnp.full((8, 128), tbl[0] + tbl[n_words - 1])

    def run():
        tbl = jnp.arange(n_words, dtype=jnp.int32)
        r = jax.jit(pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))(tbl)
        r.block_until_ready()
        return f"{n_words*4//1024}KB"
    return run


def dyn_extract():
    # row (1,128) loaded from VMEM, extract at traced lane index
    def k(tbl, idx, out):
        def body(i, acc):
            row = tbl[pl.ds(idx[i] % 16, 1), :]
            j = idx[i] % 120
            return acc + row[0, j]
        acc = lax.fori_loop(0, 1000, body, jnp.float32(0))
        out[...] = jnp.full((8, 128), acc)

    tbl = jax.random.normal(jax.random.PRNGKey(0), (16, 128), jnp.float32)
    idx = jnp.arange(1000, dtype=jnp.int32)
    f = jax.jit(pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    r = f(tbl, idx); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(tbl, idx)
    r.block_until_ready()
    return f"{(time.perf_counter()-t0)/10/1000*1e9:.1f} ns/extract-iter"


def smem_dyn_read():
    # fully dynamic SMEM read in a loop (node meta pattern)
    def k(tbl, idx, out):
        def body(i, acc):
            base = (idx[i] % 512) * 64
            s = jnp.float32(0)
            for j in range(16):
                s = s + tbl[base + j].astype(jnp.float32)
            return acc + s
        acc = lax.fori_loop(0, 1000, body, jnp.float32(0))
        out[...] = jnp.full((8, 128), acc)

    tbl = jnp.arange(512 * 64, dtype=jnp.int32) % 97
    idx = jnp.arange(1000, dtype=jnp.int32)
    f = jax.jit(pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    r = f(tbl, idx); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(tbl, idx)
    r.block_until_ready()
    return f"{(time.perf_counter()-t0)/10/1000*1e9:.1f} ns per 16-scalar-read iter"


def slab_scalar_bcast():
    # full slab test, scalar-broadcast form: 8 children x (8,128) rays
    def k(boxf, idx, ox, oy, oz, ix, iy, iz, out):
        def body(i, acc):
            base = (idx[i] % 512) * 48
            hits = jnp.int32(0)
            for c in range(8):
                lox = boxf[base + c]
                loy = boxf[base + 8 + c]
                loz = boxf[base + 16 + c]
                hix = boxf[base + 24 + c]
                hiy = boxf[base + 32 + c]
                hiz = boxf[base + 40 + c]
                t0x = (lox - ox[...]) * ix[...]
                t1x = (hix - ox[...]) * ix[...]
                t0y = (loy - oy[...]) * iy[...]
                t1y = (hiy - oy[...]) * iy[...]
                t0z = (loz - oz[...]) * iz[...]
                t1z = (hiz - oz[...]) * iz[...]
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
                hit = jnp.any(tn <= tf)
                hits = hits | (hit.astype(jnp.int32) << c)
            return acc + hits
        acc = lax.fori_loop(0, 1000, body, jnp.int32(0))
        out[...] = jnp.full((8, 128), acc)

    key = jax.random.PRNGKey(1)
    boxf = jax.random.normal(key, (512 * 48,), jnp.float32)
    idx = jnp.arange(1000, dtype=jnp.int32)
    planes = [jax.random.normal(jax.random.PRNGKey(i), (8, 128), jnp.float32) for i in range(6)]
    f = jax.jit(pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    r = f(boxf, idx, *planes); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(boxf, idx, *planes)
    r.block_until_ready()
    return f"{(time.perf_counter()-t0)/10/1000*1e9:.1f} ns per node-pop (8child x 1024rays)"


def tri_extract_mt():
    # leaf block: load (1,128) row, 72 static extracts, 8x MT on (8,128)
    def k(tri, idx, ox, oy, oz, dx, dy, dz, out):
        def body(i, acc):
            row = tri[pl.ds(idx[i] % 512, 1), :]
            tmin = jnp.full((8, 128), 1e30, jnp.float32)
            for c in range(8):
                v0x = row[0, c]; v0y = row[0, 8 + c]; v0z = row[0, 16 + c]
                e0x = row[0, 24 + c]; e0y = row[0, 32 + c]; e0z = row[0, 40 + c]
                e1x = row[0, 48 + c]; e1y = row[0, 56 + c]; e1z = row[0, 64 + c]
                px = dy[...] * e1z - dz[...] * e1y
                py = dz[...] * e1x - dx[...] * e1z
                pz = dx[...] * e1y - dy[...] * e1x
                det = px * e0x + py * e0y + pz * e0z
                inv = 1.0 / jnp.where(jnp.abs(det) < 1e-7, 1.0, det)
                tx = ox[...] - v0x; ty = oy[...] - v0y; tz = oz[...] - v0z
                qx = ty * e0z - tz * e0y
                qy = tz * e0x - tx * e0z
                qz = tx * e0y - ty * e0x
                u = inv * (px * tx + py * ty + pz * tz)
                v = inv * (qx * dx[...] + qy * dy[...] + qz * dz[...])
                t = inv * (qx * e1x + qy * e1y + qz * e1z)
                ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 1e-4)
                tmin = jnp.minimum(tmin, jnp.where(ok, t, 1e30))
            return jnp.minimum(acc, tmin)
        acc = lax.fori_loop(0, 1000, body, jnp.full((8, 128), 1e30, jnp.float32))
        out[...] = acc

    tri = jax.random.normal(jax.random.PRNGKey(2), (512, 128), jnp.float32)
    idx = jnp.arange(1000, dtype=jnp.int32)
    planes = [jax.random.normal(jax.random.PRNGKey(i), (8, 128), jnp.float32) for i in range(6)]
    f = jax.jit(pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    r = f(tri, idx, *planes); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(tri, idx, *planes)
    r.block_until_ready()
    return f"{(time.perf_counter()-t0)/10/1000*1e9:.1f} ns per 8tri x 1024ray block"


if __name__ == "__main__":
    trial("smem 64KB ", smem_cap(16 * 1024))
    trial("smem 256KB", smem_cap(64 * 1024))
    trial("smem 1MB  ", smem_cap(256 * 1024))
    trial("dyn lane extract", dyn_extract)
    trial("smem 16-scalar read", smem_dyn_read)
    trial("slab scalar-bcast", slab_scalar_bcast)
    trial("tri extract+MT", tri_extract_mt)
