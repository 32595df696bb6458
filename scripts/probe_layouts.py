"""Probe: which dense-VMEM node/tri layout does Mosaic compile + run fastest?

Candidates for loading one node's 8-child boxes (48 f32) from a dense table:
  A. row-major (M, 48): dynamic sublane slice -> (1,48) -> reshape (6,8) -> transpose (8,6)
  B. col-major (48, M): dynamic lane slice -> (48,1), static sublane slices
  C. row-major, no transpose: reshape (6,8) then broadcast each (1,8) lane row
     against rays... (needs children in sublanes; skip if A works)

Run on TPU: python scripts/probe_layouts.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 512
ITERS = 2000


def kernel_a(tbl, idx, out):
    def body(i, acc):
        node = idx[i]
        row = tbl[pl.ds(node, 1), :]          # (1, 48) dynamic sublane
        t = row.reshape(6, 8).T               # (8, 6) children in sublanes
        return acc + t[:, 0:1] + t[:, 3:4]

    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((8, 1), jnp.float32))
    out[...] = jnp.broadcast_to(acc, (8, 128))


def kernel_b(tbl, idx, out):
    def body(i, acc):
        node = idx[i]
        col = tbl[:, pl.ds(node, 1)]          # (48, 1) dynamic lane
        return acc + col[0:8] + col[24:32]

    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((8, 1), jnp.float32))
    out[...] = jnp.broadcast_to(acc, (8, 128))


def kernel_scalar(tbl, idx, out):
    # scalar extracts from a dynamically sliced row (meta read pattern)
    def body(i, acc):
        node = idx[i]
        row = tbl[pl.ds(node, 1), :]          # (1, 48)
        s = row[0, 0] + row[0, 7] + row[0, 13] + row[0, 25]
        return acc + s

    acc = lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    out[...] = jnp.full((8, 128), acc)


def run(name, kern, tbl):
    idx = jnp.arange(ITERS, dtype=jnp.int32) % M
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        r = jax.jit(f)(tbl, idx)
        r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            r = jax.jit(f)(tbl, idx)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 10 / ITERS
        print(f"{name}: OK, {dt*1e9:.1f} ns/iter, checksum {float(r[0,0]):.3f}")
    except Exception as e:
        print(f"{name}: FAIL -> {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    tbl_row = jax.random.normal(key, (M, 48), jnp.float32)
    tbl_col = tbl_row.T.copy()
    run("A row+reshapeT", kernel_a, tbl_row)
    run("B col dynlane ", kernel_b, tbl_col)
    run("S scalar-extr ", kernel_scalar, tbl_row)
