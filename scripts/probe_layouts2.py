"""Isolate the failing op: dynamic sublane slice / reshape / transpose / dyn lane."""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 512
ITERS = 1000


def mk(kern, tbl_shape):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def trial(name, kern, tbl):
    idx = jnp.arange(ITERS, dtype=jnp.int32) % M
    try:
        f = jax.jit(mk(kern, tbl.shape))
        r = f(tbl, idx)
        r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(tbl, idx)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 10 / ITERS
        print(f"{name}: OK {dt*1e9:.1f} ns/it")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:400]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# 1. dyn sublane slice only, sum to scalar-ish vector
def k1(tbl, idx, out):
    def body(i, acc):
        row = tbl[pl.ds(idx[i], 1), :]  # (1,48)
        return acc + jnp.sum(row)
    acc = lax.fori_loop(0, ITERS, body, jnp.float32(0))
    out[...] = jnp.full((8, 128), acc)


# 2. + reshape (1,48)->(6,8)
def k2(tbl, idx, out):
    def body(i, acc):
        row = tbl[pl.ds(idx[i], 1), :].reshape(6, 8)
        return acc + jnp.sum(row[0:1, :])
    acc = lax.fori_loop(0, ITERS, body, jnp.float32(0))
    out[...] = jnp.full((8, 128), acc)


# 3. + transpose
def k3(tbl, idx, out):
    def body(i, acc):
        t = tbl[pl.ds(idx[i], 1), :].reshape(6, 8).T
        return acc + jnp.sum(t[:, 0:1])
    acc = lax.fori_loop(0, ITERS, body, jnp.float32(0))
    out[...] = jnp.full((8, 128), acc)


# 4. vector accumulator (8,1) w/o any table access
def k4(tbl, idx, out):
    def body(i, acc):
        return acc + jnp.float32(1.0)
    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((8, 1), jnp.float32))
    out[...] = jnp.broadcast_to(acc, (8, 128))


# 5. dyn-lane slice (48,M) summed
def k5(tbl, idx, out):
    def body(i, acc):
        col = tbl[:, pl.ds(idx[i], 1)]  # (48,1)
        return acc + jnp.sum(col)
    acc = lax.fori_loop(0, ITERS, body, jnp.float32(0))
    out[...] = jnp.full((8, 128), acc)


# 6. broadcast lane-slices against rays, no transpose:
#    row (1,48); child c box comp via static lane scalars? -> per-child scalar
def k6(tbl, idx, out):
    def body(i, acc):
        row = tbl[pl.ds(idx[i], 1), :]  # (1,48)
        s = jnp.zeros((1, 128), jnp.float32)
        for c in range(8):
            s = s + row[0, c] * 0.5 + row[0, 24 + c]
        return acc + s
    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((1, 128), jnp.float32))
    out[...] = jnp.broadcast_to(acc, (8, 128))


if __name__ == "__main__":
    tbl_row = jax.random.normal(jax.random.PRNGKey(0), (M, 48), jnp.float32)
    tbl_col = tbl_row.T.copy()
    trial("1 dynsub       ", k1, tbl_row)
    trial("2 +reshape     ", k2, tbl_row)
    trial("3 +transpose   ", k3, tbl_row)
    trial("4 vec-acc      ", k4, tbl_row)
    trial("5 dynlane      ", k5, tbl_col)
    trial("6 scalar-bcast ", k6, tbl_row)
