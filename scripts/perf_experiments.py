"""Micro-experiments for the three suspected bottlenecks:

1. table gather via advanced indexing vs one-hot matmul
2. pcg4d hash cost, single vs batched dims
3. Möller-Trumbore as MXU matmul vs the Pallas scalar-loop kernel
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(name, fn, *args, iters=50):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.4f} ms")
    return out


N = 65536
M = 8  # materials
key = jax.random.PRNGKey(0)

# ---- 1. gather styles --------------------------------------------------
table = [jax.random.normal(jax.random.PRNGKey(i), (M,)) for i in range(12)]
table3 = [jax.random.normal(jax.random.PRNGKey(100 + i), (M, 3)) for i in range(4)]
idx = jax.random.randint(jax.random.PRNGKey(7), (N,), 0, M)


def gather_indexing(idx):
    outs = [f[idx] for f in table] + [f[idx] for f in table3]
    return sum(jnp.sum(o) for o in outs)


def gather_onehot(idx):
    oh = jax.nn.one_hot(idx, M, dtype=jnp.float32)  # (N, M)
    flat = jnp.concatenate([jnp.stack(table, axis=1)] + table3, axis=1)  # (M, F)
    g = oh @ flat  # (N, F)
    return jnp.sum(g)


bench("gather: advanced indexing (16 fields)", gather_indexing, idx)
bench("gather: one-hot matmul", gather_onehot, idx)

# ---- 2. hash costs ------------------------------------------------------
U32 = jnp.uint32
px = jnp.arange(N, dtype=U32)
py = px ^ U32(1234)


def pcg4d_sum(px, py):
    import cuda_optix_pathtracing_tpu.ops.rng as R

    acc = 0.0
    for d in range(12):
        u, v = R.hash_sample_2d(px, py, U32(3), U32(d))
        acc = acc + u + v
    return acc


bench("12x pcg4d 2d", pcg4d_sum, px, py)


def pcg4d_wide(px, py):
    # one hash per 4 outputs: use all four outputs of pcg4d
    import cuda_optix_pathtracing_tpu.ops.rng as R

    acc = 0.0
    for d in range(6):
        x, y, z, w = R.pcg4d(px, py, U32(3), U32(d))
        acc = (
            acc
            + R.u32_to_float01(x)
            + R.u32_to_float01(y)
            + R.u32_to_float01(z)
            + R.u32_to_float01(w)
        )
    return acc


bench("6x pcg4d 4-wide (same 24 floats)", pcg4d_wide, px, py)

# ---- 3. intersection styles --------------------------------------------
T = 32
tri = jax.random.normal(jax.random.PRNGKey(3), (T, 3, 3))
v0, e0, e1 = tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
o = jax.random.normal(jax.random.PRNGKey(4), (N, 3))
d = jax.random.normal(jax.random.PRNGKey(5), (N, 3))


def mt_matmul(o, d, v0, e0, e1):
    """MT via bilinear decomposition → one (N,10)@(10,4T) matmul.

    det  =  d·m1              m1 = e1×e0  (sign: det = (d×e1)·e0)
    u*det = (o×d)·e1 + d·(e1×v0)
    v*det = -(o×d)·e0 + d·(v0×e0) ... signs verified numerically below
    t*det = -o·m1 + v0·m1
    """
    c = jnp.cross(o, d)  # (N,3)
    one = jnp.ones((o.shape[0], 1), o.dtype)
    F = jnp.concatenate([o, d, c, one], axis=1)  # (N,10)

    m1 = jnp.cross(e1, e0)  # (T,3)
    zero3 = jnp.zeros_like(v0)
    zero1 = jnp.zeros((v0.shape[0],))
    # coefficient blocks (10,) per tri per output
    det_c = jnp.concatenate([zero3, m1, zero3, zero1[:, None]], axis=1)  # (T,10)
    u_c = jnp.concatenate(
        [zero3, jnp.cross(e1, v0), e1, zero1[:, None]], axis=1
    )
    v_c = jnp.concatenate(
        [zero3, jnp.cross(v0, e0), -e0, zero1[:, None]], axis=1
    )
    t_c = jnp.concatenate(
        [-m1, zero3, zero3, jnp.sum(v0 * m1, axis=1)[:, None]], axis=1
    )
    G = jnp.concatenate([det_c, u_c, v_c, t_c], axis=0)  # (4T,10)
    out = F @ G.T  # (N,4T)
    det, u_n, v_n, t_n = (
        out[:, :T],
        out[:, T : 2 * T],
        out[:, 2 * T : 3 * T],
        out[:, 3 * T :],
    )
    parallel = jnp.abs(det) < 1e-7
    inv = 1.0 / jnp.where(parallel, 1.0, det)
    u = u_n * inv
    v = v_n * inv
    t = t_n * inv
    valid = (
        (~parallel)
        & (u >= -1e-7)
        & (v >= -1e-7)
        & (u + v <= 1.0 + 1e-7)
        & (t > 1e-4)
    )
    t = jnp.where(valid, t, 3e38)
    i_best = jnp.argmin(t, axis=1)
    t_best = jnp.min(t, axis=1)
    return t_best, i_best


def mt_ref(o, d, v0, e0, e1):
    from cuda_optix_pathtracing_tpu.ops.intersect import intersect_closest

    h = intersect_closest(o, d, v0, e0, e1, chunk=T)
    return h.t, h.tri


def mt_pallas(o, d, v0, e0, e1):
    from cuda_optix_pathtracing_tpu.ops.intersect_pallas import (
        intersect_closest_pallas,
    )

    h = intersect_closest_pallas(o, d, v0, e0, e1)
    return h.t, h.tri


tb_m, ib_m = bench("MT matmul (N=65536, T=32)", mt_matmul, o, d, v0, e0, e1)
tb_p, ib_p = bench("MT pallas", mt_pallas, o, d, v0, e0, e1)
tb_r, ib_r = bench("MT xla sweep", mt_ref, o, d, v0, e0, e1)

hit_m = tb_m < 1e30
hit_r = tb_r < 1e30
agree = jnp.mean((hit_m == hit_r).astype(jnp.float32))
terr = jnp.max(jnp.where(hit_m & hit_r, jnp.abs(tb_m - tb_r), 0.0))
print(f"matmul-vs-ref: hit agreement {float(agree):.6f}, max |dt| {float(terr):.3e}")

# bigger T
T2 = 1024
tri2 = jax.random.normal(jax.random.PRNGKey(13), (T2, 3, 3))
v0b, e0b, e1b = tri2[:, 0], tri2[:, 1] - tri2[:, 0], tri2[:, 2] - tri2[:, 0]
bench("MT matmul (T=1024)", mt_matmul, o, d, v0b, e0b, e1b, iters=20)
bench("MT pallas (T=1024)", mt_pallas, o, d, v0b, e0b, e1b, iters=20)
