"""Separate dispatch overhead from device time: repeat each op K times
inside one jit (data-dependent chain, so XLA can't elide), subtract.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cuda_optix_pathtracing_tpu.ops.rng as R

N = 65536
U32 = jnp.uint32
K = 32


def bench(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:9.4f} ms   ({dt*1e3/K:.4f} ms/op)")
    return out


x = jnp.ones((N,), jnp.float32)

bench("K x trivial add", lambda x: lax.scan(lambda c, _: (c + 1.0, None), x, None, length=K)[0], x)

px = jnp.arange(N, dtype=U32)
py = px ^ U32(1234)


def hash12(c, _):
    acc = c
    for d in range(12):
        u, v = R.hash_sample_2d(px, py, c[0].astype(U32), U32(d))
        acc = acc + u + v
    return acc, None


bench("K x (12x pcg4d 2d)", lambda x: lax.scan(hash12, x, None, length=K)[0], x)

# gathers
M = 8
table = [jax.random.normal(jax.random.PRNGKey(i), (M,)) for i in range(12)]
table3 = [jax.random.normal(jax.random.PRNGKey(100 + i), (M, 3)) for i in range(4)]
idx0 = jax.random.randint(jax.random.PRNGKey(7), (N,), 0, M)


def gath(c, _):
    idx = (idx0 + c[0].astype(jnp.int32)) % M
    outs = [f[idx] for f in table] + [jnp.sum(f[idx], -1) for f in table3]
    return c + sum(outs), None


bench("K x gather-16-fields", lambda x: lax.scan(gath, x, None, length=K)[0], x)


def gath_oh(c, _):
    idx = (idx0 + c[0].astype(jnp.int32)) % M
    oh = jax.nn.one_hot(idx, M, dtype=jnp.float32)
    flat = jnp.concatenate([jnp.stack(table, axis=1)] + table3, axis=1)
    g = oh @ flat
    return c + jnp.sum(g, -1), None


bench("K x gather-onehot", lambda x: lax.scan(gath_oh, x, None, length=K)[0], x)

# intersection
T = 32
tri = jax.random.normal(jax.random.PRNGKey(3), (T, 3, 3))
v0, e0, e1 = tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
o3 = jax.random.normal(jax.random.PRNGKey(4), (N, 3))
d3 = jax.random.normal(jax.random.PRNGKey(5), (N, 3))

from scripts_mt import mt_matmul  # noqa


def loop_mt(c, _):
    t_best, i_best = mt_matmul(o3 + c[:, None] * 1e-9, d3, v0, e0, e1)
    return c + t_best * 1e-9, None


bench("K x MT matmul T=32", lambda x: lax.scan(loop_mt, x, None, length=K)[0], x)

from cuda_optix_pathtracing_tpu.ops.intersect_pallas import intersect_closest_pallas


def loop_mtp(c, _):
    h = intersect_closest_pallas(o3 + c[:, None] * 1e-9, d3, v0, e0, e1)
    return c + h.t * 1e-9, None


bench("K x MT pallas T=32", lambda x: lax.scan(loop_mtp, x, None, length=K)[0], x)

T2 = 1024
tri2 = jax.random.normal(jax.random.PRNGKey(13), (T2, 3, 3))
v0b, e0b, e1b = tri2[:, 0], tri2[:, 1] - tri2[:, 0], tri2[:, 2] - tri2[:, 0]


def loop_mt_big(c, _):
    t_best, i_best = mt_matmul(o3 + c[:, None] * 1e-9, d3, v0b, e0b, e1b)
    return c + t_best * 1e-9, None


def loop_mtp_big(c, _):
    h = intersect_closest_pallas(o3 + c[:, None] * 1e-9, d3, v0b, e0b, e1b)
    return c + h.t * 1e-9, None


bench("K x MT matmul T=1024", lambda x: lax.scan(loop_mt_big, x, None, length=K)[0], x, iters=5)
bench("K x MT pallas T=1024", lambda x: lax.scan(loop_mtp_big, x, None, length=K)[0], x, iters=5)
