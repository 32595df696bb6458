"""Which vector layout is fastest for shading-style math on this TPU?

Compares one shading-ish workload (chained cross/dot/normalize/select) in:
  a) AoS (N,3) arrays, reductions over axis -1
  b) V3 of rank-1 (N,) components
  c) V3 of rank-2 (R,128) components (lane-major planes)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
R = N // 128


def chain_aos(a, b):
    def dot(x, y):
        return jnp.sum(x * y, axis=-1, keepdims=True)

    def cross(x, y):
        return jnp.cross(x, y)

    acc = a
    for _ in range(8):
        c = cross(acc, b)
        d = dot(c, a)
        n = c / jnp.sqrt(jnp.maximum(jnp.sum(c * c, -1, keepdims=True), 1e-20))
        acc = jnp.where(d > 0.0, n + a * d, acc - b * 0.5)
    return jnp.sum(acc)


def chain_soa(ax, ay, az, bx, by, bz):
    accx, accy, accz = ax, ay, az
    for _ in range(8):
        cx = accy * bz - accz * by
        cy = accz * bx - accx * bz
        cz = accx * by - accy * bx
        d = cx * ax + cy * ay + cz * az
        inv = jax.lax.rsqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-20))
        nx, ny, nz = cx * inv, cy * inv, cz * inv
        m = d > 0.0
        accx = jnp.where(m, nx + ax * d, accx - bx * 0.5)
        accy = jnp.where(m, ny + ay * d, accy - by * 0.5)
        accz = jnp.where(m, nz + az * d, accz - bz * 0.5)
    return jnp.sum(accx) + jnp.sum(accy) + jnp.sum(accz)


def bench(fn, args, label):
    f = jax.jit(fn)
    out = f(*args)
    out.block_until_ready()
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:24s} {dt*1e3:8.3f} ms  ({N/dt/1e9:.2f} Gelem/s)")


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    bench(chain_aos, (a, b), "AoS (N,3)")

    comps1 = [jnp.asarray(np.ascontiguousarray(x[:, i])) for x in (np.asarray(a), np.asarray(b)) for i in range(3)]
    bench(chain_soa, comps1, "SoA rank-1 (N,)")

    comps2 = [c.reshape(R, 128) for c in comps1]
    bench(chain_soa, comps2, "SoA rank-2 (R,128)")

    comps3 = [c.reshape(8, N // 8) for c in comps1]
    bench(chain_soa, comps3, "SoA rank-2 (8,N/8)")


if __name__ == "__main__":
    main()
