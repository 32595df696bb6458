import jax
import jax.numpy as jnp

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
    T = v0.shape[0]
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


