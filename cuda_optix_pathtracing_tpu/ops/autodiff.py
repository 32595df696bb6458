"""Autodiff helpers for kernels with no VJP.

The intersection kernels (Pallas packet-BVH and brute sweeps) return
DISCRETE events — hit distances/indices and occlusion bits — that are
piecewise-constant in the framework's differentiable parameters
(albedo, emission, light color, envmap texels; the detached-sampling
design of models/differentiable.py). Their correct derivative is zero
almost everywhere, and geometry derivatives of shading attributes flow
through the re-computed epilogue (ops/intersect.closest_epilogue), not
through the kernel. ``nondiff_kernel`` wraps such a function with a
custom VJP that produces zero cotangents so the backward pass can
replay straight through Pallas calls (which otherwise fail reverse-mode
linearization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _zero_cotangent(x):
    if isinstance(x, jax.Array) or hasattr(x, "dtype"):
        if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), jax.dtypes.float0)
    return None


def nondiff_kernel(fn):
    """Wrap ``fn(*arrays) -> pytree`` so reverse-mode AD treats its
    outputs as constants (zero gradient to every input)."""

    wrapped = jax.custom_vjp(fn)

    def fwd(*args):
        return fn(*args), args

    def bwd(args, _g):
        return tuple(
            jax.tree_util.tree_map(_zero_cotangent, a) for a in args
        )

    wrapped.defvjp(fwd, bwd)
    return functools.wraps(fn)(wrapped)
