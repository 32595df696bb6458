"""Fast table gathers for TPU.

XLA lowers ``table[idx]`` (advanced indexing) to a generic gather, which
on TPU executes element-at-a-time — measured ~0.54 ms for 16 fields at
N=65536 regardless of table size (scripts/perf_experiments2.py). For the
small parameter tables a renderer reads per bounce (materials, lights,
triangle attributes), the TPU-native form is a **one-hot matmul**: build
``one_hot(idx) ∈ (N, M)`` and contract against the packed ``(M, F)``
table on the MXU — measured ~0.04 ms for the same workload, 13× faster.

``onehot_gather_pytree`` packs an arbitrary pytree of ``(M, ...)`` leaves
into one ``(M, F)`` fp32 matrix (ints are exactly representable below
2^24), does a single matmul, and unpacks. Falls back to native gather
when ``M`` is large enough that the (N, M) one-hot traffic would exceed
the gather cost (~4k rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# above this many rows, (N, M) one-hot HBM traffic beats generic-gather
# cost no longer; use the native path. (65536×4096 f32 = 1 GB → ~1.3 ms,
# on par with the measured generic gather.)
ONEHOT_MAX_ROWS = 2048


def _leaf_spec(leaf):
    """(flattened width, dtype) of a (M, ...) leaf."""
    f = int(np.prod(leaf.shape[1:])) if leaf.ndim > 1 else 1
    return f, leaf.dtype


def onehot_gather_pytree(tree, idx):
    """Gather rows ``idx`` (N,) from every (M, ...) leaf of ``tree``.

    Returns a pytree of (N, ...) leaves. All leaves must share leading
    dim M. Integer leaves must hold values < 2^24 in magnitude.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    m = leaves[0].shape[0]
    if m > ONEHOT_MAX_ROWS:
        return jax.tree_util.tree_unflatten(
            treedef, [leaf[idx] for leaf in leaves]
        )

    cols = []
    for leaf in leaves:
        f, _ = _leaf_spec(leaf)
        cols.append(leaf.reshape(m, f).astype(jnp.float32))
    packed = jnp.concatenate(cols, axis=1)  # (M, F)

    oh = jax.nn.one_hot(idx, m, dtype=jnp.float32)  # (N, M)
    # precision=HIGHEST is load-bearing: the TPU MXU's default precision
    # multiplies in bf16, which ROUNDS THE GATHERED VALUES — triangle
    # vertices fetched through this path lost ~3 decimal digits (≈5 mm on
    # a 2 m scene), flipping marginal shadow-ray occlusions and biasing
    # the image ~-1.5% (found by diffing against the fused Pallas
    # megakernel, which matched the fp32 CPU render exactly). The one-hot
    # operand is exact 0/1 either way; the TABLE operand must stay f32.
    flat = jnp.matmul(oh, packed, precision=jax.lax.Precision.HIGHEST)

    outs = []
    off = 0
    for leaf in leaves:
        f, dtype = _leaf_spec(leaf)
        piece = flat[:, off : off + f]
        off += f
        if jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_:
            # round before cast: matmul of exact one-hot is exact, but be safe
            piece = jnp.round(piece).astype(dtype)
        elif piece.dtype != dtype:
            piece = piece.astype(dtype)
        outs.append(piece.reshape((idx.shape[0],) + leaf.shape[1:]))
    return jax.tree_util.tree_unflatten(treedef, outs)


def onehot_gather(table, idx):
    """Gather rows from a single (M, ...) array; see onehot_gather_pytree."""
    return onehot_gather_pytree([table], idx)[0]
