"""Film checkpoint/resume: progressive rendering *is* the checkpoint.

As in the reference (sample batching with sampleOffset + --savePartial,
megakernel/main.cu:141-193), the complete resumable state is
(film mean, film M2, N) plus the RNG seed — the counter-based RNG needs
no stored state. Plain .npz; swap for orbax when films get sharded big.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops.film import Film


def save_film(path: str, film: Film, seed: int = 0) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp.removesuffix(".npz"),
        mean=np.asarray(film.mean),
        m2=np.asarray(film.m2),
        n=np.asarray(film.n),
        seed=np.int64(seed),
    )
    os.replace(tmp, path)


def load_film(path: str) -> tuple[Film, int]:
    with np.load(path) as z:
        film = Film(
            jnp.asarray(z["mean"]), jnp.asarray(z["m2"]), jnp.asarray(z["n"])
        )
        return film, int(z["seed"])
