"""Explicit PRNG key threading.

The reference relies on global torch seeding (`pl.seed_everything` at
/root/reference/src/train.py:472) and per-worker `torch.rand` for the
modality-dropout mask (/root/reference/src/data.py:112-118).  Here every
random draw is a pure function of an explicit `jax.random` key, so runs are
reproducible by construction and MC-dropout can be vmapped over keys.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp


def key_seq(seed: int) -> Iterator[jax.Array]:
    """Infinite deterministic stream of fresh PRNG keys from one seed."""
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


def split_like(key: jax.Array, names: list[str]) -> dict[str, jax.Array]:
    """Split a key into a dict of named keys (stable order)."""
    subs = jax.random.split(key, len(names))
    return {name: subs[i] for i, name in enumerate(names)}


def epoch_key(seed: int, epoch: int, salt: int = 0) -> jax.Array:
    """Key that is a pure function of (seed, epoch, salt).

    Used for epoch shuffling and per-epoch dropout so resuming at epoch k
    regenerates the identical randomness.
    """
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed), epoch), salt
    )


def uniform_permutation(key: jax.Array, n: int) -> jnp.ndarray:
    return jax.random.permutation(key, n)
