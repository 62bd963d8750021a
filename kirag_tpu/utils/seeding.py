"""Deterministic seeding across Python / numpy / JAX PRNG.

TPU analogue of the reference's `seed_everything` (`utils/utils.py:81-89`):
JAX has no global RNG, so we seed host-side RNGs and hand back a root
`jax.random.key` for the device side.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    """Seed host RNGs and return a JAX PRNG key derived from ``seed``."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.key(seed)
