"""Deterministic seeding (parity: clip4cir/train.py:239-246 seeds
python/numpy/torch; here python/numpy/jax PRNGKey — and unlike the reference,
the whole jit'd compute path is deterministic by construction)."""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root jax PRNGKey."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
