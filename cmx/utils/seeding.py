"""Determinism control (SURVEY §5 "Race detection / sanitizers").

The reference seeds random/np/torch and flips
torch.use_deterministic_algorithms(True) (Finetuning/train.py:431-442). In
JAX determinism is structural — all device RNG flows from explicit
jax.random keys threaded through the train state — so only the HOST side
needs seeding: python/np RNG (splits, samplers) and the root jax key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int = 42) -> jax.Array:
    """Seed host RNGs and return the root jax key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
