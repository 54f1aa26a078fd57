"""Determinism utilities (reference: utils/seed.py:7-20).

The reference needs cudnn-deterministic flags and CUBLAS workspace pinning;
JAX programs are deterministic by construction given fixed PRNG keys, so
this reduces to seeding python/numpy for host-side shuffling/augmentation
and producing the root jax key.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.key(seed)
