"""Deterministic seeding.

The reference seeds torch/cuda global RNGs per scene (seva/utils.py:10-15,
called at seva/eval.py:1450). Our sampling RNG is already functional threefry
(keyed (seed, pass, chunk, step) in the engine), so this module only has to
cover the residual host-side randomness (numpy use in data augmentation)."""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)


def scene_key(seed: int):
    """Base JAX key for a scene; the engine folds (pass_idx, chunk_idx) in."""
    import jax

    return jax.random.PRNGKey(seed)
