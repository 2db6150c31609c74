"""Misc utilities — reference utils.py:289-315 equivalents."""
from __future__ import annotations

import os
import random

import numpy as np


def set_all_seeds(seed: int) -> "jax.Array":
    """Seed every RNG the framework touches and return the JAX root key.

    The reference seeds python/numpy/torch and explicitly leaves cuDNN
    nondeterministic (utils.py:289-299). JAX's PRNG is already deterministic
    by construction; this seeds the host-side RNGs (data order is driven by
    Philox streams keyed on cfg.seed, so this mostly covers user code) and
    returns jax.random.PRNGKey(seed) as the single root key to thread
    through augmentation, styleaug gating, and dropout.
    """
    import jax

    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)


def compute_mean_std(loader):
    """Per-channel dataset statistics (reference utils.py:301-308): averages
    the per-batch channel means/stds over the loader."""
    mu = np.zeros(3)
    std = np.zeros(3)
    n = 0
    for batch in loader:
        x = np.asarray(batch["image"])  # (B, H, W, 3)
        mu += x.mean(axis=(0, 1, 2))
        std += x.std(axis=(0, 1, 2))
        n += 1
    return mu / n, std / n
