"""Determinism helpers (reference: src/f5_tts/model/utils.py:17-24)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 0) -> None:
    """Seed python/numpy RNGs. JAX randomness is explicit (keys), so the jax
    equivalent is passing jax.random.PRNGKey(seed) at call sites — there is no
    global jax RNG to seed."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
