"""Mask helpers (jittable), matching reference tensor-helper semantics.

reference: src/f5_tts/model/utils.py:41-76 and src/f5_tts/durpred/utils.py:52-61.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lens_to_mask(lens: jnp.ndarray, length: int) -> jnp.ndarray:
    """(b,) lengths -> (b, length) bool mask. `length` must be static under jit.

    reference: src/f5_tts/model/utils.py:41-46.
    """
    seq = jnp.arange(length)
    return seq[None, :] < lens[:, None]


def mask_from_start_end_indices(start: jnp.ndarray, end: jnp.ndarray, length: int) -> jnp.ndarray:
    """(b,) start/end -> (b, length) bool mask of [start, end).

    reference: src/f5_tts/model/utils.py:49-54.
    """
    seq = jnp.arange(length)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(key: jax.Array, seq_len: jnp.ndarray, frac_lengths: jnp.ndarray, length: int) -> jnp.ndarray:
    """Random contiguous span covering `frac` of each sequence.

    reference: src/f5_tts/model/utils.py:57-65 — span length = floor(frac*len),
    start uniform in [0, len - span].
    """
    lengths = (frac_lengths * seq_len.astype(jnp.float32)).astype(jnp.int32)
    max_start = seq_len.astype(jnp.int32) - lengths
    rand = jax.random.uniform(key, seq_len.shape)
    start = jnp.maximum((max_start.astype(jnp.float32) * rand).astype(jnp.int32), 0)
    end = start + lengths
    return mask_from_start_end_indices(start, end, length)


def maybe_masked_mean(t: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(b, n, d) -> (b, d) mean over valid positions
    (reference: src/f5_tts/model/utils.py:68-76)."""
    if mask is None:
        return jnp.mean(t, axis=1)
    tf = jnp.where(mask[:, :, None], t, 0.0)
    num = jnp.sum(tf, axis=1)
    den = jnp.maximum(jnp.sum(mask.astype(t.dtype), axis=1), 1.0)
    return num / den[:, None]
