"""Rotary position embeddings, matching x_transformers' convention.

The reference backbone uses x_transformers.RotaryEmbedding /
apply_rotary_pos_emb (reference: src/f5_tts/model/backbones/dit.py:17,245,454 and
src/f5_tts/model/modules.py:20,469-480). That convention is:

- inv_freq over even indices: 1/theta^(2i/d)
- per-position angles duplicated into adjacent pairs: freqs -> (f0,f0,f1,f1,...)
- rotate_half pairs adjacent elements: (x0,x1) -> (-x1,x0)
- out = x*cos(freqs) + rotate_half(x)*sin(freqs)  (xpos scale = 1 here)

We precompute cos/sin tables host-side and fold them in as jit constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rotary_freqs(dim_head: int, max_pos: int, theta: float = 10000.0) -> np.ndarray:
    """(max_pos, dim_head) angle table with adjacent-pair duplication."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2).astype(np.float64) / dim_head))
    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (max_pos, dim_head//2)
    freqs = np.stack([freqs, freqs], axis=-1).reshape(max_pos, dim_head)  # pairwise dup
    return freqs.astype(np.float32)


def rotary_cos_sin(dim_head: int, seq_len: int, theta: float = 10000.0):
    f = rotary_freqs(dim_head, seq_len, theta)
    return np.cos(f), np.sin(f)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(..., d) with adjacent pairs (x0,x1) -> (-x1,x0)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding to (..., n, d). cos/sin are (n, d) fp32 tables."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(orig_dtype)
