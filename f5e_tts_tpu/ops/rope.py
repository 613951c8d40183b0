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

import jax
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
    """Interleaved-pair rotary on (..., n, d) — the reference convention.

    TPU WARNING: the stride-2 lane slicing here measured ~1.4 ms per call on
    (4,1536,16,64); hot paths use the half-split layout below instead.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# TPU-fast half-split (NeoX) layout
#
# Per head, permute the feature order so the interleaved pairs (2j, 2j+1)
# land at (j, j + d/2). Applied to BOTH q and k (weights pre-permuted at
# init/ingest time — see utils/torch_ckpt.py), attention scores are exactly
# those of the interleaved convention (q·k is invariant to a shared
# permutation), while rotate_half becomes one contiguous 32-lane concat
# instead of stride-2 lane shuffles (measured 2.8 ms -> ~0 per DiT layer).
# ---------------------------------------------------------------------------


def half_split_perm(dim_head: int) -> np.ndarray:
    """perm[j] = 2j for j < d/2 else 2(j - d/2) + 1; new[j] = old[perm[j]]."""
    half = dim_head // 2
    return np.concatenate([np.arange(0, dim_head, 2), np.arange(1, dim_head, 2)])


def permute_qk_weight(w: np.ndarray, heads: int) -> np.ndarray:
    """Permute the per-head output features of a (in, heads*dh) q/k weight."""
    d_in, inner = w.shape
    dh = inner // heads
    perm = half_split_perm(dh)
    w = w.reshape(d_in, heads, dh)[:, :, perm]
    return np.ascontiguousarray(w.reshape(d_in, inner))


def permute_qk_bias(b: np.ndarray, heads: int) -> np.ndarray:
    inner = b.shape[-1]
    dh = inner // heads
    perm = half_split_perm(dh)
    return np.ascontiguousarray(b.reshape(heads, dh)[:, perm].reshape(inner))


def unpermute_qk_weight(w: np.ndarray, heads: int) -> np.ndarray:
    d_in, inner = w.shape
    dh = inner // heads
    inv = np.argsort(half_split_perm(dh))
    w = w.reshape(d_in, heads, dh)[:, :, inv]
    return np.ascontiguousarray(w.reshape(d_in, inner))


def unpermute_qk_bias(b: np.ndarray, heads: int) -> np.ndarray:
    inner = b.shape[-1]
    dh = inner // heads
    inv = np.argsort(half_split_perm(dh))
    return np.ascontiguousarray(b.reshape(heads, dh)[:, inv].reshape(inner))


def rotary_cos_sin_half(dim_head: int, max_pos: int, theta: float = 10000.0):
    """Half-split tables: cos/sin of shape (max_pos, dim_head) = [c | c], [s | s]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2).astype(np.float64) / dim_head))
    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (max_pos, dh/2)
    freqs = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def apply_rotary_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotary in half-split layout: rotate = concat(-x[d/2:], x[:d/2]).

    The result is pinned to the input dtype through an optimization barrier:
    without it XLA elides the f32->bf16 convert into the following attention
    dot and runs QK^T/AV in full fp32 (profiled at 66% of the whole sampler —
    fp32 MXU is ~8x slower than bf16).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    out = (xf * cos + rot * sin).astype(orig_dtype)
    if orig_dtype != jnp.float32:
        out = jax.lax.optimization_barrier(out)
    return out
