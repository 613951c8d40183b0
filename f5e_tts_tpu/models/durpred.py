"""Auxiliary duration predictor (StableTTS-derived) + alignment utilities.

reference: src/f5_tts/durpred/durpred.py (MelStyleEncoder + DurationPredictor)
and src/f5_tts/durpred/utils.py (sequence_mask, generate_path, duration_loss,
Conv1dGLU). The main F5E pipeline consumes only intersperse/mask/MAS from this
package; the predictor itself is kept for full capability parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.utils.masks import lens_to_mask


# ---------------------------------------------------------------------------
# path/duration utilities (durpred/utils.py:19-66)
# ---------------------------------------------------------------------------


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations (B, Tx) -> monotonic alignment path (B, Tx, Ty).

    reference: durpred/utils.py:26-37 — cumulative-duration unit rows.
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration, axis=1)  # (B, Tx)
    path = lens_to_mask(cum.reshape(b * t_x), t_y).astype(jnp.float32)
    path = path.reshape(b, t_x, t_y)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def duration_loss(logw: jnp.ndarray, logw_hat: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Sum-squared log-duration error / total length (durpred/utils.py:64-66)."""
    return jnp.sum(jnp.square(logw - logw_hat)) / jnp.sum(lengths)


# ---------------------------------------------------------------------------
# MelStyleEncoder (durpred/durpred.py:8-71)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StyleEncoderConfig:
    n_mel_channels: int = 100
    style_hidden: int = 128
    style_vector_dim: int = 256
    style_kernel_size: int = 5
    style_head: int = 2


def init_style_encoder(key, cfg: StyleEncoderConfig):
    ks = iter(jax.random.split(key, 12))
    h = cfg.style_hidden
    return {
        "spectral1": fnn.linear_init(next(ks), cfg.n_mel_channels, h),
        "spectral2": fnn.linear_init(next(ks), h, h),
        # Conv1dGLU x2 (utils.py:69-87): conv k5 -> split -> a * sigmoid(b) + res
        "glu1": fnn.conv1d_init(next(ks), h, 2 * h, kernel=cfg.style_kernel_size),
        "glu2": fnn.conv1d_init(next(ks), h, 2 * h, kernel=cfg.style_kernel_size),
        "attn": {
            "in_proj": fnn.linear_init(next(ks), h, 3 * h),
            "out_proj": fnn.linear_init(next(ks), h, h),
        },
        "fc": fnn.linear_init(next(ks), h, cfg.style_vector_dim),
    }


def _conv1d_glu(p, x, k, compute_dtype):
    res = x
    h = fnn.conv1d(p, x, padding=k // 2, compute_dtype=compute_dtype)
    a, b = jnp.split(h, 2, axis=-1)
    return res + a * jax.nn.sigmoid(b.astype(jnp.float32)).astype(a.dtype)


def style_encoder(params, cfg: StyleEncoderConfig, mel: jnp.ndarray,
                  mel_lens: Optional[jnp.ndarray] = None,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, N, mel) -> (B, style_dim) utterance-level style vector.

    reference: durpred.py:55-71 — spectral MLP (Mish), temporal Conv1dGLU,
    MHA (torch.nn.MultiheadAttention semantics), fc, temporal mean pool.
    """
    b, n, _ = mel.shape
    mask = lens_to_mask(mel_lens, n) if mel_lens is not None else None

    h = fnn.linear(params["spectral1"], mel.astype(compute_dtype), compute_dtype)
    h = fnn.mish(h)
    h = fnn.linear(params["spectral2"], h, compute_dtype)
    h = fnn.mish(h)

    k = cfg.style_kernel_size
    h = _conv1d_glu(params["glu1"], h, k, compute_dtype)
    h = _conv1d_glu(params["glu2"], h, k, compute_dtype)

    # self attention (packed qkv like torch MultiheadAttention)
    qkv = fnn.linear(params["attn"]["in_proj"], h, compute_dtype)
    q, kk, v = jnp.split(qkv, 3, axis=-1)
    heads = cfg.style_head
    dh = q.shape[-1] // heads
    q = q.reshape(b, n, heads, dh)
    kk = kk.reshape(b, n, heads, dh)
    v = v.reshape(b, n, heads, dh)
    scores = jnp.einsum("bthd,bshd->bhts", q, kk) / jnp.sqrt(dh).astype(q.dtype)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, n, heads * dh)
    h = fnn.linear(params["attn"]["out_proj"], o, compute_dtype)

    h = fnn.linear(params["fc"], h, compute_dtype)
    if mask is not None:
        h = jnp.where(mask[:, :, None], h, 0.0)
        return jnp.sum(h, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1)[:, None]
    return jnp.mean(h, axis=1)


# ---------------------------------------------------------------------------
# DurationPredictor (durpred/durpred.py:75-102)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DurPredConfig:
    in_channels: int = 512
    filter_channels: int = 256
    kernel_size: int = 3
    style_vector_dim: int = 256


def init_duration_predictor(key, cfg: DurPredConfig):
    ks = iter(jax.random.split(key, 6))
    return {
        "cond": fnn.linear_init(next(ks), cfg.style_vector_dim, cfg.in_channels),
        "conv1": fnn.conv1d_init(next(ks), cfg.in_channels, cfg.filter_channels,
                                 kernel=cfg.kernel_size),
        "norm1": fnn.layernorm_init(cfg.filter_channels),
        "conv2": fnn.conv1d_init(next(ks), cfg.filter_channels, cfg.filter_channels,
                                 kernel=cfg.kernel_size),
        "norm2": fnn.layernorm_init(cfg.filter_channels),
        "proj": fnn.linear_init(next(ks), cfg.filter_channels, 1),
    }


def duration_predictor(params, cfg: DurPredConfig, x: jnp.ndarray,
                       x_mask: jnp.ndarray, style: jnp.ndarray,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, Tx, C) text encodings + (B, style) -> (B, Tx) log-durations.

    reference: durpred.py:88-102 — input and style are detached upstream
    (stop_gradient at call site); conv -> relu -> LN -> conv -> relu -> LN ->
    proj, masked throughout.
    """
    x = jax.lax.stop_gradient(x)
    style = jax.lax.stop_gradient(style)
    m = x_mask[:, :, None].astype(x.dtype)
    h = x + fnn.linear(params["cond"], style, compute_dtype)[:, None, :]
    h = fnn.conv1d(params["conv1"], h * m, padding=cfg.kernel_size // 2,
                   compute_dtype=compute_dtype)
    h = jnp.maximum(h, 0.0)
    h = fnn.layernorm(params["norm1"], h)
    h = fnn.conv1d(params["conv2"], h * m, padding=cfg.kernel_size // 2,
                   compute_dtype=compute_dtype)
    h = jnp.maximum(h, 0.0)
    h = fnn.layernorm(params["norm2"], h)
    out = fnn.linear(params["proj"], h * m, compute_dtype)[:, :, 0]
    return out * x_mask.astype(out.dtype)
