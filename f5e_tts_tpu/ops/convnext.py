"""ConvNeXt blocks: V2 (GRN, used in DiT text embedding) and V1 (layer-scale,
used by the Vocos vocoder backbone).

reference: src/f5_tts/model/modules.py:225-269 (ConvNeXtV2Block + GRN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f5e_tts_tpu.ops import nn as fnn


def grn_init(dim: int):
    """Global Response Normalization params, zero-init
    (reference: src/f5_tts/model/modules.py:225-229)."""
    return {"gamma": jnp.zeros((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


def grn(p, x: jnp.ndarray) -> jnp.ndarray:
    """GRN over (B, N, D): L2 norm over sequence dim, normalized by its mean over D.

    reference: src/f5_tts/model/modules.py:231-234.
    """
    xf = x.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(jnp.square(xf), axis=1, keepdims=True))  # (B, 1, D)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    out = p["gamma"] * (xf * nx) + p["beta"] + xf
    return out.astype(x.dtype)


def convnext_v2_init(key, dim: int, intermediate_dim: int):
    ks = jax.random.split(key, 3)
    return {
        "dwconv": fnn.conv1d_init(ks[0], dim, dim, kernel=7, groups=dim),
        "norm": fnn.layernorm_init(dim),
        "pwconv1": fnn.linear_init(ks[1], dim, intermediate_dim),
        "grn": grn_init(intermediate_dim),
        "pwconv2": fnn.linear_init(ks[2], intermediate_dim, dim),
    }


def convnext_v2(p, x: jnp.ndarray, dilation: int = 1, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, N, D) -> (B, N, D). dwconv k7 -> LN -> pw1 -> GELU -> GRN -> pw2 + residual.

    reference: src/f5_tts/model/modules.py:241-269.
    """
    residual = x
    dim = x.shape[-1]
    pad = (dilation * (7 - 1)) // 2
    h = fnn.conv1d(p["dwconv"], x, groups=dim, padding=pad, dilation=dilation, compute_dtype=compute_dtype)
    h = fnn.layernorm(p["norm"], h, eps=1e-6)
    h = fnn.linear(p["pwconv1"], h, compute_dtype)
    h = fnn.gelu(h, approximate="none")
    h = grn(p["grn"], h)
    h = fnn.linear(p["pwconv2"], h, compute_dtype)
    return (residual + h).astype(x.dtype)


def convnext_v1_init(key, dim: int, intermediate_dim: int, layer_scale_init: float = 1e-6):
    """ConvNeXt V1 block (Vocos backbone): layer-scale gamma instead of GRN."""
    ks = jax.random.split(key, 3)
    return {
        "dwconv": fnn.conv1d_init(ks[0], dim, dim, kernel=7, groups=dim),
        "norm": fnn.layernorm_init(dim),
        "pwconv1": fnn.linear_init(ks[1], dim, intermediate_dim),
        "pwconv2": fnn.linear_init(ks[2], intermediate_dim, dim),
        "gamma": jnp.full((dim,), layer_scale_init, jnp.float32),
    }


def convnext_v1(p, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    residual = x
    dim = x.shape[-1]
    h = fnn.conv1d(p["dwconv"], x, groups=dim, padding=3, compute_dtype=compute_dtype)
    h = fnn.layernorm(p["norm"], h, eps=1e-6)
    h = fnn.linear(p["pwconv1"], h, compute_dtype)
    h = fnn.gelu(h, approximate="none")
    h = fnn.linear(p["pwconv2"], h, compute_dtype)
    h = h * p["gamma"].astype(h.dtype)
    return (residual + h).astype(x.dtype)
