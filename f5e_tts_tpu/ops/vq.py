"""Gumbel-softmax vector quantizer (fairseq port, jittable).

reference: src/f5_tts/model/modules.py:744-950 (GumbelVectorQuantizer). The
codebook is `vars` (1, num_groups*num_vars, var_dim); logits come from a linear
`weight_proj`; training uses hard gumbel-softmax (straight-through), eval uses
hard argmax. Perplexities are computed over the batch*time pool.

NOTE (faithful-behavior detail, SURVEY.md §2.1): the reference Trainer never
calls `set_num_updates`, so the temperature stays at temp_start. We expose
`temperature` as an argument so both behaviors are available.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import CodebookConfig
from f5e_tts_tpu.ops import nn as fnn


class VQResult(NamedTuple):
    x: jnp.ndarray  # quantized output (B, T, vq_dim)
    code_perplexity: jnp.ndarray  # scalar
    prob_perplexity: jnp.ndarray  # scalar
    num_vars: int  # num_vars * groups


def gumbel_vq_init(key, cfg: CodebookConfig, dim: int):
    """dim = input/output dim (text_dim); vq_dim = dim (reference: dit.py:296-307)."""
    k1, k2 = jax.random.split(key)
    num_groups = 1 if cfg.combine_groups else cfg.groups
    var_dim = dim // cfg.groups
    params = {
        # torch init: uniform_() == U(0, 1)  (reference: modules.py:791-793)
        "vars": jax.random.uniform(k1, (1, num_groups * cfg.num_vars, var_dim), jnp.float32),
    }
    if cfg.weight_proj_depth > 1:
        inner = dim * cfg.weight_proj_factor
        layers = []
        kk = jax.random.split(k2, cfg.weight_proj_depth)
        for i in range(cfg.weight_proj_depth - 1):
            layers.append(fnn.linear_init(kk[i], dim if i == 0 else inner, inner))
        layers.append(fnn.linear_init(kk[-1], inner, cfg.groups * cfg.num_vars))
        params["weight_proj"] = {f"layer_{i}": p for i, p in enumerate(layers)}
    else:
        # reference init: weight N(0,1), bias zeros (modules.py:811-813)
        params["weight_proj"] = {
            "layer_0": {
                "w": jax.random.normal(k2, (dim, cfg.groups * cfg.num_vars), jnp.float32),
                "b": jnp.zeros((cfg.groups * cfg.num_vars,), jnp.float32),
            }
        }
    return params


def _weight_proj(params, cfg: CodebookConfig, x):
    layers = sorted(params["weight_proj"].keys(), key=lambda s: int(s.split("_")[1]))
    h = x
    for i, name in enumerate(layers):
        h = fnn.linear(params["weight_proj"][name], h)
        if i < len(layers) - 1:
            h = fnn.gelu(h, approximate="none")
    return h


def _perplexity(probs: jnp.ndarray) -> jnp.ndarray:
    """probs: (groups, num_vars) mean distribution -> sum over groups of exp(entropy)."""
    ent = -jnp.sum(probs * jnp.log(probs + 1e-7), axis=-1)
    return jnp.sum(jnp.exp(ent))


def gumbel_vq_apply(
    params,
    cfg: CodebookConfig,
    x: jnp.ndarray,  # (B, T, D) time-first
    *,
    training: bool,
    temperature: float | jnp.ndarray,
    rng: jax.Array | None = None,
) -> VQResult:
    """Quantize (B, T, D) -> (B, T, D); straight-through gumbel in training.

    reference: src/f5_tts/model/modules.py:881-950.
    """
    b, t, d = x.shape
    logits = _weight_proj(params, cfg, x.astype(jnp.float32))  # (B, T, G*V)
    logits = logits.reshape(b * t * cfg.groups, cfg.num_vars)

    # hard (argmax) one-hots and code perplexity — no grad
    k = jnp.argmax(logits, axis=-1)
    hard_x = jax.nn.one_hot(k, cfg.num_vars, dtype=jnp.float32)  # (B*T*G, V)
    hard_probs = jnp.mean(hard_x.reshape(b * t, cfg.groups, cfg.num_vars), axis=0)
    code_ppl = _perplexity(hard_probs)

    # softmax-averaged probabilities and prob perplexity (differentiable)
    avg_probs = jnp.mean(
        jax.nn.softmax(logits.reshape(b * t, cfg.groups, cfg.num_vars), axis=-1), axis=0
    )
    prob_ppl = _perplexity(avg_probs)

    if training:
        assert rng is not None, "training VQ needs an rng for gumbel noise"
        # F.gumbel_softmax(hard=True): ST-estimator
        gumbels = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape, jnp.float32, 1e-10, 1.0) ) )
        y_soft = jax.nn.softmax((logits + gumbels) / temperature, axis=-1)
        y_hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), cfg.num_vars, dtype=jnp.float32)
        onehot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    else:
        onehot = hard_x

    # codebook lookup: (B*T, G*V) x vars
    onehot = onehot.reshape(b * t, cfg.groups * cfg.num_vars)
    vars_ = params["vars"]
    if cfg.combine_groups:
        vars_ = jnp.tile(vars_, (1, cfg.groups, 1))
    # (B*T, G*V, 1) * (1, G*V, var_dim) summed per group
    xq = onehot[:, :, None] * vars_
    xq = xq.reshape(b * t, cfg.groups, cfg.num_vars, -1).sum(axis=-2)
    xq = xq.reshape(b, t, -1)

    return VQResult(x=xq, code_perplexity=code_ppl, prob_perplexity=prob_ppl,
                    num_vars=cfg.num_vars * cfg.groups)


def decayed_temperature(cfg: CodebookConfig, num_updates) -> jnp.ndarray:
    """max(temp_start * decay^updates, temp_stop) (reference: modules.py:825-828)."""
    return jnp.maximum(cfg.temp_start * cfg.temp_decay ** num_updates, cfg.temp_stop)
