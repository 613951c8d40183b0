"""UNetT backbone (E2-TTS flat UNet transformer) — pure functional JAX.

reference: src/f5_tts/model/backbones/unett.py:106-250. Design notes:

- the time embedding is packed as sequence position 0 (unett.py:215),
- pre-norm RMSNorm blocks: x = attn(norm(x)) + x; x = ff(norm(x)) + x,
- UNet skips: the first depth/2 layers push their inputs, the second half pops
  in LIFO order and merges via concat+proj (or add),
- TPU shape: each half is parameter-stacked and driven by one `lax.scan`; the
  first scan emits the skip stack as its ys, the second consumes it reversed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import UNetTConfig
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops.attention import attention, attention_init
from f5e_tts_tpu.ops.rope import rotary_cos_sin_half as rotary_cos_sin
from f5e_tts_tpu.models.dit import text_embed_fn as _dit_text_embed_fn


def init_unett(key, cfg: UNetTConfig, vocab_size: int):
    keys = iter(jax.random.split(key, 16 + cfg.depth * 4))
    text_dim = cfg.text_dim if cfg.text_dim is not None else cfg.mel_dim
    assert cfg.depth % 2 == 0, "UNetT depth must be even"

    params = {
        "time_embed": {
            "mlp1": fnn.linear_init(next(keys), 256, cfg.dim),
            "mlp2": fnn.linear_init(next(keys), cfg.dim, cfg.dim),
        },
        "text_embed": {
            "embed": fnn.embedding_init(next(keys), vocab_size + 1, text_dim),
            "blocks": [
                __import__("f5e_tts_tpu.ops.convnext", fromlist=["convnext_v2_init"]).convnext_v2_init(
                    next(keys), text_dim, text_dim * 2)
                for _ in range(cfg.conv_layers)
            ],
        },
        "input_embed": {
            "proj": fnn.linear_init(next(keys), cfg.mel_dim * 2 + text_dim, cfg.dim),
            "conv1": fnn.conv1d_init(next(keys), cfg.dim, cfg.dim, kernel=31, groups=16),
            "conv2": fnn.conv1d_init(next(keys), cfg.dim, cfg.dim, kernel=31, groups=16),
        },
    }

    def one_layer(k, with_skip_proj):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        layer = {
            "attn_norm": fnn.rmsnorm_init(cfg.dim),
            "attn": attention_init(k1, cfg.dim, cfg.heads, cfg.dim_head, cfg.qk_norm),
            "ff_norm": fnn.rmsnorm_init(cfg.dim),
            "ff1": fnn.linear_init(k2, cfg.dim, int(cfg.dim * cfg.ff_mult)),
            "ff2": fnn.linear_init(k3, int(cfg.dim * cfg.ff_mult), cfg.dim),
        }
        if with_skip_proj:
            layer["skip_proj"] = fnn.linear_init(k4, cfg.dim * 2, cfg.dim, bias=False)
        return layer

    half = cfg.depth // 2
    first = [one_layer(next(keys), False) for _ in range(half)]
    second = [one_layer(next(keys), cfg.skip_connect_type == "concat") for _ in range(half)]
    params["first_half"] = jax.tree.map(lambda *xs: jnp.stack(xs), *first)
    params["second_half"] = jax.tree.map(lambda *xs: jnp.stack(xs), *second)
    params["norm_out"] = fnn.rmsnorm_init(cfg.dim)
    params["proj_out"] = fnn.linear_init(next(keys), cfg.dim, cfg.mel_dim)
    return params, {}


def _unett_layer(layer, x, mask, rope_cos, rope_sin, cfg: UNetTConfig, compute_dtype):
    h = fnn.rmsnorm(layer["attn_norm"], x, eps=1e-12)  # x_transformers RMSNorm
    h = attention(layer["attn"], h.astype(compute_dtype), cfg.heads, mask=mask,
                  rope_cos=rope_cos, rope_sin=rope_sin, pe_attn_head=cfg.pe_attn_head,
                  qk_norm=cfg.qk_norm, compute_dtype=compute_dtype)
    x = x + h
    h = fnn.rmsnorm(layer["ff_norm"], x, eps=1e-12)
    h = fnn.linear(layer["ff1"], h.astype(compute_dtype), compute_dtype)
    h = fnn.gelu(h, approximate="tanh")
    h = fnn.linear(layer["ff2"], h, compute_dtype)
    return (x + h).astype(compute_dtype)


def unett_forward(
    params,
    state,
    cfg: UNetTConfig,
    *,
    x: jnp.ndarray,  # (B, N, mel)
    cond: jnp.ndarray,
    text_ids: Optional[jnp.ndarray],
    time: jnp.ndarray,  # (B,)
    drop_audio_cond: jnp.ndarray,  # (B,) bool
    drop_text: jnp.ndarray,  # (B,) bool
    mask: Optional[jnp.ndarray] = None,
    text_embed: Optional[jnp.ndarray] = None,  # precomputed (sampler cache)
    compute_dtype=jnp.bfloat16,
):
    """Forward pass. reference: unett.py:184-250."""
    b, n, _ = x.shape

    t_emb = fnn.sinus_time_embedding(time, 256)
    t_emb = fnn.linear(params["time_embed"]["mlp1"], t_emb.astype(compute_dtype), compute_dtype)
    t_emb = fnn.silu(t_emb)
    t_emb = fnn.linear(params["time_embed"]["mlp2"], t_emb, compute_dtype)

    if text_embed is None:
        text_embed = _text_embed(params, cfg, text_ids, b, n, drop_text, compute_dtype)

    cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond).astype(compute_dtype)
    h = fnn.linear(params["input_embed"]["proj"],
                   jnp.concatenate([x.astype(compute_dtype), cond, text_embed.astype(compute_dtype)], axis=-1),
                   compute_dtype)
    c = fnn.conv1d(params["input_embed"]["conv1"], h, groups=16, padding=15, compute_dtype=compute_dtype)
    c = fnn.mish(c)
    c = fnn.conv1d(params["input_embed"]["conv2"], c, groups=16, padding=15, compute_dtype=compute_dtype)
    c = fnn.mish(c)
    h = (c + h).astype(compute_dtype)

    # pack time token at position 0 (unett.py:215-217)
    h = jnp.concatenate([t_emb[:, None, :], h], axis=1)
    if mask is not None:
        mask = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)

    rc, rs = rotary_cos_sin(cfg.dim_head, n + 1)
    rc = jnp.asarray(rc)
    rs = jnp.asarray(rs)

    def first_body(hh, layer):
        skip = hh
        hh = _unett_layer(layer, hh, mask, rc, rs, cfg, compute_dtype)
        return hh, skip

    h, skips = jax.lax.scan(first_body, h, params["first_half"],
                            unroll=getattr(cfg, "scan_unroll", 1))

    skips_rev = jax.tree.map(lambda a: a[::-1], skips)  # LIFO pop order

    def second_body(hh, scanned):
        layer, skip = scanned
        if cfg.skip_connect_type == "concat":
            hh = fnn.linear(layer["skip_proj"], jnp.concatenate([hh, skip], axis=-1), compute_dtype)
        elif cfg.skip_connect_type == "add":
            hh = hh + skip
        hh = _unett_layer(layer, hh, mask, rc, rs, cfg, compute_dtype)
        return hh, None

    h, _ = jax.lax.scan(second_body, h, (params["second_half"], skips_rev),
                        unroll=getattr(cfg, "scan_unroll", 1))

    h = fnn.rmsnorm(params["norm_out"], h, eps=1e-12)[:, 1:, :]  # unpack time token
    return fnn.linear(params["proj_out"], h.astype(compute_dtype), compute_dtype).astype(jnp.float32)


def _text_embed(params, cfg: UNetTConfig, text_ids, batch, seq_len, drop_text, compute_dtype):
    """Same TextEmbedding semantics as DiT (unett.py:35-82)."""
    from f5e_tts_tpu.config import DiTConfig

    shim = DiTConfig(text_dim=cfg.text_dim if cfg.text_dim is not None else cfg.mel_dim,
                     mel_dim=cfg.mel_dim, conv_layers=cfg.conv_layers,
                     text_mask_padding=cfg.text_mask_padding, max_pos=cfg.max_pos)
    return _dit_text_embed_fn(params, shim, text_ids, batch, seq_len, drop_text, compute_dtype)


text_embed_fn = _text_embed
