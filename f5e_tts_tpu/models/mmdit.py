"""MMDiT backbone (SD3-style dual-stream joint-attention transformer).

reference: src/f5_tts/model/backbones/mmdit.py:84-188 and
src/f5_tts/model/modules.py:647-715 (MMDiTBlock). The text stream keeps its
own length (not padded to mel length); the last block is context_pre_only.
The first depth-1 blocks are parameter-stacked under one lax.scan; the final
block has different parameters and runs separately.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import MMDiTConfig
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops.attention import joint_attention, joint_attention_init
from f5e_tts_tpu.ops.rope import rotary_cos_sin_half as rotary_cos_sin


def init_mmdit(key, cfg: MMDiTConfig, vocab_size: int):
    keys = iter(jax.random.split(key, 8 + cfg.depth * 2))

    params = {
        "time_embed": {
            "mlp1": fnn.linear_init(next(keys), 256, cfg.dim),
            "mlp2": fnn.linear_init(next(keys), cfg.dim, cfg.dim),
        },
        # text embedding: vocab+1, dim-sized, abs pos table max 1024 (mmdit.py:29-37)
        "text_embed": {"embed": fnn.embedding_init(next(keys), vocab_size + 1, cfg.dim)},
        "audio_embed": {
            "proj": fnn.linear_init(next(keys), cfg.mel_dim * 2, cfg.dim),
            "conv1": fnn.conv1d_init(next(keys), cfg.dim, cfg.dim, kernel=31, groups=16),
            "conv2": fnn.conv1d_init(next(keys), cfg.dim, cfg.dim, kernel=31, groups=16),
        },
    }

    def one_block(k, context_pre_only):
        blk = {
            # AdaLN-zero for both streams (mmdit.py:130-136)
            "attn_norm_x": fnn.linear_zero_init(cfg.dim, cfg.dim * 6),
            "attn_norm_c": fnn.linear_zero_init(cfg.dim, cfg.dim * (2 if context_pre_only else 6)),
            "attn": joint_attention_init(k, cfg.dim, cfg.dim, cfg.heads, cfg.dim_head,
                                         context_pre_only=context_pre_only, qk_norm=cfg.qk_norm),
            "ff1_x": fnn.linear_init(jax.random.fold_in(k, 1), cfg.dim, int(cfg.dim * cfg.ff_mult)),
            "ff2_x": fnn.linear_init(jax.random.fold_in(k, 2), int(cfg.dim * cfg.ff_mult), cfg.dim),
        }
        if not context_pre_only:
            blk["ff1_c"] = fnn.linear_init(jax.random.fold_in(k, 3), cfg.dim, int(cfg.dim * cfg.ff_mult))
            blk["ff2_c"] = fnn.linear_init(jax.random.fold_in(k, 4), int(cfg.dim * cfg.ff_mult), cfg.dim)
        return blk

    mids = [one_block(next(keys), False) for _ in range(cfg.depth - 1)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *mids)
    params["final_block"] = one_block(next(keys), True)
    params["norm_out"] = fnn.linear_zero_init(cfg.dim, cfg.dim * 2)
    params["proj_out"] = fnn.linear_zero_init(cfg.dim, cfg.mel_dim)
    return params, {}


def text_embed_fn(params, cfg: MMDiTConfig, text_ids: jnp.ndarray,
                  drop_text: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Text stream embedding at its own length (mmdit.py:39-60)."""
    ids = text_ids.astype(jnp.int32) + 1
    text_mask = ids == 0
    ids = jnp.where(drop_text[:, None], 0, ids)
    emb = fnn.embedding(params["text_embed"]["embed"], ids).astype(compute_dtype)
    table = jnp.asarray(fnn.precompute_freqs_cis(cfg.dim, 1024))
    nt = ids.shape[1]
    emb = emb + table[:nt][None].astype(compute_dtype)
    emb = jnp.where(text_mask[:, :, None], 0.0, emb).astype(compute_dtype)
    return emb


def _mod6(blk_key, t_emb, compute_dtype):
    mod = fnn.linear(blk_key, fnn.silu(t_emb), compute_dtype)
    return jnp.split(mod, 6, axis=-1)


def _mmdit_block(blk, x, c, t_emb, mask, rc, rs, crc, crs, cfg: MMDiTConfig,
                 context_pre_only, compute_dtype):
    """reference: modules.py:687-715."""
    if context_pre_only:
        mod = fnn.linear(blk["attn_norm_c"], fnn.silu(t_emb), compute_dtype)
        scale_c, shift_c = jnp.split(mod, 2, axis=-1)
        norm_c = fnn.layernorm(None, c, eps=1e-6).astype(compute_dtype)
        norm_c = norm_c * (1 + scale_c[:, None]) + shift_c[:, None]
    else:
        c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = _mod6(
            blk["attn_norm_c"], t_emb, compute_dtype)
        norm_c = fnn.layernorm(None, c, eps=1e-6).astype(compute_dtype)
        norm_c = norm_c * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]

    x_shift_msa, x_scale_msa, x_gate_msa, x_shift_mlp, x_scale_mlp, x_gate_mlp = _mod6(
        blk["attn_norm_x"], t_emb, compute_dtype)
    norm_x = fnn.layernorm(None, x, eps=1e-6).astype(compute_dtype)
    norm_x = norm_x * (1 + x_scale_msa[:, None]) + x_shift_msa[:, None]

    x_attn, c_attn = joint_attention(
        blk["attn"], norm_x, norm_c, cfg.heads, mask=mask,
        rope_cos=rc, rope_sin=rs, c_rope_cos=crc, c_rope_sin=crs,
        context_pre_only=context_pre_only, qk_norm=cfg.qk_norm, compute_dtype=compute_dtype)

    if not context_pre_only:
        c = c + c_gate_msa[:, None] * c_attn
        norm_c = fnn.layernorm(None, c, eps=1e-6).astype(compute_dtype)
        norm_c = norm_c * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        h = fnn.linear(blk["ff1_c"], norm_c, compute_dtype)
        h = fnn.gelu(h, approximate="tanh")
        c = c + c_gate_mlp[:, None] * fnn.linear(blk["ff2_c"], h, compute_dtype)
    else:
        c = None

    x = x + x_gate_msa[:, None] * x_attn
    norm_x = fnn.layernorm(None, x, eps=1e-6).astype(compute_dtype)
    norm_x = norm_x * (1 + x_scale_mlp[:, None]) + x_shift_mlp[:, None]
    h = fnn.linear(blk["ff1_x"], norm_x, compute_dtype)
    h = fnn.gelu(h, approximate="tanh")
    x = x + x_gate_mlp[:, None] * fnn.linear(blk["ff2_x"], h, compute_dtype)
    return x.astype(compute_dtype), (c.astype(compute_dtype) if c is not None else None)


def mmdit_forward(
    params,
    state,
    cfg: MMDiTConfig,
    *,
    x: jnp.ndarray,  # (B, N, mel)
    cond: jnp.ndarray,
    text_ids: Optional[jnp.ndarray],
    time: jnp.ndarray,
    drop_audio_cond: jnp.ndarray,
    drop_text: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    text_embed: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
):
    """reference: mmdit.py:147-188."""
    b, n, _ = x.shape

    t_emb = fnn.sinus_time_embedding(time, 256)
    t_emb = fnn.linear(params["time_embed"]["mlp1"], t_emb.astype(compute_dtype), compute_dtype)
    t_emb = fnn.silu(t_emb)
    t_emb = fnn.linear(params["time_embed"]["mlp2"], t_emb, compute_dtype)

    if text_embed is None:
        text_embed = text_embed_fn(params, cfg, text_ids, drop_text, compute_dtype)
    c = text_embed
    nt = c.shape[1]

    cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond).astype(compute_dtype)
    h = fnn.linear(params["audio_embed"]["proj"],
                   jnp.concatenate([x.astype(compute_dtype), cond], axis=-1), compute_dtype)
    cc = fnn.conv1d(params["audio_embed"]["conv1"], h, groups=16, padding=15, compute_dtype=compute_dtype)
    cc = fnn.mish(cc)
    cc = fnn.conv1d(params["audio_embed"]["conv2"], cc, groups=16, padding=15, compute_dtype=compute_dtype)
    cc = fnn.mish(cc)
    h = (cc + h).astype(compute_dtype)

    rc, rs = rotary_cos_sin(cfg.dim_head, n)
    crc, crs = rotary_cos_sin(cfg.dim_head, nt)
    rc, rs, crc, crs = map(jnp.asarray, (rc, rs, crc, crs))

    def body(carry, blk):
        hh, ctx = carry
        hh, ctx = _mmdit_block(blk, hh, ctx, t_emb, mask, rc, rs, crc, crs, cfg,
                               context_pre_only=False, compute_dtype=compute_dtype)
        return (hh, ctx), None

    (h, c), _ = jax.lax.scan(body, (h, c), params["blocks"],
                             unroll=getattr(cfg, "scan_unroll", 1))
    h, _ = _mmdit_block(params["final_block"], h, c, t_emb, mask, rc, rs, crc, crs, cfg,
                        context_pre_only=True, compute_dtype=compute_dtype)

    mod = fnn.linear(params["norm_out"], fnn.silu(t_emb), compute_dtype)
    scale, shift = jnp.split(mod, 2, axis=-1)
    h = fnn.layernorm(None, h, eps=1e-6).astype(compute_dtype)
    h = h * (1 + scale[:, None]) + shift[:, None]
    return fnn.linear(params["proj_out"], h, compute_dtype).astype(jnp.float32)
