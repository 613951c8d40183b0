"""Independent torch implementation of the reference DiT forward, written from
the documented spec (SURVEY.md §2.1 + our docstrings), used as a golden oracle
to validate the JAX model's conventions (AdaLN chunk order, freqs_cis table,
interleaved rope, conv-pos-embedding, GRN, text padding/drop order).

This is TEST-ONLY code: a from-spec reimplementation in torch primitives.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def sinus_time_embed(t, dim=256, scale=1000.0):
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half) * -emb)
    args = scale * t[:, None] * freqs[None]
    return torch.cat([args.sin(), args.cos()], dim=-1)


def freqs_cis_table(dim, end):
    freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    angles = torch.outer(torch.arange(end).float(), freqs)
    return torch.cat([angles.cos(), angles.sin()], dim=-1)


def rope_tables(dh, n):
    inv = 1.0 / (10000.0 ** (torch.arange(0, dh, 2).float() / dh))
    fr = torch.outer(torch.arange(n).float(), inv)
    fr = torch.stack([fr, fr], dim=-1).reshape(n, dh)  # pairwise duplication
    return fr.cos(), fr.sin()


def rotate_half(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return torch.stack([-x2, x1], dim=-1).reshape(x.shape)


def lin(sd, key, x):
    return x @ sd[f"{key}.weight"].T + sd[f"{key}.bias"]


def conv1d(sd, key, x, groups=1, padding=0):
    # x (B, N, C) -> torch conv layout
    return F.conv1d(x.transpose(1, 2), sd[f"{key}.weight"], sd[f"{key}.bias"],
                    padding=padding, groups=groups).transpose(1, 2)


def convnext_v2(sd, key, x):
    res = x
    dim = x.shape[-1]
    h = conv1d(sd, f"{key}.dwconv", x, groups=dim, padding=3)
    h = F.layer_norm(h, (dim,), sd[f"{key}.norm.weight"], sd[f"{key}.norm.bias"], eps=1e-6)
    h = lin(sd, f"{key}.pwconv1", h)
    h = F.gelu(h)
    gx = torch.norm(h, p=2, dim=1, keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    h = sd[f"{key}.grn.gamma"] * (h * nx) + sd[f"{key}.grn.beta"] + h
    h = lin(sd, f"{key}.pwconv2", h)
    return res + h


def dit_forward_torch(sd, cfg, x, cond, text_ids, time, drop_audio=False,
                      drop_text=False):
    """Full reference-convention DiT forward (no PPG/codebook), fp32 torch."""
    sd = {k[len("transformer."):]: torch.from_numpy(np.asarray(v)).float()
          for k, v in sd.items() if k.startswith("transformer.")}
    b, n, _ = x.shape
    text_dim = cfg.text_dim if cfg.text_dim is not None else cfg.mel_dim

    # time embedding
    t = sinus_time_embed(time)
    t = lin(sd, "time_embed.time_mlp.0", t)
    t = F.silu(t)
    t = lin(sd, "time_embed.time_mlp.2", t)

    # text embedding
    ids = text_ids + 1
    ids = ids[:, :n]
    ids = F.pad(ids, (0, n - ids.shape[1]), value=0)
    text_mask = ids == 0 if cfg.text_mask_padding else None
    if drop_text:
        ids = torch.zeros_like(ids)
    emb_w = sd["text_embed.text_embed.weight"]
    te = emb_w[ids]
    te = te + freqs_cis_table(text_dim, cfg.max_pos)[:n][None]
    n_blocks = cfg.conv_layers
    if text_mask is not None:
        te = te.masked_fill(text_mask[..., None], 0.0)
        for i in range(n_blocks):
            te = convnext_v2(sd, f"text_embed.text_blocks.{i}", te)
            te = te.masked_fill(text_mask[..., None], 0.0)
    else:
        for i in range(n_blocks):
            te = convnext_v2(sd, f"text_embed.text_blocks.{i}", te)

    # input embedding
    c = torch.zeros_like(cond) if drop_audio else cond
    h = lin(sd, "input_embed.proj", torch.cat([x, c, te], dim=-1))
    hc = conv1d(sd, "input_embed.conv_pos_embed.conv1d.0", h, groups=16, padding=15)
    hc = F.mish(hc)
    hc = conv1d(sd, "input_embed.conv_pos_embed.conv1d.2", hc, groups=16, padding=15)
    hc = F.mish(hc)
    h = hc + h

    # blocks
    cos, sin = rope_tables(cfg.dim_head, n)
    for i in range(cfg.depth):
        k = f"transformer_blocks.{i}"
        mod = lin(sd, f"{k}.attn_norm.linear", F.silu(t))
        sm, scm, gm, sl, scl, gl = mod.chunk(6, dim=1)
        norm = F.layer_norm(h, (cfg.dim,), eps=1e-6) * (1 + scm[:, None]) + sm[:, None]

        q = lin(sd, f"{k}.attn.to_q", norm).view(b, n, cfg.heads, cfg.dim_head)
        kk = lin(sd, f"{k}.attn.to_k", norm).view(b, n, cfg.heads, cfg.dim_head)
        v = lin(sd, f"{k}.attn.to_v", norm).view(b, n, cfg.heads, cfg.dim_head)
        if cfg.qk_norm == "rms_norm":
            # per-head RMSNorm before rope (modules.py:394-396, 464-467)
            q = F.rms_norm(q, (cfg.dim_head,), weight=sd[f"{k}.attn.q_norm.weight"], eps=1e-6)
            kk = F.rms_norm(kk, (cfg.dim_head,), weight=sd[f"{k}.attn.k_norm.weight"], eps=1e-6)
        if cfg.pe_attn_head is not None:
            pn = cfg.pe_attn_head
            # reference applies rope on the first pn heads in (b,h,n,d) layout
            q = q.transpose(1, 2)
            kk = kk.transpose(1, 2)
            q[:, :pn] = q[:, :pn] * cos + rotate_half(q[:, :pn]) * sin
            kk[:, :pn] = kk[:, :pn] * cos + rotate_half(kk[:, :pn]) * sin
            q = q.transpose(1, 2)
            kk = kk.transpose(1, 2)
        else:
            q = q * cos[None, :, None, :] + rotate_half(q) * sin[None, :, None, :]
            kk = kk * cos[None, :, None, :] + rotate_half(kk) * sin[None, :, None, :]
        attn = F.scaled_dot_product_attention(
            q.transpose(1, 2), kk.transpose(1, 2), v.transpose(1, 2))
        attn = attn.transpose(1, 2).reshape(b, n, cfg.heads * cfg.dim_head)
        attn = lin(sd, f"{k}.attn.to_out.0", attn)
        h = h + gm[:, None] * attn

        norm = F.layer_norm(h, (cfg.dim,), eps=1e-6) * (1 + scl[:, None]) + sl[:, None]
        ff = lin(sd, f"{k}.ff.ff.0.0", norm)
        ff = F.gelu(ff, approximate="tanh")
        ff = lin(sd, f"{k}.ff.ff.2", ff)
        h = h + gl[:, None] * ff

    mod = lin(sd, "norm_out.linear", F.silu(t))
    scale, shift = mod.chunk(2, dim=1)  # NOTE: (scale, shift) order, final AdaLN
    h = F.layer_norm(h, (cfg.dim,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    return lin(sd, "proj_out", h)
