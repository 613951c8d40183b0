"""Golden parity for UNetT: our JAX model (exported weights) vs a from-spec
torch implementation of the reference conventions (time token at position 0,
x_transformers RMSNorm, LIFO UNet skips with concat+proj)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from f5e_tts_tpu.config import UNetTConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.utils.torch_ckpt import unett_to_torch
from tests.torch_ref import freqs_cis_table, lin, rope_tables, rotate_half, sinus_time_embed

CFG = UNetTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                  text_dim=None, conv_layers=0, pe_attn_head=1,
                  text_mask_padding=False, dropout=0.0)
VOCAB = 12


def unett_forward_torch(sd, cfg, x, cond, text_ids, time):
    """Reference-convention UNetT forward (unett.py:184-250) in torch."""
    sd = {k[len("transformer."):]: torch.from_numpy(np.asarray(v)).float()
          for k, v in sd.items()}
    b, n, _ = x.shape

    t = sinus_time_embed(time)
    t = lin(sd, "time_embed.time_mlp.0", t)
    t = F.silu(t)
    t = lin(sd, "time_embed.time_mlp.2", t)

    # text embedding: conv_layers=0 -> plain lookup, no pos table (unett.py:65-80)
    ids = text_ids + 1
    ids = F.pad(ids[:, :n], (0, max(0, n - ids.shape[1])), value=0)
    te = sd["text_embed.text_embed.weight"][ids]

    h = lin(sd, "input_embed.proj", torch.cat([x, cond, te], dim=-1))
    hc = F.conv1d(h.transpose(1, 2), sd["input_embed.conv_pos_embed.conv1d.0.weight"],
                  sd["input_embed.conv_pos_embed.conv1d.0.bias"], padding=15, groups=16)
    hc = F.mish(hc)
    hc = F.conv1d(hc, sd["input_embed.conv_pos_embed.conv1d.2.weight"],
                  sd["input_embed.conv_pos_embed.conv1d.2.bias"], padding=15, groups=16)
    hc = F.mish(hc).transpose(1, 2)
    h = hc + h

    # pack time token at position 0 (unett.py:215)
    h = torch.cat([t[:, None, :], h], dim=1)
    cos, sin = rope_tables(cfg.dim_head, n + 1)

    def rmsnorm(key, v):
        # x_transformers RMSNorm: F.normalize(x) * sqrt(d) * g
        return F.normalize(v, dim=-1) * (v.shape[-1] ** 0.5) * sd[f"{key}.g"]

    def attn(base, v):
        q = lin(sd, f"{base}.2.to_q", v).view(b, n + 1, cfg.heads, cfg.dim_head)
        k = lin(sd, f"{base}.2.to_k", v).view(b, n + 1, cfg.heads, cfg.dim_head)
        vv = lin(sd, f"{base}.2.to_v", v).view(b, n + 1, cfg.heads, cfg.dim_head)
        pn = cfg.pe_attn_head
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        q[:, :pn] = q[:, :pn] * cos + rotate_half(q[:, :pn]) * sin
        k[:, :pn] = k[:, :pn] * cos + rotate_half(k[:, :pn]) * sin
        o = F.scaled_dot_product_attention(q, k, vv.transpose(1, 2))
        o = o.transpose(1, 2).reshape(b, n + 1, cfg.heads * cfg.dim_head)
        return lin(sd, f"{base}.2.to_out.0", o)

    def ff(base, v):
        vv = lin(sd, f"{base}.4.ff.0.0", v)
        vv = F.gelu(vv, approximate="tanh")
        return lin(sd, f"{base}.4.ff.2", vv)

    skips = []
    half = cfg.depth // 2
    for i in range(cfg.depth):
        base = f"layers.{i}"
        if i < half:
            skips.append(h)
        else:
            skip = skips.pop()
            if f"{base}.0.weight" in sd:  # concat skip_proj, bias=False
                h = torch.cat([h, skip], dim=-1) @ sd[f"{base}.0.weight"].T
            else:
                h = h + skip
        h = attn(base, rmsnorm(f"{base}.1", h)) + h
        h = ff(base, rmsnorm(f"{base}.3", h)) + h

    h = rmsnorm("norm_out", h)[:, 1:, :]
    return lin(sd, "proj_out", h)


def test_unett_matches_torch_reference(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), CFG, VOCAB)
    sd = unett_to_torch(params, state, CFG)

    b, n, nt = 2, 16, 6
    x = rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32)
    text = rng.integers(0, VOCAB, (b, nt)).astype(np.int32)
    time = np.asarray([0.3, 0.9], np.float32)

    ref = unett_forward_torch(sd, CFG, torch.from_numpy(x), torch.from_numpy(cond),
                              torch.from_numpy(text).long(), torch.from_numpy(time)).numpy()

    f = jnp.zeros((b,), bool)
    pred, _ = fbb.forward_train(params, state, CFG, x=jnp.asarray(x), cond=jnp.asarray(cond),
                                text_ids=jnp.asarray(text), time=jnp.asarray(time),
                                drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pred), ref, rtol=2e-3, atol=2e-4)


def test_unett_scan_unroll_equivalent(rng):
    """UNetTConfig.scan_unroll: both depth scans unrolled, output matches
    unroll=1 to ulp tolerance (depth=4, unroll 2 and 3 = non-divisible)."""
    import dataclasses

    from f5e_tts_tpu.models import backbone as fbb

    params, state = fbb.init_backbone(jax.random.PRNGKey(0), CFG, VOCAB)
    b, n, nt = 2, 24, 8
    x = rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32)
    text = rng.integers(0, VOCAB, (b, nt)).astype(np.int32)
    time = np.asarray([0.3, 0.9], np.float32)
    f = jnp.zeros((b,), bool)

    outs = {}
    for unroll in (1, 2, 3):
        cfg = dataclasses.replace(CFG, scan_unroll=unroll)
        pred, _ = fbb.forward_train(params, state, cfg, x=jnp.asarray(x),
                                    cond=jnp.asarray(x), text_ids=jnp.asarray(text),
                                    time=jnp.asarray(time), drop_audio_cond=f,
                                    drop_text=f, drop_ppg=f,
                                    compute_dtype=jnp.float32)
        outs[unroll] = np.asarray(pred)
    for unroll in (2, 3):
        np.testing.assert_allclose(outs[unroll], outs[1], rtol=1e-5, atol=1e-7)
