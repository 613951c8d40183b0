"""Golden parity for MMDiT: our JAX dual-stream model vs a from-spec torch
implementation (joint attention, per-stream AdaLN-zero, context_pre_only last
block, text abs-pos table at its own length)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from f5e_tts_tpu.config import MMDiTConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.models import mmdit as fmmdit
from tests.torch_ref import freqs_cis_table, rope_tables, rotate_half, sinus_time_embed

CFG = MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                  dropout=0.0)
VOCAB = 12


def _np(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def mmdit_forward_torch(params, cfg, x, cond, text_ids, time):
    """reference: mmdit.py:147-188 + modules.py:647-715, run on our pytree."""
    import jax

    b, n, _ = x.shape
    nt = text_ids.shape[1]

    def lin(p, v):
        w = _np(p["w"])
        out = v @ w
        if "b" in p:
            out = out + _np(p["b"])
        return out

    t = sinus_time_embed(time)
    t = lin(params["time_embed"]["mlp1"], t)
    t = F.silu(t)
    t = lin(params["time_embed"]["mlp2"], t)

    # text stream (mmdit.py:39-60): +1 shift, own length, pos table max 1024,
    # padding masked after
    ids = text_ids + 1
    mask_pad = ids == 0
    c = _np(params["text_embed"]["embed"]["w"])[ids]
    c = c + freqs_cis_table(cfg.dim, 1024)[:nt][None]
    c = c.masked_fill(mask_pad[..., None], 0.0)

    h = lin(params["audio_embed"]["proj"], torch.cat([x, cond], dim=-1))
    w1 = _np(params["audio_embed"]["conv1"]["w"]).permute(2, 1, 0)
    w2 = _np(params["audio_embed"]["conv2"]["w"]).permute(2, 1, 0)
    hc = F.conv1d(h.transpose(1, 2), w1, _np(params["audio_embed"]["conv1"]["b"]),
                  padding=15, groups=16)
    hc = F.mish(hc)
    hc = F.conv1d(hc, w2, _np(params["audio_embed"]["conv2"]["b"]), padding=15, groups=16)
    hc = F.mish(hc).transpose(1, 2)
    h = hc + h

    cos_a, sin_a = rope_tables(cfg.dim_head, n)
    cos_c, sin_c = rope_tables(cfg.dim_head, nt)

    def block(blk, h, c, pre_only):
        if pre_only:
            mod = lin(blk["attn_norm_c"], F.silu(t))
            scale_c, shift_c = mod.chunk(2, dim=1)
            norm_c = F.layer_norm(c, (cfg.dim,), eps=1e-6) * (1 + scale_c[:, None]) + shift_c[:, None]
        else:
            mod = lin(blk["attn_norm_c"], F.silu(t))
            csm, cscm, cgm, csl, cscl, cgl = mod.chunk(6, dim=1)
            norm_c = F.layer_norm(c, (cfg.dim,), eps=1e-6) * (1 + cscm[:, None]) + csm[:, None]
        mod = lin(blk["attn_norm_x"], F.silu(t))
        xsm, xscm, xgm, xsl, xscl, xgl = mod.chunk(6, dim=1)
        norm_x = F.layer_norm(h, (cfg.dim,), eps=1e-6) * (1 + xscm[:, None]) + xsm[:, None]

        def heads(p, v, ln, unperm=False):
            w = np.asarray(p["w"])
            if unperm:  # q/k stored half-split; undo for interleaved-rope torch math
                from f5e_tts_tpu.ops.rope import unpermute_qk_weight

                w = unpermute_qk_weight(w, cfg.heads)
            out = v @ _np(w) + _np(p["b"])
            return out.view(b, ln, cfg.heads, cfg.dim_head).transpose(1, 2)

        a = blk["attn"]
        q = heads(a["to_q"], norm_x, n, unperm=True)
        k = heads(a["to_k"], norm_x, n, unperm=True)
        v = heads(a["to_v"], norm_x, n)
        cq = heads(a["to_q_c"], norm_c, nt, unperm=True)
        ck = heads(a["to_k_c"], norm_c, nt, unperm=True)
        cv = heads(a["to_v_c"], norm_c, nt)
        q = q * cos_a + rotate_half(q) * sin_a
        k = k * cos_a + rotate_half(k) * sin_a
        cq = cq * cos_c + rotate_half(cq) * sin_c
        ck = ck * cos_c + rotate_half(ck) * sin_c
        qq = torch.cat([q, cq], dim=2)
        kk = torch.cat([k, ck], dim=2)
        vv = torch.cat([v, cv], dim=2)
        o = F.scaled_dot_product_attention(qq, kk, vv)
        o = o.transpose(1, 2).reshape(b, n + nt, cfg.heads * cfg.dim_head)
        xo, co = o[:, :n], o[:, n:]
        xo = lin(a["to_out"], xo)

        if pre_only:
            c_out = None
        else:
            co = lin(a["to_out_c"], co)
            c_new = c + cgm[:, None] * co
            norm = F.layer_norm(c_new, (cfg.dim,), eps=1e-6) * (1 + cscl[:, None]) + csl[:, None]
            ffc = lin(blk["ff2_c"], F.gelu(lin(blk["ff1_c"], norm), approximate="tanh"))
            c_out = c_new + cgl[:, None] * ffc

        h_new = h + xgm[:, None] * xo
        norm = F.layer_norm(h_new, (cfg.dim,), eps=1e-6) * (1 + xscl[:, None]) + xsl[:, None]
        ffx = lin(blk["ff2_x"], F.gelu(lin(blk["ff1_x"], norm), approximate="tanh"))
        h_out = h_new + xgl[:, None] * ffx
        return h_out, c_out

    for i in range(cfg.depth - 1):
        blk = jax.tree.map(lambda a, i=i: np.asarray(a[i]), params["blocks"])
        h, c = block(blk, h, c, pre_only=False)
    h, _ = block(params["final_block"], h, c, pre_only=True)

    mod = lin(params["norm_out"], F.silu(t))
    scale, shift = mod.chunk(2, dim=1)
    h = F.layer_norm(h, (cfg.dim,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    return lin(params["proj_out"], h)


def test_mmdit_matches_torch_reference(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), CFG, VOCAB)
    # de-zero AdaLN/proj so every path carries signal
    r = np.random.default_rng(1)

    def dezero(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(r.standard_normal(a.shape).astype(np.float32)) * 0.05
            if float(jnp.abs(a).max()) == 0 else a, tree)

    for key in ("norm_out", "proj_out", "final_block"):
        params[key] = dezero(params[key])
    params["blocks"]["attn_norm_x"] = dezero(params["blocks"]["attn_norm_x"])
    params["blocks"]["attn_norm_c"] = dezero(params["blocks"]["attn_norm_c"])

    b, n, nt = 2, 16, 6
    x = rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32)
    text = rng.integers(0, VOCAB, (b, nt)).astype(np.int32)
    text[1, 4:] = -1
    time = np.asarray([0.2, 0.8], np.float32)

    ref = mmdit_forward_torch(params, CFG, _np(x), _np(cond),
                              torch.from_numpy(text).long(), _np(time)).numpy()

    f = jnp.zeros((b,), bool)
    pred = fmmdit.mmdit_forward(params, state, CFG, x=jnp.asarray(x), cond=jnp.asarray(cond),
                                text_ids=jnp.asarray(text), time=jnp.asarray(time),
                                drop_audio_cond=f, drop_text=f, compute_dtype=jnp.float32)
    # fp32 accumulation-order noise across the two implementations is ~2e-3
    # absolute on these small-magnitude outputs
    np.testing.assert_allclose(np.asarray(pred), ref, rtol=5e-2, atol=2.5e-3)
    # and the bulk of elements agree tightly
    close = np.isclose(np.asarray(pred), ref, rtol=2e-3, atol=3e-4)
    assert close.mean() > 0.85


def test_mmdit_torch_ckpt_roundtrip(rng):
    """Export to the reference torch key layout and re-ingest: params and
    forward output must survive exactly (incl. q/k half-split permutation
    and qk_norm gain permutation)."""
    from f5e_tts_tpu.utils.torch_ckpt import (backbone_from_torch,
                                              mmdit_from_torch, mmdit_to_torch)

    cfg = MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2,
                      mel_dim=10, dropout=0.0, qk_norm="rms_norm")
    params, state = fbb.init_backbone(jax.random.PRNGKey(3), cfg, VOCAB)
    # randomize everything (zeros round-trip trivially)
    r = np.random.default_rng(7)
    params = jax.tree.map(
        lambda a: jnp.asarray(r.standard_normal(a.shape).astype(np.float32)) * 0.05, params)

    sd = mmdit_to_torch(params, state, cfg)
    assert "transformer.transformer_blocks.0.attn.to_out_c.weight" in sd
    assert "transformer.transformer_blocks.2.attn.to_out_c.weight" not in sd  # pre_only
    assert "transformer.transformer_blocks.1.attn.c_q_norm.weight" in sd
    p2, _ = mmdit_from_torch(sd, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, p2)

    # dispatch goes to the mmdit path
    p3, _ = backbone_from_torch(sd, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, p3)

    b, n, nt = 1, 8, 4
    x = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    f = jnp.zeros((b,), bool)
    out1 = fmmdit.mmdit_forward(params, state, cfg, x=x, cond=x, text_ids=text,
                                time=jnp.asarray([0.5], np.float32),
                                drop_audio_cond=f, drop_text=f, compute_dtype=jnp.float32)
    out2 = fmmdit.mmdit_forward(p2, state, cfg, x=x, cond=x, text_ids=text,
                                time=jnp.asarray([0.5], np.float32),
                                drop_audio_cond=f, drop_text=f, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_mmdit_scan_unroll_equivalent(rng):
    """MMDiTConfig.scan_unroll: the block scan unrolled matches unroll=1 to
    ulp tolerance (depth=3, unroll 2 = non-divisible)."""
    import dataclasses

    from f5e_tts_tpu.models import backbone as fbb

    params, state = fbb.init_backbone(jax.random.PRNGKey(0), CFG, VOCAB)
    b, n, nt = 2, 24, 8
    x = rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32)
    text = rng.integers(0, VOCAB, (b, nt)).astype(np.int32)
    time = np.asarray([0.2, 0.8], np.float32)
    f = jnp.zeros((b,), bool)

    outs = {}
    for unroll in (1, 2, 3):
        cfg = dataclasses.replace(CFG, scan_unroll=unroll)
        pred = fmmdit.mmdit_forward(params, state, cfg, x=jnp.asarray(x),
                                    cond=jnp.asarray(x), text_ids=jnp.asarray(text),
                                    time=jnp.asarray(time), drop_audio_cond=f,
                                    drop_text=f, compute_dtype=jnp.float32)
        outs[unroll] = np.asarray(pred)
    for unroll in (2, 3):
        np.testing.assert_allclose(outs[unroll], outs[1], rtol=1e-5, atol=1e-7)
