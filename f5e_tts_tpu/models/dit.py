"""DiT backbone (AdaLN-zero diffusion transformer) — pure functional JAX.

reference semantics: src/f5_tts/model/backbones/dit.py:183-549 and
src/f5_tts/model/modules.py:610-641 (DiTBlock). TPU-first design choices:

- the `depth` transformer blocks are parameter-stacked and driven by one
  `lax.scan`, so XLA traces a single block (fast compile, clean remat),
- CFG condition-dropping is expressed with *per-sample* boolean flags, so all
  CFG passes of the sampler fold into one batched forward (the trick the
  reference's TensorRT-LLM engine uses — f5_tts_trtllm.py:390-416 — here it is
  the native formulation),
- text/PPG embeddings are time-independent and computed once per utterance
  (the reference caches text embeddings across ODE steps, dit.py:437-444),
- matmuls run in bf16 with fp32 accumulation; norms/modulation in fp32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import DiTConfig
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops import convnext as fcnx
from f5e_tts_tpu.ops import mas as fmas
from f5e_tts_tpu.ops import vq as fvq
from f5e_tts_tpu.ops.attention import attention, attention_init
from f5e_tts_tpu.ops.rope import rotary_cos_sin_half as rotary_cos_sin
from f5e_tts_tpu.utils.masks import lens_to_mask


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_dit(key, cfg: DiTConfig, vocab_size: int):
    """Build the parameter pytree (+ mutable state for PPG BatchNorm).

    Weight init mirrors the reference: AdaLN modulation linears and proj_out
    zero-initialized (dit.py:273-283), everything else torch defaults.
    """
    keys = iter(jax.random.split(key, 64 + cfg.depth * 2))
    text_dim = cfg.text_dim if cfg.text_dim is not None else cfg.mel_dim

    params = {}
    state = {}

    # timestep embedding (modules.py:721-731): sinus(256) -> Linear -> SiLU -> Linear
    params["time_embed"] = {
        "mlp1": fnn.linear_init(next(keys), 256, cfg.dim),
        "mlp2": fnn.linear_init(next(keys), cfg.dim, cfg.dim),
    }

    # text embedding (dit.py:37-87)
    params["text_embed"] = {
        "embed": fnn.embedding_init(next(keys), vocab_size + 1, text_dim),
        "blocks": [fcnx.convnext_v2_init(next(keys), text_dim, text_dim * 2) for _ in range(cfg.conv_layers)],
    }

    # ppg embedding (dit.py:93-153), conv variant
    if cfg.ppg.use_ppg:
        pd = cfg.ppg.ppg_dim
        bn_params, bn_states = [], []
        convs = []
        for _ in range(3):
            convs.append(fnn.conv1d_init(next(keys), pd, pd, kernel=5))
            p, s = fnn.batchnorm_init(pd)
            bn_params.append(p)
            bn_states.append(s)
        params["ppg_embed"] = {
            "pre": fnn.linear_init(next(keys), pd, pd),
            "convs": convs,
            "bns": bn_params,
            "post": fnn.linear_init(next(keys), pd, text_dim),
        }
        state["ppg_bn"] = bn_states

    # input embedding (dit.py:159-177)
    in_dim = cfg.mel_dim * 2 + text_dim * (2 if cfg.ppg.use_ppg else 1)
    params["input_embed"] = {
        "proj": fnn.linear_init(next(keys), in_dim, cfg.dim),
        "conv1": fnn.conv1d_init(next(keys), cfg.dim, cfg.dim, kernel=31, groups=16),
        "conv2": fnn.conv1d_init(next(keys), cfg.dim, cfg.dim, kernel=31, groups=16),
    }

    # transformer blocks, parameter-stacked for lax.scan
    def one_block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            # AdaLN-zero (dit.py:276-277)
            "attn_norm": fnn.linear_zero_init(cfg.dim, cfg.dim * 6),
            "attn": attention_init(k1, cfg.dim, cfg.heads, cfg.dim_head, cfg.qk_norm),
            "ff1": fnn.linear_init(k3, cfg.dim, int(cfg.dim * cfg.ff_mult)),
            "ff2": fnn.linear_init(k4, int(cfg.dim * cfg.ff_mult), cfg.dim),
        }

    blocks = [one_block(next(keys)) for _ in range(cfg.depth)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.long_skip_connection:
        params["long_skip"] = fnn.linear_init(next(keys), cfg.dim * 2, cfg.dim, bias=False)

    # final AdaLN + proj, zero-init (dit.py:280-283)
    params["norm_out"] = fnn.linear_zero_init(cfg.dim, cfg.dim * 2)
    params["proj_out"] = fnn.linear_zero_init(cfg.dim, cfg.mel_dim)

    if cfg.codebook.use_codebook:
        params["quantizer"] = fvq.gumbel_vq_init(next(keys), cfg.codebook, text_dim)

    return params, state


# ---------------------------------------------------------------------------
# embedding stages (time-independent; computed once per utterance)
# ---------------------------------------------------------------------------


def time_embed(params, time: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B,) -> (B, dim). reference: modules.py:721-731."""
    h = fnn.sinus_time_embedding(time, 256)
    h = fnn.linear(params["time_embed"]["mlp1"], h.astype(compute_dtype), compute_dtype)
    h = fnn.silu(h)
    return fnn.linear(params["time_embed"]["mlp2"], h, compute_dtype)


def text_embed_fn(
    params,
    cfg: DiTConfig,
    text_ids: Optional[jnp.ndarray],  # (B, NT) int, pad = -1; None -> all filler
    batch: int,
    seq_len: int,
    drop_text: jnp.ndarray,  # (B,) bool
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Text -> (B, N, text_dim). reference: dit.py:37-87 (TextEmbedding).

    ids are shifted by +1 (0 = filler), curtailed/padded to the mel length,
    the padding mask is derived *before* CFG drop (matching reference order),
    absolute sinusoidal position table added, then ConvNeXtV2 blocks with
    optional padding re-masking between blocks.
    """
    text_dim = cfg.text_dim if cfg.text_dim is not None else cfg.mel_dim
    if text_ids is None:
        ids = jnp.zeros((batch, seq_len), jnp.int32)
        text_mask = None
    else:
        ids = text_ids.astype(jnp.int32) + 1  # 0 becomes the filler token
        nt = ids.shape[1]
        if nt >= seq_len:
            ids = ids[:, :seq_len]
        else:
            ids = jnp.pad(ids, ((0, 0), (0, seq_len - nt)))
        text_mask = ids == 0 if cfg.text_mask_padding else None
        ids = jnp.where(drop_text[:, None], 0, ids)

    emb = fnn.embedding(params["text_embed"]["embed"], ids).astype(compute_dtype)

    # "extra modeling" applies ONLY when conv layers exist (dit.py:44-51,71-85):
    # abs sinus position table + ConvNeXtV2 blocks (+ padding re-masking)
    if cfg.conv_layers > 0:
        table = jnp.asarray(fnn.precompute_freqs_cis(text_dim, cfg.max_pos))
        emb = emb + table[:seq_len][None, :, :].astype(compute_dtype)

        if text_mask is not None:
            emb = jnp.where(text_mask[:, :, None], 0.0, emb).astype(compute_dtype)
            for blk in params["text_embed"]["blocks"]:
                emb = fcnx.convnext_v2(blk, emb, compute_dtype=compute_dtype)
                emb = jnp.where(text_mask[:, :, None], 0.0, emb).astype(compute_dtype)
        else:
            for blk in params["text_embed"]["blocks"]:
                emb = fcnx.convnext_v2(blk, emb, compute_dtype=compute_dtype)
    return emb


def ppg_embed_fn(
    params,
    state,
    cfg: DiTConfig,
    ppg: Optional[jnp.ndarray],  # (B, NP, ppg_dim); None -> zeros
    batch: int,
    seq_len: int,
    drop_ppg: jnp.ndarray,  # (B,) bool
    training: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
):
    """PPG -> (B, N, text_dim), conv projector variant.

    reference: dit.py:93-153 — Linear -> 3x(Conv1d k5 + BN + ReLU + Dropout .5)
    -> Linear(text_dim). Returns (emb, new_bn_state).
    """
    pd = cfg.ppg.ppg_dim
    if ppg is None:
        x = jnp.zeros((batch, seq_len, pd), compute_dtype)
    else:
        np_len = ppg.shape[1]
        if np_len >= seq_len:
            x = ppg[:, :seq_len]
        else:
            x = jnp.pad(ppg, ((0, 0), (0, seq_len - np_len), (0, 0)))
        x = jnp.where(drop_ppg[:, None, None], 0.0, x).astype(compute_dtype)

    pp = params["ppg_embed"]
    new_bns = []
    h = fnn.linear(pp["pre"], x, compute_dtype)
    for i in range(3):
        h = fnn.conv1d(pp["convs"][i], h, padding=2, compute_dtype=compute_dtype)
        h, ns = fnn.batchnorm(pp["bns"][i], state["ppg_bn"][i], h, training=training)
        new_bns.append(ns)
        h = jnp.maximum(h, 0.0)
        if training and rng is not None:
            rng, sub = jax.random.split(rng)
            h = fnn.dropout(sub, h, 0.5, training)
    h = fnn.linear(pp["post"], h, compute_dtype)
    return h, {"ppg_bn": new_bns}


def input_embed_fn(
    params,
    cfg: DiTConfig,
    x: jnp.ndarray,  # (B, N, mel)
    cond: jnp.ndarray,  # (B, N, mel)
    text_embed: jnp.ndarray,  # (B, N, text_dim)
    ppg_embed: Optional[jnp.ndarray],
    drop_audio_cond: jnp.ndarray,  # (B,) bool
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Concat-project + conv position embedding. reference: dit.py:159-177,
    modules.py:167-190 (ConvPositionEmbedding: 2x grouped conv k31 + Mish)."""
    ie = params["input_embed"]
    cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond).astype(compute_dtype)
    parts = [x.astype(compute_dtype), cond, text_embed.astype(compute_dtype)]
    if ppg_embed is not None:
        parts.append(ppg_embed.astype(compute_dtype))
    h = fnn.linear(ie["proj"], jnp.concatenate(parts, axis=-1), compute_dtype)
    c = fnn.conv1d(ie["conv1"], h, groups=16, padding=15, compute_dtype=compute_dtype)
    c = fnn.mish(c)
    c = fnn.conv1d(ie["conv2"], c, groups=16, padding=15, compute_dtype=compute_dtype)
    c = fnn.mish(c)
    return (c + h).astype(compute_dtype)


# ---------------------------------------------------------------------------
# transformer trunk
# ---------------------------------------------------------------------------


def _dit_block(blk, x, t_emb, mask, rope_cos, rope_sin, cfg: DiTConfig,
               dropout_rng=None, training=False, compute_dtype=jnp.bfloat16):
    """One DiT block. reference: modules.py:610-641."""
    # AdaLN (modules.py:301-315): chunk order shift/scale/gate msa, shift/scale/gate mlp
    mod = fnn.linear(blk["attn_norm"], fnn.silu(t_emb), compute_dtype)  # (B, 6D)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

    norm = fnn.layernorm(None, x, eps=1e-6).astype(compute_dtype)
    norm = norm * (1 + scale_msa[:, None, :]) + shift_msa[:, None, :]

    attn_out = attention(
        blk["attn"], norm, cfg.heads, mask=mask,
        rope_cos=rope_cos, rope_sin=rope_sin,
        pe_attn_head=cfg.pe_attn_head, qk_norm=cfg.qk_norm,
        compute_dtype=compute_dtype,
    )
    if training and dropout_rng is not None and cfg.dropout > 0:
        dropout_rng, sub = jax.random.split(dropout_rng)
        attn_out = fnn.dropout(sub, attn_out, cfg.dropout, training)

    # fused: x += gate*attn_out; LN; *(1+scale)+shift — one HBM pass (Pallas)
    from f5e_tts_tpu.ops.pallas_norm import gated_adaln

    x, norm = gated_adaln(x, attn_out, gate_msa, scale_mlp, shift_mlp)
    norm = norm.astype(compute_dtype)
    h = fnn.linear(blk["ff1"], norm, compute_dtype)
    h = fnn.gelu(h, approximate="tanh")
    from jax.ad_checkpoint import checkpoint_name

    h = checkpoint_name(h, "ff_hidden")  # saved under remat_policy=save_attn_ff
    if training and dropout_rng is not None and cfg.dropout > 0:
        dropout_rng, sub = jax.random.split(dropout_rng)
        h = fnn.dropout(sub, h, cfg.dropout, training)
    h = fnn.linear(blk["ff2"], h, compute_dtype)
    x = x + gate_mlp[:, None, :] * h
    return x.astype(compute_dtype)


def dit_trunk(params, cfg: DiTConfig, x, t_emb, mask, seq_len,
              training=False, rng=None, compute_dtype=jnp.bfloat16):
    """Scan over the stacked blocks + final AdaLN + projection.

    reference: dit.py:459-472 / 533-544.
    """
    rope_cos_np, rope_sin_np = rotary_cos_sin(cfg.dim_head, seq_len)
    rope_cos = jnp.asarray(rope_cos_np)
    rope_sin = jnp.asarray(rope_sin_np)

    if cfg.long_skip_connection:
        residual = x

    if training and rng is not None:
        layer_rngs = jax.random.split(rng, cfg.depth)
    else:
        layer_rngs = jnp.zeros((cfg.depth, 2), jnp.uint32)

    # fused qkv projection: one (dim, 3*inner) gemm per block instead of
    # three (XLA does not merge sibling dots). Built ONCE here over the
    # stacked (depth, ...) weights — outside the scan, so no per-step concat.
    # Skipped under tensor parallelism (to_q/k/v are column-sharded
    # separately; concat would reshard).
    from f5e_tts_tpu.ops.attention import _tp_shards

    blocks = params["blocks"]
    attn_p = blocks["attn"]
    import os

    fuse = os.environ.get("F5E_FUSED_QKV", "1") != "0"
    if fuse and "to_qkv" not in attn_p and _tp_shards() == 1:
        qkv = {"w": jnp.concatenate(
            [attn_p["to_q"]["w"], attn_p["to_k"]["w"], attn_p["to_v"]["w"]],
            axis=-1).astype(compute_dtype)}
        if "b" in attn_p["to_q"]:
            qkv["b"] = jnp.concatenate(
                [attn_p["to_q"]["b"], attn_p["to_k"]["b"], attn_p["to_v"]["b"]],
                axis=-1).astype(compute_dtype)
        blocks = {**blocks, "attn": {**attn_p, "to_qkv": qkv}}

    def block_fn(h, scanned, t_e, mk):
        blk, lr = scanned
        return _dit_block(blk, h, t_e, mk, rope_cos, rope_sin, cfg,
                          dropout_rng=lr if training else None,
                          training=training, compute_dtype=compute_dtype)

    if cfg.checkpoint_activations:
        policy = getattr(cfg, "remat_policy", "block")
        if policy == "save_attn":
            # keep each block's named attention output (ops/attention.py
            # tags it "attn_out") so the backward recompute rebuilds q/k/v
            # via cheap matmuls but skips re-running the attention kernel
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
        elif policy == "save_attn_ff":
            # additionally keep the FF gelu activation ("ff_hidden",
            # _dit_block) — skips the ff1 matmul + gelu recompute at the cost
            # of B x N x ff_mult*D bf16 per layer of extra residency (2x the
            # attn_out save); profitable only when the batch still fits
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "ff_hidden"))
        else:
            block_fn = jax.checkpoint(block_fn)

    from f5e_tts_tpu.parallel.pipeline import gpipe_scan, pp_context, pp_shards

    if pp_shards() > 1:
        # pipeline parallelism over the depth axis (parallel/pipeline.py):
        # stages hold contiguous block slices, microbatches flow via
        # ppermute. Requires tp==1 (the head-sharding shard_map cannot nest
        # inside the pipe shard_map).
        assert _tp_shards() == 1, "pipeline parallelism requires tp == 1"
        # ring attention's shard_map cannot nest inside the pipe shard_map
        # either — same restriction as tp, so refuse an active SP context
        from f5e_tts_tpu.ops.attention import _SP as _sp_ctx
        assert (_sp_ctx["mesh"] is None
                or _sp_ctx["axis"] not in _sp_ctx["mesh"].shape
                or int(_sp_ctx["mesh"].shape[_sp_ctx["axis"]]) == 1), (
            "pipeline parallelism requires seq == 1: clear the SP context "
            "(set_sp_context(None)) — ring attention cannot nest inside the "
            "pipe shard_map")
        pp_mesh, pp_axis, n_micro = pp_context()
        mask_b = mask if mask is not None else jnp.ones(
            (x.shape[0], x.shape[1]), bool)
        # batch dim stays sharded over whatever data axes the mesh carries;
        # the pipeline runs per data replica on its local shard
        batch_axes = tuple(a for a in ("data", "fsdp")
                           if a in pp_mesh.axis_names and pp_mesh.shape[a] > 1)
        # fold the microbatch index into the per-layer dropout rngs so the
        # M microbatches draw independent masks (without this, rows i and
        # i+B/M of the batch would share every dropout mask)
        fold = None
        if training:
            def fold(sl, m):
                blk_sl, rngs_sl = sl
                return blk_sl, jax.vmap(
                    lambda r: jax.random.fold_in(r, m))(rngs_sl)
        x = gpipe_scan(
            lambda h, sl, t_e, mk: block_fn(h, sl, t_e, mk),
            x, (blocks, layer_rngs), pp_mesh, axis=pp_axis, n_micro=n_micro,
            batched=(t_emb, mask_b), batch_axes=batch_axes or None,
            fold_scanned=fold)
    else:
        def body(h, scanned):
            return block_fn(h, scanned, t_emb, mask), None

        x, _ = jax.lax.scan(body, x, (blocks, layer_rngs),
                            unroll=getattr(cfg, "scan_unroll", 1))

    if cfg.long_skip_connection:
        x = fnn.linear(params["long_skip"], jnp.concatenate([x, residual], axis=-1), compute_dtype)

    # final AdaLN (modules.py:322-336): chunk order = (scale, shift)!
    mod = fnn.linear(params["norm_out"], fnn.silu(t_emb), compute_dtype)
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = fnn.layernorm(None, x, eps=1e-6).astype(compute_dtype)
    x = x * (1 + scale[:, None, :]) + shift[:, None, :]
    pred = fnn.linear(params["proj_out"], x, compute_dtype)
    return pred.astype(jnp.float32)


# ---------------------------------------------------------------------------
# full forward passes
# ---------------------------------------------------------------------------


class DiTExtras(NamedTuple):
    extra_loss: jnp.ndarray
    new_state: dict
    align_loss: jnp.ndarray
    perplex_loss: jnp.ndarray


def dit_sample_step(
    params,
    state,
    cfg: DiTConfig,
    *,
    x: jnp.ndarray,  # (B, N, mel) noised input
    cond: jnp.ndarray,  # (B, N, mel) masked cond audio
    text_embed: jnp.ndarray,  # (B, N, text_dim) PRECOMPUTED (cache semantics, dit.py:437-444)
    time: jnp.ndarray,  # (B,)
    drop_audio_cond: jnp.ndarray,  # (B,) bool
    ppg_embed: Optional[jnp.ndarray] = None,  # (B, N, text_dim) precomputed or None
    mask: Optional[jnp.ndarray] = None,  # (B, N)
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Inference forward with precomputed conditioning embeddings.

    reference: dit.py:417-472 (DiT.sample). Time-dependent part only: the
    input embedding, trunk, and output projection.
    """
    b, n, _ = x.shape
    t_emb = time_embed(params, time, compute_dtype)
    h = input_embed_fn(params, cfg, x, cond, text_embed, ppg_embed, drop_audio_cond, compute_dtype)
    return dit_trunk(params, cfg, h, t_emb, mask, n, compute_dtype=compute_dtype)


def dit_forward(
    params,
    state,
    cfg: DiTConfig,
    *,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    text_ids: Optional[jnp.ndarray],
    time: jnp.ndarray,
    drop_audio_cond: jnp.ndarray,  # (B,) bool
    drop_text: jnp.ndarray,  # (B,) bool
    drop_ppg: jnp.ndarray,  # (B,) bool
    ppg: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    text_len: Optional[jnp.ndarray] = None,  # (B,) valid text lengths (codebook path)
    ppg_len: Optional[jnp.ndarray] = None,  # (B,)
    training: bool = False,
    rng: Optional[jax.Array] = None,
    vq_temperature: float | jnp.ndarray = 2.0,
    compute_dtype=jnp.bfloat16,
):
    """Full training/plain forward. reference: dit.py:474-549 (DiT.forward).

    Returns (pred, DiTExtras). Codebook extras (align loss, perplexity loss,
    cross-masking) follow dit.py:502-524 with traced randomness.
    """
    b, n, _ = x.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_vq_t, r_vq_p, r_perm_t, r_perm_p, r_cross, r_ppgdrop, r_trunk = jax.random.split(rng, 7)

    t_emb = time_embed(params, time, compute_dtype)
    text_embed = text_embed_fn(params, cfg, text_ids, b, n, drop_text, compute_dtype)

    new_state = state
    ppg_embed = None
    if cfg.ppg.use_ppg:
        ppg_embed, new_state = ppg_embed_fn(params, state, cfg, ppg, b, n, drop_ppg,
                                            training=training, rng=r_ppgdrop,
                                            compute_dtype=compute_dtype)

    align_loss = jnp.zeros((), jnp.float32)
    perplex_loss = jnp.zeros((), jnp.float32)

    # "use both modal" is a per-batch scalar in the reference (python bools);
    # we keep per-sample drops, so gate the extra losses on all-samples-keep.
    use_both = jnp.logical_and(~jnp.any(drop_text), ~jnp.any(drop_ppg))

    cb = cfg.codebook
    if cb.use_codebook and training and cfg.ppg.use_ppg:
        assert text_len is not None and ppg_len is not None
        attn = _align_text_ppg(text_embed, text_len, ppg_embed, ppg_len)  # (B, NT, NP)

        if cb.use_align_loss:
            al = _calc_align_loss(params, cb, attn, text_embed, text_len, ppg_embed,
                                  vq_temperature, training, (r_vq_t, r_vq_p))
            al = jnp.where(jnp.isnan(al), 0.0, al)  # NaN guard (dit.py:511-514)
            align_loss = jnp.where(use_both, al, 0.0)

        if cb.use_perplex_loss:
            text_embed, ppg_embed, pl = _perplex_loss(
                params, cb, text_embed, ppg_embed, drop_text, drop_ppg,
                vq_temperature, training, (r_vq_t, r_vq_p, r_perm_t, r_perm_p))
            perplex_loss = pl

        if cfg.ppg.use_cross_mask:
            r_apply, r_mask = jax.random.split(r_cross)
            apply_cm = jnp.logical_and(
                use_both, jax.random.uniform(r_apply) < cfg.ppg.cross_mask_prob)
            mt, mp = _cross_mask(r_mask, attn, text_embed, text_len, ppg_embed, ppg_len)
            text_embed = jnp.where(apply_cm, mt, text_embed)
            ppg_embed = jnp.where(apply_cm, mp, ppg_embed)

    h = input_embed_fn(params, cfg, x, cond, text_embed, ppg_embed, drop_audio_cond, compute_dtype)
    pred = dit_trunk(params, cfg, h, t_emb, mask, n, training=training, rng=r_trunk,
                     compute_dtype=compute_dtype)

    extras = DiTExtras(
        extra_loss=align_loss + perplex_loss,
        new_state=new_state,
        align_loss=align_loss,
        perplex_loss=perplex_loss,
    )
    return pred, extras


# ---------------------------------------------------------------------------
# codebook internals (reference: dit.py:296-415)
# ---------------------------------------------------------------------------


def _align_text_ppg(text_embed, text_len, ppg_embed, ppg_len):
    """MAS alignment between text and PPG embeddings -> (B, NT, NP) 0/1.

    reference: dit.py:310-331 — grid is (B, NP, NT) with y=ppg, x=text;
    returned transposed to (B, NT, NP).
    """
    grid = fmas.neg_cent_grid(text_embed, ppg_embed)  # (B, NP, NT)
    grid = jax.lax.stop_gradient(grid)
    path = fmas.maximum_path(grid, ppg_len, text_len)  # (B, NP, NT)
    return jnp.transpose(path, (0, 2, 1))


def _calc_align_loss(params, cb, attn, text_embed, text_len, ppg_embed,
                     temperature, training, rngs):
    """Straight-through-quantized MSE between text tokens and their attn-averaged
    PPG embeddings. reference: dit.py:333-360."""
    r_t, r_p = rngs
    tq = fvq.gumbel_vq_apply(params["quantizer"], cb, text_embed.astype(jnp.float32),
                             training=training, temperature=temperature, rng=r_t).x
    pq = fvq.gumbel_vq_apply(params["quantizer"], cb, ppg_embed.astype(jnp.float32),
                             training=training, temperature=temperature, rng=r_p).x
    te = text_embed.astype(jnp.float32)
    pe = ppg_embed.astype(jnp.float32)
    tq = te + jax.lax.stop_gradient(tq - te)
    pq = pe + jax.lax.stop_gradient(pq - pe)

    summed = jnp.einsum("btp,bpd->btd", attn, pq, precision=jax.lax.Precision.HIGHEST)
    counts = jnp.clip(attn.sum(axis=2), min=1e-8)
    avg_ppg = summed / counts[:, :, None]

    loss = jnp.mean(jnp.square(tq - avg_ppg), axis=2)  # (B, NT)
    m = lens_to_mask(text_len, text_embed.shape[1]).astype(jnp.float32)
    total = jnp.sum(loss * m) / (jnp.sum(m) + 1e-8)
    return total * cb.align_loss_weight


def _perplex_loss(params, cb, text_embed, ppg_embed, drop_text, drop_ppg,
                  temperature, training, rngs):
    """Quantize a random `perplex_loss_prob` fraction of positions; diversity loss.

    reference: dit.py:364-384. Positions are shared across the batch (reference
    uses one randperm per modality). Per-sample drop gating uses `where`.
    """
    r_t, r_p, r_perm_t, r_perm_p = rngs
    loss = jnp.zeros((), jnp.float32)

    def mix(embed, vq_rng, perm_rng):
        res = fvq.gumbel_vq_apply(params["quantizer"], cb, embed.astype(jnp.float32),
                                  training=training, temperature=temperature, rng=vq_rng)
        t = embed.shape[1]
        k = int(t * cb.perplex_loss_prob)
        perm = jax.random.permutation(perm_rng, t)[:k]
        w = jnp.zeros((t,), jnp.float32).at[perm].set(1.0)
        mixed = w[None, :, None] * res.x + (1 - w)[None, :, None] * embed.astype(jnp.float32)
        ploss = (res.num_vars - res.prob_perplexity) / res.num_vars
        return mixed, ploss

    mixed_t, pl_t = mix(text_embed, r_t, r_perm_t)
    keep_t = ~jnp.any(drop_text)
    text_out = jnp.where(keep_t, mixed_t.astype(text_embed.dtype), text_embed)
    loss = loss + jnp.where(keep_t, pl_t, 0.0)

    mixed_p, pl_p = mix(ppg_embed, r_p, r_perm_p)
    keep_p = ~jnp.any(drop_ppg)
    ppg_out = jnp.where(keep_p, mixed_p.astype(ppg_embed.dtype), ppg_embed)
    loss = loss + jnp.where(keep_p, pl_p, 0.0)

    return text_out, ppg_out, loss * cb.perplex_loss_weight


def _cross_mask(rng, attn, text_embed, text_len, ppg_embed, ppg_len):
    """Mask a random 30-70% text span; mask the complementary PPG frames via
    the MAS argmax. reference: dit.py:386-415."""
    b, nt, _ = text_embed.shape
    npg = ppg_embed.shape[1]
    r1, r2 = jax.random.split(rng)

    text_valid = lens_to_mask(text_len, nt)
    ppg_valid = lens_to_mask(ppg_len, npg)

    mask_ratio = 0.3 + 0.4 * jax.random.uniform(r1, (b,))
    tl = text_len.astype(jnp.float32)
    mask_len = jnp.maximum((mask_ratio * tl), 1.0).astype(jnp.int32)
    start_max = text_len.astype(jnp.int32) - mask_len
    start = (start_max.astype(jnp.float32) * jax.random.uniform(r2, (b,))).astype(jnp.int32)
    idx = jnp.arange(nt)[None, :]
    end = start + mask_len
    text_keep = (idx < start[:, None]) | (idx >= end[:, None])  # True = keep
    text_keep = text_keep & text_valid

    ppg_to_text = jnp.argmax(attn, axis=1)  # (B, NP)
    ppg_keep = jnp.take_along_axis(text_keep, ppg_to_text, axis=1)
    ppg_keep = (~ppg_keep) & ppg_valid  # complementary

    mt = jnp.where(text_keep[:, :, None], text_embed, 0.0).astype(text_embed.dtype)
    mp = jnp.where(ppg_keep[:, :, None], ppg_embed, 0.0).astype(ppg_embed.dtype)
    return mt, mp
