"""WeNet attention decoder: (Bi)TransformerDecoder + label smoothing +
decode search, TPU-native.

reference: src/f5_tts/ppg/wenet/transformer/decoder.py:1-295 (Transformer /
BiTransformer decoder), decoder_layer.py:1-147, attention.py:24-135
(MultiHeadedAttention), positionwise_feed_forward.py, embedding.py:20-83
(PositionalEncoding, xscale = sqrt(d)), label_smoothing_loss.py,
utils/common.py:42-135 (add_sos_eos / reverse_pad_list / th_accuracy),
utils/mask.py (subsequent_mask).

The decoder completes the CTC-attention hybrid ASRModel (asr_model.py:40-813):
loss_att = LabelSmoothingLoss over the (left, and optionally right-to-left)
decoder outputs; decoding tools (recognize/average_model) live in
models/wenet_tools.py. Everything here is a pure function over ingested or
initialized pytrees; the forward is one jitted graph with static shapes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.utils.masks import lens_to_mask


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 5000
    dim: int = 256  # attention_dim == encoder_output_size
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0  # > 0 -> BiTransformerDecoder
    normalize_before: bool = True
    max_pos: int = 5000


IGNORE_ID = -1


# ---------------------------------------------------------------------------
# target prep (utils/common.py)
# ---------------------------------------------------------------------------


def add_sos_eos(ys_pad: np.ndarray, sos: int, eos: int,
                ignore_id: int = IGNORE_ID) -> Tuple[np.ndarray, np.ndarray]:
    """(B, L) padded targets -> (ys_in (B, L+1) with <sos>, ys_out (B, L+1)
    with <eos>); reference common.py:42-85."""
    b, l = ys_pad.shape
    lens = (ys_pad != ignore_id).sum(axis=1)
    ys_in = np.full((b, l + 1), eos, dtype=ys_pad.dtype)
    ys_out = np.full((b, l + 1), ignore_id, dtype=ys_pad.dtype)
    ys_in[:, 0] = sos
    for i in range(b):
        n = int(lens[i])
        ys_in[i, 1 : n + 1] = ys_pad[i, :n]
        ys_out[i, :n] = ys_pad[i, :n]
        ys_out[i, n] = eos
    return ys_in, ys_out


def reverse_pad_list(ys_pad: np.ndarray, ys_lens: np.ndarray,
                     pad_value: int = IGNORE_ID) -> np.ndarray:
    """Per-row reversal of the valid prefix (common.py:88-113)."""
    out = np.full_like(ys_pad, pad_value)
    for i, n in enumerate(ys_lens):
        out[i, : int(n)] = ys_pad[i, : int(n)][::-1]
    return out


def th_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                ignore_label: int = IGNORE_ID) -> jnp.ndarray:
    """Masked token accuracy (common.py:116-135)."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != ignore_label
    correct = jnp.sum((pred == targets) & mask)
    return correct / jnp.maximum(jnp.sum(mask), 1)


# ---------------------------------------------------------------------------
# init / ingest
# ---------------------------------------------------------------------------


def _init_one_decoder(key, cfg: DecoderConfig, num_blocks: int) -> dict:
    keys = iter(jax.random.split(key, 4 + num_blocks * 12))
    d, lu = cfg.dim, cfg.linear_units

    def lin(i, o, bias=True):
        return fnn.linear_init(next(keys), i, o, bias=bias)

    layers = []
    for _ in range(num_blocks):
        layers.append({
            "self_attn": {n: lin(d, d) for n in
                          ("linear_q", "linear_k", "linear_v", "linear_out")},
            "src_attn": {n: lin(d, d) for n in
                         ("linear_q", "linear_k", "linear_v", "linear_out")},
            "ff": {"w1": lin(d, lu), "w2": lin(lu, d)},
            "norm1": fnn.layernorm_init(d),
            "norm2": fnn.layernorm_init(d),
            "norm3": fnn.layernorm_init(d),
        })
    return {
        "embed": fnn.embedding_init(next(keys), cfg.vocab_size, d),
        "layers": layers,
        "after_norm": fnn.layernorm_init(d),
        "output_layer": lin(d, cfg.vocab_size),
    }


def init_decoder(key, cfg: DecoderConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = {"left": _init_one_decoder(k1, cfg, cfg.num_blocks)}
    if cfg.r_num_blocks > 0:
        params["right"] = _init_one_decoder(k2, cfg, cfg.r_num_blocks)
    return params


def _one_decoder_from_torch(sd: Dict[str, np.ndarray], prefix: str,
                            num_blocks: int) -> dict:
    def lin(k):
        p = {"w": np.ascontiguousarray(sd[f"{k}.weight"].T)}
        if f"{k}.bias" in sd:
            p["b"] = sd[f"{k}.bias"]
        return p

    def ln(k):
        return {"g": sd[f"{k}.weight"], "b": sd[f"{k}.bias"]}

    layers = []
    for i in range(num_blocks):
        k = f"{prefix}decoders.{i}"
        layers.append({
            "self_attn": {n: lin(f"{k}.self_attn.{n}") for n in
                          ("linear_q", "linear_k", "linear_v", "linear_out")},
            "src_attn": {n: lin(f"{k}.src_attn.{n}") for n in
                         ("linear_q", "linear_k", "linear_v", "linear_out")},
            "ff": {"w1": lin(f"{k}.feed_forward.w_1"),
                   "w2": lin(f"{k}.feed_forward.w_2")},
            "norm1": ln(f"{k}.norm1"),
            "norm2": ln(f"{k}.norm2"),
            "norm3": ln(f"{k}.norm3"),
        })
    return {
        "embed": {"w": sd[f"{prefix}embed.0.weight"]},
        "layers": layers,
        "after_norm": ln(f"{prefix}after_norm"),
        "output_layer": lin(f"{prefix}output_layer"),
    }


def decoder_from_torch(sd: Dict[str, np.ndarray], cfg: DecoderConfig,
                       prefix: str = "decoder.") -> dict:
    """Ingest a wenet ASR checkpoint's decoder. Handles both the plain
    TransformerDecoder key tree (decoder.decoders.*) and BiTransformerDecoder
    (decoder.left_decoder.* / decoder.right_decoder.*)."""
    if f"{prefix}left_decoder.embed.0.weight" in sd:
        params = {"left": _one_decoder_from_torch(
            sd, f"{prefix}left_decoder.", cfg.num_blocks)}
        if cfg.r_num_blocks > 0:
            params["right"] = _one_decoder_from_torch(
                sd, f"{prefix}right_decoder.", cfg.r_num_blocks)
        return params
    return {"left": _one_decoder_from_torch(sd, prefix, cfg.num_blocks)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _mha(p, q_in, k_in, v_in, mask, heads: int, compute_dtype):
    """Standard MHA; mask True = keep (attention.py:66-135: fill -inf where
    mask==0, softmax, zero where masked)."""
    b, tq, d = q_in.shape
    dk = d // heads

    def proj(pp, y):
        return fnn.linear(pp, y, compute_dtype).reshape(b, -1, heads, dk)

    q = proj(p["linear_q"], q_in).astype(jnp.float32)
    k = proj(p["linear_k"], k_in).astype(jnp.float32)
    v = proj(p["linear_v"], v_in).astype(jnp.float32)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(dk)
    if mask is not None:
        # mask: (B, Tq, Ts) or (B, 1, Ts)
        scores = jnp.where(mask[:, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(mask[:, None], attn, 0.0)
    else:
        attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(b, tq, d).astype(compute_dtype)
    return fnn.linear(p["linear_out"], out, compute_dtype)


def _decoder_layer(p, x, tgt_mask, memory, memory_mask, heads, normalize_before,
                   compute_dtype):
    """decoder_layer.py:57-147 (pre-LN path, concat_after=False, eval)."""
    res = x
    h = fnn.layernorm(p["norm1"], x, eps=1e-5) if normalize_before else x
    x = res + _mha(p["self_attn"], h, h, h, tgt_mask, heads, compute_dtype)
    if not normalize_before:
        x = fnn.layernorm(p["norm1"], x, eps=1e-5).astype(compute_dtype)

    res = x
    h = fnn.layernorm(p["norm2"], x, eps=1e-5) if normalize_before else x
    x = res + _mha(p["src_attn"], h, memory, memory, memory_mask, heads,
                   compute_dtype)
    if not normalize_before:
        x = fnn.layernorm(p["norm2"], x, eps=1e-5).astype(compute_dtype)

    res = x
    h = fnn.layernorm(p["norm3"], x, eps=1e-5) if normalize_before else x
    h = fnn.linear(p["ff"]["w1"], h, compute_dtype)
    h = jnp.maximum(h, 0.0)  # PositionwiseFeedForward default ReLU
    x = res + fnn.linear(p["ff"]["w2"], h, compute_dtype)
    if not normalize_before:
        x = fnn.layernorm(p["norm3"], x, eps=1e-5).astype(compute_dtype)
    return x.astype(compute_dtype)


def _abs_pos_table(d: int, max_len: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe = np.zeros((max_len, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def _one_decoder_forward(params, cfg: DecoderConfig, num_blocks: int,
                         memory, memory_mask, ys_in, ys_in_lens,
                         compute_dtype=jnp.float32):
    b, u = ys_in.shape
    d = cfg.dim
    # pad mask & causal mask (decoder.py:115-122)
    pad_mask = lens_to_mask(ys_in_lens, u)  # (B, U)
    causal = jnp.tril(jnp.ones((u, u), bool))
    tgt_mask = pad_mask[:, None, :] & causal[None]  # (B, U, U)

    ids = jnp.where(ys_in < 0, 0, ys_in)  # padding rows are masked out anyway
    x = fnn.embedding(params["embed"], ids.astype(jnp.int32)).astype(jnp.float32)
    x = x * math.sqrt(d) + jnp.asarray(_abs_pos_table(d, cfg.max_pos))[:u][None]
    x = x.astype(compute_dtype)

    for i in range(num_blocks):
        x = _decoder_layer(params["layers"][i], x, tgt_mask, memory, memory_mask,
                           cfg.attention_heads, cfg.normalize_before,
                           compute_dtype)
    if cfg.normalize_before:
        x = fnn.layernorm(params["after_norm"], x, eps=1e-5).astype(compute_dtype)
    logits = fnn.linear(params["output_layer"], x, compute_dtype)
    # reference returns tgt_mask.sum(1) (a (B, U) count matrix, unused by the
    # loss); we return the plain valid lengths
    return logits.astype(jnp.float32), pad_mask.sum(-1)


def decoder_forward(
    params,
    cfg: DecoderConfig,
    memory: jnp.ndarray,  # (B, T, D) encoder output
    memory_lens: jnp.ndarray,  # (B,)
    ys_in: jnp.ndarray,  # (B, U) <sos>-prefixed targets
    ys_in_lens: jnp.ndarray,  # (B,)
    r_ys_in: Optional[jnp.ndarray] = None,
    reverse_weight: float = 0.0,
    compute_dtype=jnp.float32,
):
    """(logits_l (B, U, V), logits_r or 0.0, olens). decoder.py:87-138 /
    BiTransformerDecoder :240-272."""
    memory_mask = lens_to_mask(memory_lens, memory.shape[1])[:, None, :]
    lx, olens = _one_decoder_forward(params["left"], cfg, cfg.num_blocks,
                                     memory.astype(compute_dtype), memory_mask,
                                     ys_in, ys_in_lens, compute_dtype)
    rx = jnp.zeros((), jnp.float32)
    if reverse_weight > 0.0 and "right" in params:
        assert r_ys_in is not None
        rx, _ = _one_decoder_forward(params["right"], cfg, cfg.r_num_blocks,
                                     memory.astype(compute_dtype), memory_mask,
                                     r_ys_in, ys_in_lens, compute_dtype)
    return lx, rx, olens


# ---------------------------------------------------------------------------
# losses (label_smoothing_loss.py) + hybrid attention loss (asr_model.py)
# ---------------------------------------------------------------------------


def label_smoothing_loss(logits: jnp.ndarray, target: jnp.ndarray, *,
                         smoothing: float = 0.1,
                         padding_idx: int = IGNORE_ID,
                         normalize_length: bool = False) -> jnp.ndarray:
    """KL(true_smoothed || softmax(logits)), padding masked.

    reference: label_smoothing_loss.py:58-85 — true_dist has
    smoothing/(V-1) everywhere and `confidence` at the target;
    loss = sum(KLDiv(log_softmax(x), true_dist)) / (total or batch)."""
    b, u, v = logits.shape
    x = logits.reshape(-1, v).astype(jnp.float32)
    t = target.reshape(-1)
    ignore = t == padding_idx
    t_safe = jnp.where(ignore, 0, t)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    true_dist = jnp.full((b * u, v), low, jnp.float32)
    true_dist = true_dist.at[jnp.arange(b * u), t_safe].set(confidence)
    logp = jax.nn.log_softmax(x, axis=-1)
    # KLDivLoss(reduction="none"): true * (log(true) - logp)
    kl = true_dist * (jnp.log(jnp.clip(true_dist, 1e-20)) - logp)
    kl = jnp.where(ignore[:, None], 0.0, kl)
    total = jnp.sum(~ignore)
    denom = jnp.maximum(total, 1) if normalize_length else b
    return jnp.sum(kl) / denom


def attention_loss(
    params,
    cfg: DecoderConfig,
    memory: jnp.ndarray,
    memory_lens: jnp.ndarray,
    ys_pad: np.ndarray,  # (B, L) host-side padded targets, IGNORE_ID padding
    sos: int,
    eos: int,
    *,
    smoothing: float = 0.1,
    reverse_weight: float = 0.0,
    compute_dtype=jnp.float32,
):
    """ASRModel._calc_att_loss equivalent: add_sos_eos, forward, label
    smoothing, (1-rw)*left + rw*right, th_accuracy."""
    ys_in, ys_out = add_sos_eos(np.asarray(ys_pad), sos, eos)
    ys_in_lens = (np.asarray(ys_pad) != IGNORE_ID).sum(axis=1) + 1
    r_ys_in = None
    if reverse_weight > 0.0:
        r_ys = reverse_pad_list(np.asarray(ys_pad), ys_in_lens - 1)
        r_ys_in, r_ys_out = add_sos_eos(r_ys, sos, eos)
    lx, rx, _ = decoder_forward(params, cfg, memory, memory_lens,
                                jnp.asarray(ys_in), jnp.asarray(ys_in_lens),
                                r_ys_in=jnp.asarray(r_ys_in) if r_ys_in is not None else None,
                                reverse_weight=reverse_weight,
                                compute_dtype=compute_dtype)
    loss = label_smoothing_loss(lx, jnp.asarray(ys_out), smoothing=smoothing)
    if reverse_weight > 0.0:
        r_loss = label_smoothing_loss(rx, jnp.asarray(r_ys_out),
                                      smoothing=smoothing)
        loss = loss * (1 - reverse_weight) + r_loss * reverse_weight
    acc = th_accuracy(lx, jnp.asarray(ys_out))
    return loss, acc


# ---------------------------------------------------------------------------
# decode searches
# ---------------------------------------------------------------------------


def ctc_greedy_search(ctc_logits: np.ndarray, lens: np.ndarray,
                      blank: int = 0):
    """Argmax -> collapse repeats -> drop blanks (asr_model.py
    ctc_greedy_search semantics). Returns list of token-id lists."""
    hyps = []
    ids = np.argmax(np.asarray(ctc_logits), axis=-1)
    for row, n in zip(ids, np.asarray(lens)):
        row = row[: int(n)]
        prev = blank
        hyp = []
        for t in row:
            if t != blank and t != prev:
                hyp.append(int(t))
            prev = t
        hyps.append(hyp)
    return hyps


def attention_greedy_decode(params, cfg: DecoderConfig, memory: jnp.ndarray,
                            memory_lens: jnp.ndarray, sos: int, eos: int,
                            max_len: int = 100):
    """Batch greedy attention decoding (recognize --mode attention with
    beam_size=1 semantics; full-prefix re-forward each step — tooling path,
    not a serving hot loop). Returns list of token-id lists without sos/eos."""
    b = memory.shape[0]
    ys = np.full((b, 1), sos, np.int32)
    finished = np.zeros((b,), bool)
    for _ in range(max_len):
        lens = np.full((b,), ys.shape[1], np.int64)
        logits, _, _ = decoder_forward(params, cfg, memory, memory_lens,
                                       jnp.asarray(ys), jnp.asarray(lens))
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1), np.int32)
        nxt = np.where(finished, eos, nxt)
        ys = np.concatenate([ys, nxt[:, None]], axis=1)
        finished |= nxt == eos
        if finished.all():
            break
    out = []
    for row in ys[:, 1:]:
        hyp = []
        for t in row:
            if int(t) == eos:
                break
            hyp.append(int(t))
        out.append(hyp)
    return out
