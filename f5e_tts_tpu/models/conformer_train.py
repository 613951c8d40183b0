"""PPG ASR (Conformer) training: CE + CTC hybrid loss and a jitted train step.

reference: src/f5_tts/ppg/asr_model.py (forward loss combination :200-221,
SoftmaxLoss CE head, CTC head ctc.py:1-70) and wenet/bin/train.py (torch DDP
loop :141,238). TPU redesign: one jitted step with GSPMD data parallelism;
CTC via optax.ctc_loss; the frame-level CE path (PPG supervision) is the one
the frozen 33.pt model was trained with.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from f5e_tts_tpu.models.conformer import ConformerConfig, conformer_encode
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.utils.masks import lens_to_mask


def init_asr_heads(key, cfg: ConformerConfig, vocab_size: int):
    """CE (frame-level phone) head + CTC head over the encoder output.

    reference: asr_model.py:77-90 — `linear` content layer then
    SoftmaxLoss(output_size, vocab+1); CTC projects encoder output to vocab.
    """
    k1, k2 = jax.random.split(key)
    d = cfg.output_size
    return {
        "ce": fnn.linear_init(k1, d, vocab_size + 1),
        "ctc": fnn.linear_init(k2, d, vocab_size),
    }


class ASRLossOut(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    ctc_loss: jnp.ndarray
    acc: jnp.ndarray
    sv_loss: jnp.ndarray = jnp.zeros(())
    sv_acc: jnp.ndarray = jnp.zeros(())


def asr_loss(
    encoder_params,
    heads,
    cfg: ConformerConfig,
    feats: jnp.ndarray,  # (B, T, 80)
    feat_lens: jnp.ndarray,
    frame_labels: Optional[jnp.ndarray] = None,  # (B, T') per-frame phone ids, -1 pad
    ctc_labels: Optional[jnp.ndarray] = None,  # (B, U) token ids, 0 = pad/blank
    ctc_label_lens: Optional[jnp.ndarray] = None,
    ppg_weight: float = 0.5,
    compute_dtype=jnp.float32,
    sv_params: Optional[dict] = None,  # speaker branch (asr_model.py:92-104)
    spk_label: Optional[jnp.ndarray] = None,  # (B,)
    sv_weight: float = 0.0,
    sv_loss_kind: str = "softmax",
    grl_coeff: float = 1.0,
    chunk_mask: Optional[jnp.ndarray] = None,  # (T', T') dynamic-chunk mask
) -> ASRLossOut:
    """loss = ppg_weight * CE + (1 - ppg_weight) * CTC, + sv_weight * SV when
    the GRL speaker branch is on (asr_model.py:204-221). chunk_mask enables
    wenet use_dynamic_chunk training (sample_train_chunk_mask host-side)."""
    enc, enc_lens = conformer_encode(encoder_params, cfg, feats, feat_lens,
                                     compute_dtype, chunk_mask=chunk_mask)
    content = fnn.linear(encoder_params["content_linear"], enc, compute_dtype)

    ce = jnp.zeros((), jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    if frame_labels is not None:
        logits = fnn.linear(heads["ce"], content, compute_dtype).astype(jnp.float32)
        tlen = min(logits.shape[1], frame_labels.shape[1])
        logits = logits[:, :tlen]
        labels = frame_labels[:, :tlen]
        valid = (labels >= 0) & lens_to_mask(enc_lens, tlen)
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        ce = jnp.sum(jnp.where(valid, nll, 0.0)) / denom
        acc = jnp.sum(jnp.where(valid, (jnp.argmax(logits, -1) == safe), False)) / denom

    ctc = jnp.zeros((), jnp.float32)
    if ctc_labels is not None:
        logits = fnn.linear(heads["ctc"], enc, compute_dtype).astype(jnp.float32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        pad_logits = 1.0 - lens_to_mask(enc_lens, logits.shape[1]).astype(jnp.float32)
        pad_labels = 1.0 - lens_to_mask(ctc_label_lens, ctc_labels.shape[1]).astype(jnp.float32)
        per_seq = optax.ctc_loss(logprobs, pad_logits, ctc_labels, pad_labels)
        ctc = jnp.mean(per_seq)

    sv = jnp.zeros((), jnp.float32)
    sv_acc = jnp.zeros((), jnp.float32)
    if sv_params is not None and spk_label is not None:
        sv, sv_acc = sv_loss_fn(sv_params, content, enc_lens, spk_label,
                                sv_loss=sv_loss_kind, grl_coeff=grl_coeff)

    if frame_labels is not None and ctc_labels is not None:
        loss = ppg_weight * ce + (1.0 - ppg_weight) * ctc
    elif frame_labels is not None:
        loss = ce
    else:
        loss = ctc
    if sv_params is not None and spk_label is not None:
        loss = loss + sv_weight * sv  # asr_model.py:207-221
    return ASRLossOut(loss=loss, ce_loss=ce, ctc_loss=ctc, acc=acc,
                      sv_loss=sv, sv_acc=sv_acc)


def make_asr_train_step(cfg: ConformerConfig, optimizer, ppg_weight: float = 0.5,
                        compute_dtype=jnp.float32):
    """Jitted (params, opt_state, batch, rng) -> updated state + metrics."""

    def step(params, heads, opt_state, batch):
        def loss_fn(trainable):
            p, h = trainable
            out = asr_loss(p, h, cfg, batch["feats"], batch["feat_lens"],
                           batch.get("frame_labels"), batch.get("ctc_labels"),
                           batch.get("ctc_label_lens"), ppg_weight, compute_dtype,
                           chunk_mask=batch.get("chunk_mask"))
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)((params, heads))
        updates, new_opt = optimizer.update(grads, opt_state, (params, heads))
        new_params, new_heads = optax.apply_updates((params, heads), updates)
        return new_params, new_heads, new_opt, out

    return jax.jit(step, donate_argnums=(0, 1, 2))


# ---------------------------------------------------------------------------
# speaker-verification branch with gradient reversal (asr_model.py:92-104,
# 154-159; wenet/utils/grl.py; wenet/transformer/etc.py)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def grad_reverse(x, coeff: float = 1.0):
    """Identity forward, -coeff * grad backward (grl.py:8-27)."""
    return x


def _gr_fwd(x, coeff):
    return x, coeff


def _gr_bwd(coeff, g):
    return (-coeff * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


def stats_pool(x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D), lens -> (B, 2D) mean||std over the min-length prefix.

    reference: asr_model.py:155-157 truncates to enc_lens.min() then
    StatsPool (etc.py:40-45) takes unmasked mean/std; the masked-weight form
    here equals truncation without a dynamic slice."""
    t = x.shape[1]
    min_len = jnp.min(lens)
    w = (jnp.arange(t)[None, :] < min_len).astype(jnp.float32)
    denom = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf * w[:, :, None], axis=1) / denom
    var = jnp.sum(jnp.square(xf - mean[:, None, :]) * w[:, :, None], axis=1) / denom
    # torch.std defaults to the unbiased estimator (n-1)
    n = jnp.maximum(denom - 1.0, 1.0)
    std = jnp.sqrt(var * denom / n + 1e-12)
    return jnp.concatenate([mean, std], axis=-1)


def init_sv_branch(key, cfg: ConformerConfig, spk_num: int, spk_dim: int = 128,
                   sv_loss: str = "softmax"):
    """sv_linear(2D -> spk_dim) + classifier head (asr_model.py:98-103)."""
    k1, k2 = jax.random.split(key)
    d = cfg.output_size
    params = {"sv_linear": fnn.linear_init(k1, 2 * d, spk_dim)}
    if sv_loss == "softmax":
        params["sv_fc"] = fnn.linear_init(k2, spk_dim, spk_num)
    elif sv_loss in ("arc_margin", "add_margin"):
        # xavier-uniform (out, in) like the reference margin products
        lim = (6.0 / (spk_num + spk_dim)) ** 0.5
        params["margin_w"] = jax.random.uniform(k2, (spk_num, spk_dim),
                                                jnp.float32, -lim, lim)
    else:
        raise NotImplementedError(f"sv loss {sv_loss!r} (softmax | arc_margin "
                                  "| add_margin)")
    return params


def _xent(logits, label):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
    acc = jnp.mean((jnp.argmax(logits, -1) == label).astype(jnp.float32))
    return jnp.mean(nll), acc


def arc_margin_logits(w, x, label, m: float = 0.50, s: float = 30.0,
                      easy_margin: bool = False):
    """cos(theta + m) margin logits (etc.py:220-270 ArcMarginProduct)."""
    import math

    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True).clip(1e-12)
    cosine = xn @ wn.T
    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), 0.0, 1.0))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine > math.cos(math.pi - m), phi,
                        cosine - math.sin(math.pi - m) * m)
    onehot = jax.nn.one_hot(label, w.shape[0])
    return (onehot * phi + (1 - onehot) * cosine) * s


def add_margin_logits(w, x, label, m: float = 0.40, s: float = 30.0):
    """cos(theta) - m margin logits (etc.py AddMarginProduct)."""
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True).clip(1e-12)
    cosine = xn @ wn.T
    onehot = jax.nn.one_hot(label, w.shape[0])
    return (onehot * (cosine - m) + (1 - onehot) * cosine) * s


def sv_loss_fn(sv_params, content: jnp.ndarray, enc_lens: jnp.ndarray,
               spk_label: jnp.ndarray, *, sv_loss: str = "softmax",
               grl_coeff: float = 1.0):
    """Pool -> sv_linear -> GRL -> classifier loss + accuracy
    (asr_model.py:154-159: the GRL makes the encoder REMOVE speaker info)."""
    emb = stats_pool(content, enc_lens)
    emb = fnn.linear(sv_params["sv_linear"], emb, jnp.float32)
    emb = grad_reverse(emb, grl_coeff)
    if sv_loss == "softmax":
        logits = fnn.linear(sv_params["sv_fc"], emb, jnp.float32)
    elif sv_loss == "arc_margin":
        logits = arc_margin_logits(sv_params["margin_w"], emb, spk_label)
    else:
        logits = add_margin_logits(sv_params["margin_w"], emb, spk_label)
    return _xent(logits, spk_label)


def init_center_loss(key, num_classes: int, feat_dim: int):
    """Per-class centers (wenet center_loss.py CenterLoss2)."""
    return {"centers": jax.random.normal(key, (num_classes, feat_dim), jnp.float32)}


def center_loss_fn(params, feats: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance of features to their class centers; padding
    labels (< 0) masked out."""
    f = feats.reshape(-1, feats.shape[-1]).astype(jnp.float32)
    y = labels.reshape(-1)
    valid = y >= 0
    safe = jnp.maximum(y, 0)
    c = params["centers"][safe]
    d2 = jnp.sum(jnp.square(f - c), axis=-1)
    return jnp.sum(jnp.where(valid, d2, 0.0)) / jnp.maximum(valid.sum(), 1) / 2.0


# ---------------------------------------------------------------------------
# CTC forced alignment (wenet/bin/alignment.py equivalent, host-side viterbi)
# ---------------------------------------------------------------------------


def ctc_forced_align(logprobs, label, blank: int = 0, return_states: bool = False):
    """Viterbi path through the CTC topology for ONE utterance.

    logprobs: (T, V) log-softmax frame posteriors (valid frames only);
    label: (U,) token ids. Returns the (T,) state-token sequence (blank or
    label token per frame) — the wenet alignment tool's output shape.
    With return_states=True also returns the (T,) CTC state indices
    (odd index s = label token (s-1)//2), which keep repeated tokens apart —
    used by infer/speech_edit.py to derive per-token time spans.
    """
    import numpy as np

    logprobs = np.asarray(logprobs, np.float64)
    label = [int(t) for t in label]
    t_len, _ = logprobs.shape
    # interleaved state sequence: blank, l1, blank, l2, ... blank
    states = [blank]
    for tok in label:
        states += [tok, blank]
    s_len = len(states)
    neg = -1e30
    dp = np.full((t_len, s_len), neg)
    bp = np.zeros((t_len, s_len), np.int32)
    dp[0, 0] = logprobs[0, states[0]]
    if s_len > 1:
        dp[0, 1] = logprobs[0, states[1]]
    for t in range(1, t_len):
        for s in range(s_len):
            cands = [dp[t - 1, s]]
            idxs = [s]
            if s >= 1:
                cands.append(dp[t - 1, s - 1])
                idxs.append(s - 1)
            # skip a blank when consecutive tokens differ
            if s >= 2 and states[s] != blank and states[s] != states[s - 2]:
                cands.append(dp[t - 1, s - 2])
                idxs.append(s - 2)
            j = int(np.argmax(cands))
            dp[t, s] = cands[j] + logprobs[t, states[s]]
            bp[t, s] = idxs[j]
    # best terminal: last blank or last token
    ends = [s_len - 1] + ([s_len - 2] if s_len > 1 else [])
    s = max(ends, key=lambda e: dp[t_len - 1, e])
    path = [0] * t_len
    spath = [0] * t_len
    for t in range(t_len - 1, -1, -1):
        path[t] = states[s]
        spath[t] = s
        s = bp[t, s]
    if return_states:
        return path, spath
    return path
