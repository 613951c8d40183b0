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
) -> ASRLossOut:
    """loss = ppg_weight * CE + (1 - ppg_weight) * CTC (asr_model.py:210-212)."""
    enc, enc_lens = conformer_encode(encoder_params, cfg, feats, feat_lens, compute_dtype)
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

    if frame_labels is not None and ctc_labels is not None:
        loss = ppg_weight * ce + (1.0 - ppg_weight) * ctc
    elif frame_labels is not None:
        loss = ce
    else:
        loss = ctc
    return ASRLossOut(loss=loss, ce_loss=ce, ctc_loss=ctc, acc=acc)


def make_asr_train_step(cfg: ConformerConfig, optimizer, ppg_weight: float = 0.5,
                        compute_dtype=jnp.float32):
    """Jitted (params, opt_state, batch, rng) -> updated state + metrics."""

    def step(params, heads, opt_state, batch):
        def loss_fn(trainable):
            p, h = trainable
            out = asr_loss(p, h, cfg, batch["feats"], batch["feat_lens"],
                           batch.get("frame_labels"), batch.get("ctc_labels"),
                           batch.get("ctc_label_lens"), ppg_weight, compute_dtype)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)((params, heads))
        updates, new_opt = optimizer.update(grads, opt_state, (params, heads))
        new_params, new_heads = optax.apply_updates((params, heads), updates)
        return new_params, new_heads, new_opt, out

    return jax.jit(step, donate_argnums=(0, 1, 2))
