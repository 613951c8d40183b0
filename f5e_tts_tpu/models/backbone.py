"""Backbone dispatch: one interface over DiT / UNetT / MMDiT for the CFM layer.

Mirrors how the reference CFM treats `self.transformer` polymorphically
(reference: cfm.py:67-69 + train.py backbone class resolution).
"""

from __future__ import annotations

import jax.numpy as jnp

from f5e_tts_tpu.config import DiTConfig, MMDiTConfig, UNetTConfig
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.models import mmdit as fmmdit
from f5e_tts_tpu.models import unett as funett
from f5e_tts_tpu.models.dit import DiTExtras


def backbone_kind(arch) -> str:
    if isinstance(arch, DiTConfig):
        return "dit"
    if isinstance(arch, UNetTConfig):
        return "unett"
    if isinstance(arch, MMDiTConfig):
        return "mmdit"
    raise TypeError(f"unknown arch config {type(arch)}")


def init_backbone(key, arch, vocab_size: int):
    kind = backbone_kind(arch)
    if kind == "dit":
        return fdit.init_dit(key, arch, vocab_size)
    if kind == "unett":
        return funett.init_unett(key, arch, vocab_size)
    return fmmdit.init_mmdit(key, arch, vocab_size)


def precompute_text_embed(params, arch, text_ids, batch: int, seq_len: int,
                          drop_text, compute_dtype=jnp.bfloat16):
    """Time-independent text embedding (the reference's per-ODE text cache)."""
    kind = backbone_kind(arch)
    if kind == "dit":
        return fdit.text_embed_fn(params, arch, text_ids, batch, seq_len, drop_text, compute_dtype)
    if kind == "unett":
        return funett.text_embed_fn(params, arch, text_ids, batch, seq_len, drop_text, compute_dtype)
    # MMDiT: text keeps its own length
    return fmmdit.text_embed_fn(params, arch, text_ids, drop_text, compute_dtype)


def sample_step(params, state, arch, *, x, cond, text_embed, time, drop_audio_cond,
                ppg_embed=None, mask=None, compute_dtype=jnp.bfloat16):
    """One time-dependent forward with precomputed conditioning."""
    kind = backbone_kind(arch)
    if kind == "dit":
        return fdit.dit_sample_step(params, state, arch, x=x, cond=cond,
                                    text_embed=text_embed, time=time,
                                    drop_audio_cond=drop_audio_cond, ppg_embed=ppg_embed,
                                    mask=mask, compute_dtype=compute_dtype)
    if kind == "unett":
        return funett.unett_forward(params, state, arch, x=x, cond=cond, text_ids=None,
                                    time=time, drop_audio_cond=drop_audio_cond,
                                    drop_text=jnp.zeros(x.shape[:1], bool), mask=mask,
                                    text_embed=text_embed, compute_dtype=compute_dtype)
    return fmmdit.mmdit_forward(params, state, arch, x=x, cond=cond, text_ids=None,
                                time=time, drop_audio_cond=drop_audio_cond,
                                drop_text=jnp.zeros(x.shape[:1], bool), mask=mask,
                                text_embed=text_embed, compute_dtype=compute_dtype)


def forward_train(params, state, arch, *, x, cond, text_ids, time, drop_audio_cond,
                  drop_text, drop_ppg, ppg=None, mask=None, text_len=None, ppg_len=None,
                  training=False, rng=None, vq_temperature=2.0, compute_dtype=jnp.bfloat16):
    """Full training forward; returns (pred, DiTExtras)."""
    kind = backbone_kind(arch)
    if kind == "dit":
        return fdit.dit_forward(params, state, arch, x=x, cond=cond, text_ids=text_ids,
                                time=time, drop_audio_cond=drop_audio_cond, drop_text=drop_text,
                                drop_ppg=drop_ppg, ppg=ppg, mask=mask, text_len=text_len,
                                ppg_len=ppg_len, training=training, rng=rng,
                                vq_temperature=vq_temperature, compute_dtype=compute_dtype)
    zero = jnp.zeros((), jnp.float32)
    extras = DiTExtras(extra_loss=zero, new_state=state, align_loss=zero, perplex_loss=zero)
    if kind == "unett":
        pred = funett.unett_forward(params, state, arch, x=x, cond=cond, text_ids=text_ids,
                                    time=time, drop_audio_cond=drop_audio_cond,
                                    drop_text=drop_text, mask=mask, compute_dtype=compute_dtype)
    else:
        pred = fmmdit.mmdit_forward(params, state, arch, x=x, cond=cond, text_ids=text_ids,
                                    time=time, drop_audio_cond=drop_audio_cond,
                                    drop_text=drop_text, mask=mask, compute_dtype=compute_dtype)
    return pred, extras


def uses_ppg(arch) -> bool:
    return backbone_kind(arch) == "dit" and arch.ppg.use_ppg
