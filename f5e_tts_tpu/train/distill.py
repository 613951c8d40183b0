"""CFG distillation: train a student whose SINGLE forward matches the
teacher's guidance-combined flow.

Motivation (PAPERS.md, arXiv 2504.20334 "Towards Flow-Matching-based TTS
without Classifier-Free Guidance"): at inference the reference runs TWO
backbone passes per ODE step (cond + uncond, combined as
(1+w)*v_cond - w*v_uncond — reference cfm.py:439-448; our folded (K*B)
batch, models/cfm.py:_folded_cfg_flow). Distilling the combination into the
student removes the uncond branch entirely: the distilled checkpoint serves
with cfg_strength=0, halving sampler FLOPs at identical NFE.

TPU-first shape: the teacher's two branches run as ONE folded 2B-batch
forward (same trick as the inference sampler), the whole step is one jit,
and the student update is a plain optax step — no bespoke runtime.

The training distribution mirrors cfm_loss exactly (same span masking, same
phi/t/x0 draws) so the student sees the teacher on-policy for the infilling
task it will serve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from f5e_tts_tpu.config import CFMConfig, DiTConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.utils.masks import lens_to_mask, mask_from_frac_lengths


class DistillLossOut(NamedTuple):
    loss: jnp.ndarray
    teacher_flow: jnp.ndarray  # (B, N, mel) CFG-combined target
    student_pred: jnp.ndarray


def cfg_distill_loss(
    student_params,
    teacher_params,
    state,
    arch: DiTConfig,
    cfm: CFMConfig,
    *,
    mel: jnp.ndarray,  # (B, N, mel)
    mel_lens: jnp.ndarray,  # (B,)
    text_ids: Optional[jnp.ndarray],  # (B, NT) pad -1
    rng: jax.Array,
    cfg_strength: float = 2.0,
    training: bool = True,
    compute_dtype=jnp.bfloat16,
) -> DistillLossOut:
    """Masked-span MSE between the student's single pass and the teacher's
    CFG-combined flow at the same (phi, t, cond).

    Same sampling of span/time/noise as cfm_loss (reference cfm.py:484-590)
    so the distillation distribution matches the generation task; the
    teacher runs drop-free + fully-dropped branches folded into one 2B batch
    (eval mode, gradients stopped), the student runs the drop-free branch
    only (dropout active when training=True).
    """
    b, n, _ = mel.shape
    (r_frac, r_span, r_time, r_noise, r_model) = jax.random.split(rng, 5)

    mask = lens_to_mask(mel_lens, n)
    frac = jax.random.uniform(r_frac, (b,), minval=cfm.frac_lengths_mask[0],
                              maxval=cfm.frac_lengths_mask[1])
    rand_span_mask = mask_from_frac_lengths(r_span, mel_lens, frac, n) & mask

    x1 = mel.astype(jnp.float32)
    x0 = jax.random.normal(r_noise, x1.shape, jnp.float32)
    time = jax.random.uniform(r_time, (b,), jnp.float32)
    phi = (1 - time[:, None, None]) * x0 + time[:, None, None] * x1
    cond = jnp.where(rand_span_mask[:, :, None], 0.0, x1)

    bb = jnp.ones((b,), bool)
    ft = jnp.zeros((b,), bool)

    # teacher: cond + uncond folded into one 2B batch, no dropout, no grads
    def teacher_flow_fn(tp):
        x2 = jnp.concatenate([phi, phi], axis=0).astype(compute_dtype)
        c2 = jnp.concatenate([cond, cond], axis=0).astype(compute_dtype)
        ids2 = (jnp.concatenate([text_ids, text_ids], axis=0)
                if text_ids is not None else None)
        t2 = jnp.concatenate([time, time], axis=0)
        pred2, _ = fbb.forward_train(
            tp, state, arch, x=x2, cond=c2, text_ids=ids2, time=t2,
            drop_audio_cond=jnp.concatenate([ft, bb]),
            drop_text=jnp.concatenate([ft, bb]),
            drop_ppg=jnp.concatenate([bb, bb]),
            mask=None, training=False, rng=None,
            compute_dtype=compute_dtype)
        v_cond, v_uncond = pred2[:b], pred2[b:]
        return ((1.0 + cfg_strength) * v_cond.astype(jnp.float32)
                - cfg_strength * v_uncond.astype(jnp.float32))

    teacher_flow = jax.lax.stop_gradient(teacher_flow_fn(teacher_params))

    # student: single drop-free pass (what it will run at serve time)
    student_pred, _ = fbb.forward_train(
        student_params, state, arch,
        x=phi.astype(compute_dtype), cond=cond.astype(compute_dtype),
        text_ids=text_ids, time=time,
        drop_audio_cond=ft, drop_text=ft, drop_ppg=bb,
        mask=None, training=training, rng=r_model,
        compute_dtype=compute_dtype)

    se = jnp.square(student_pred.astype(jnp.float32) - teacher_flow)
    w = rand_span_mask[:, :, None].astype(jnp.float32)
    loss = jnp.sum(se * w) / jnp.maximum(jnp.sum(w) * se.shape[-1], 1.0)
    return DistillLossOut(loss=loss, teacher_flow=teacher_flow,
                          student_pred=student_pred)


def distill_loss_with_device_mel(student_params, teacher_params, model_state,
                                 arch, cfm, mel_cfg, batch, rng, compute_dtype,
                                 cfg_strength: float = 2.0):
    """Trainer-shaped adapter: batch dict (audio or mel) -> CFMLossOut.

    Lets the full Trainer (mesh sharding, EMA, checkpoint rotation,
    preemption, resume) run distillation by swapping only the loss — the
    same integration point as loss_with_device_mel in train/trainer.py.
    """
    from f5e_tts_tpu.models.cfm import CFMLossOut
    from f5e_tts_tpu.ops.mel import mel_spectrogram

    if "mel" in batch:
        mel = batch["mel"]
    else:
        n = batch["audio"].shape[1] // mel_cfg.hop_length
        mel = mel_spectrogram(batch["audio"], mel_cfg)[:, :n, :]
    out = cfg_distill_loss(
        student_params, teacher_params, model_state, arch, cfm,
        mel=mel, mel_lens=batch["mel_lens"], text_ids=batch.get("text_ids"),
        rng=rng, cfg_strength=cfg_strength, training=True,
        compute_dtype=compute_dtype)
    zero = jnp.zeros((), jnp.float32)
    return CFMLossOut(loss=out.loss, flow_loss=out.loss, extra_loss=zero,
                      new_state=None, cond=out.teacher_flow,
                      pred=out.student_pred)


class DistillState(NamedTuple):
    params: dict  # student
    opt_state: optax.OptState
    step: jnp.ndarray


def make_distill_step(teacher_params, state, arch: DiTConfig, cfm: CFMConfig,
                      optimizer: optax.GradientTransformation,
                      cfg_strength: float = 2.0, compute_dtype=jnp.bfloat16):
    """One jitted distillation update: (DistillState, batch, rng) -> (state', loss).

    teacher_params are passed as an explicit jit argument (the same rule as
    every jit in this package: params are ARGS, never captured constants —
    closing over them embeds them in the executable and breaks the remote
    compile path); the DistillState buffers are donated.
    """

    @partial(jax.jit, donate_argnums=(1,))
    def step(tp, ds: DistillState, mel, mel_lens, text_ids, rng):
        def loss_fn(sp):
            out = cfg_distill_loss(sp, tp, state, arch, cfm, mel=mel,
                                   mel_lens=mel_lens, text_ids=text_ids,
                                   rng=rng, cfg_strength=cfg_strength,
                                   training=True, compute_dtype=compute_dtype)
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(ds.params)
        updates, opt_state = optimizer.update(grads, ds.opt_state, ds.params)
        params = optax.apply_updates(ds.params, updates)
        return DistillState(params=params, opt_state=opt_state,
                            step=ds.step + 1), loss

    return lambda ds, mel, mel_lens, text_ids, rng: step(
        teacher_params, ds, mel, mel_lens, text_ids, rng)


def init_distill(teacher_params, optimizer: optax.GradientTransformation) -> DistillState:
    """Student initialized FROM the teacher (standard guidance distillation:
    the student starts as the teacher and only learns the guidance offset).

    Explicit copy: the step donates the student buffers, so aliasing the
    teacher's arrays here would delete the teacher on the first update."""
    params = jax.tree.map(lambda a: jnp.array(a, copy=True), teacher_params)
    return DistillState(params=params, opt_state=optimizer.init(params),
                        step=jnp.zeros((), jnp.int32))
