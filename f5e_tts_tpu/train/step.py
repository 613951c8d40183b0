"""Jitted training step: CFM loss + AdamW + EMA + grad clip + NaN-skip.

reference training loop semantics: src/f5_tts/model/trainer.py:265-432 —
AdamW, warmup->linear-decay schedule (:334-340), grad clip (:405-406),
NaN-loss skip (:398-401), EMA update (:414). Here the whole update (fwd, bwd,
clip, NaN gate, optimizer, EMA) is ONE jitted, donated, mesh-sharded graph;
the gradient all-reduce over the 'data' axis is inserted by GSPMD instead of
NCCL DDP.

Counters: `micro` counts successful micro-steps, `update` counts optimizer
updates (micro / grad_accumulation) — matching the reference's global_update
which only advances on accelerator.sync_gradients (trainer.py:412-416).

EMA follows ema_pytorch semantics exactly (the reference constructs
EMA(model) with defaults, trainer.py:104): the n-th optimizer update invokes
EMA.update() with internal pre-increment step n-1; calls gated to
step % update_every == 0; hard copy while step <= update_after_step (plus the
first gated call after, where ema_pytorch copies on `initted`); afterwards a
power-ramped decay  1 - (1 + epoch/inv_gamma)^(-power)  with
epoch = step_post_increment - update_after_step - 1, clamped to
[min_value, beta].
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from f5e_tts_tpu.config import CFMConfig, DiTConfig, TrainConfig
from f5e_tts_tpu.models import cfm as fcfm


class TrainState(NamedTuple):
    params: dict
    ema_params: dict
    opt_state: optax.OptState
    model_state: dict  # BN running stats etc.
    update: jnp.ndarray  # int32 scalar — completed OPTIMIZER updates
    micro: jnp.ndarray  # int32 scalar — completed micro-steps
    skipped: jnp.ndarray  # int32 scalar — NaN-skipped micro-steps


class EMASettings(NamedTuple):
    """ema_pytorch constructor defaults (reference trainer.py:104)."""

    beta: float = 0.9999
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0

    @classmethod
    def from_train_cfg(cls, tc: TrainConfig) -> "EMASettings":
        return cls(beta=tc.ema_beta, update_after_step=tc.ema_update_after_step,
                   update_every=tc.ema_update_every, inv_gamma=tc.ema_inv_gamma,
                   power=tc.ema_power, min_value=tc.ema_min_value)


def ema_decay_at(update: jnp.ndarray, ema: EMASettings) -> jnp.ndarray:
    """Decay used by the `update`-th optimizer update (1-indexed), f32 scalar.

    ema_pytorch.get_current_decay with self.step == update (post-increment):
    epoch = clamp(step - update_after_step - 1, 0);
    0 if epoch <= 0 else clamp(1 - (1+epoch/inv_gamma)^-power, min_v, beta).
    """
    epoch = jnp.maximum(update.astype(jnp.float32) - ema.update_after_step - 1.0, 0.0)
    value = 1.0 - jnp.power(1.0 + epoch / ema.inv_gamma, -ema.power)
    value = jnp.clip(value, ema.min_value, ema.beta)
    return jnp.where(epoch <= 0.0, 0.0, value)


def make_schedule(train: TrainConfig, total_updates: int, num_replicas: int = 1):
    """Warmup (scaled by replica count, trainer.py:316-318) then linear decay
    to zero (SequentialLR of LinearLR ramps, trainer.py:334-340).
    `total_updates` is in OPTIMIZER-update units (the reference divides the
    dataloader length by grad_accumulation_steps, trainer.py:334)."""
    warmup = train.num_warmup_updates * num_replicas
    decay = max(total_updates - warmup, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(1e-8, train.learning_rate, warmup),
            optax.linear_schedule(train.learning_rate, 1e-8, decay),
        ],
        boundaries=[warmup],
    )


def make_optimizer(train: TrainConfig, total_updates: int, num_replicas: int = 1):
    sched = make_schedule(train, total_updates, num_replicas)
    if train.bnb_optimizer:
        # reference: bnb.optim.AdamW8bit (trainer.py:134-137); int8 moments
        from f5e_tts_tpu.train.adamw8bit import adamw8bit

        inner = adamw8bit(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    else:
        inner = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt = optax.chain(
        optax.clip_by_global_norm(train.max_grad_norm),
        inner,
    )
    if train.grad_accumulation_steps > 1:
        # reference: accelerator.accumulate(model) (trainer.py:378); the inner
        # schedule advances once per APPLIED update, as upstream.
        opt = optax.MultiSteps(opt, every_k_schedule=train.grad_accumulation_steps)
    return opt


def init_train_state(params, model_state, optimizer) -> TrainState:
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        model_state=model_state,
        update=jnp.zeros((), jnp.int32),
        micro=jnp.zeros((), jnp.int32),
        skipped=jnp.zeros((), jnp.int32),
    )


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    flow_loss: jnp.ndarray
    extra_loss: jnp.ndarray
    grad_norm: jnp.ndarray
    skipped: jnp.ndarray


def apply_gradients(ts: TrainState, loss, out, grads, *, optimizer,
                    ema: EMASettings, grad_accum: int = 1):
    """Shared post-backward half of a training step: NaN gate, optimizer,
    counters, EMA. Used by both train_step and the trainer's fused step."""
    grad_norm = optax.global_norm(grads)
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

    updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)

    def keep_new(new, old):
        return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

    new_params = keep_new(new_params, ts.params)
    new_opt_state = keep_new(new_opt_state, ts.opt_state)
    new_model_state = keep_new(out.new_state, ts.model_state) if out.new_state else ts.model_state

    new_micro = ts.micro + ok.astype(jnp.int32)
    # an optimizer update applies on every grad_accum-th successful micro-step
    applied = ok & (new_micro % grad_accum == 0)
    new_update = ts.update + applied.astype(jnp.int32)

    # --- EMA (see module docstring for the ema_pytorch mapping) ---
    pre_step = new_update - 1  # ema_pytorch's pre-increment call counter
    gated = applied & (pre_step % ema.update_every == 0)
    # warm copies while pre <= update_after_step, plus the first gated call
    # after (ema_pytorch's `initted` copy) — the only multiple of update_every
    # in (after, after + update_every]
    hard_copy = pre_step <= (ema.update_after_step + ema.update_every)
    decay = ema_decay_at(new_update, ema)

    def ema_leaf(e, p):
        decayed = e * decay + p * (1.0 - decay)
        candidate = jnp.where(hard_copy, p, decayed)
        return jnp.where(gated, candidate, e)

    new_ema = jax.tree.map(ema_leaf, ts.ema_params, new_params)

    metrics = StepMetrics(loss=loss, flow_loss=out.flow_loss, extra_loss=out.extra_loss,
                          grad_norm=grad_norm, skipped=(~ok).astype(jnp.int32))
    new_ts = TrainState(
        params=new_params, ema_params=new_ema, opt_state=new_opt_state,
        model_state=new_model_state, update=new_update, micro=new_micro,
        skipped=ts.skipped + (~ok).astype(jnp.int32),
    )
    return new_ts, metrics


def train_step(
    ts: TrainState,
    batch: dict,
    rng: jax.Array,
    *,
    arch: DiTConfig,
    cfm: CFMConfig,
    optimizer,
    ema: EMASettings = EMASettings(),
    grad_accum: int = 1,
    compute_dtype=jnp.bfloat16,
):
    """One micro-step. batch: {mel (B,N,D), mel_lens, text_ids, [ppg, ppg_lens, text_lens]}.

    NaN/inf losses skip the whole micro-step (params, opt state, EMA,
    accumulators untouched) — matching the reference's `continue`
    (trainer.py:398-401).
    """
    rng = jax.random.fold_in(rng, ts.micro + ts.skipped)

    def loss_fn(params):
        out = fcfm.cfm_loss(
            params, ts.model_state, arch, cfm,
            mel=batch["mel"], mel_lens=batch["mel_lens"],
            text_ids=batch.get("text_ids"), text_lens=batch.get("text_lens"),
            ppg=batch.get("ppg"), ppg_lens=batch.get("ppg_lens"),
            rng=rng, training=True, compute_dtype=compute_dtype,
        )
        return out.loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
    return apply_gradients(ts, loss, out, grads, optimizer=optimizer,
                           ema=ema, grad_accum=grad_accum)


def make_jitted_train_step(arch: DiTConfig, cfm: CFMConfig, optimizer,
                           ema: EMASettings = EMASettings(), grad_accum: int = 1,
                           compute_dtype=jnp.bfloat16,
                           mesh=None, batch_spec=None, state_spec=None):
    """Compile the step with donated state for in-place HBM reuse."""
    step = partial(train_step, arch=arch, cfm=cfm, optimizer=optimizer,
                   ema=ema, grad_accum=grad_accum, compute_dtype=compute_dtype)
    kw = {}
    if mesh is not None and batch_spec is not None:
        kw["in_shardings"] = (state_spec, batch_spec, None)
        kw["out_shardings"] = (state_spec, None)
    return jax.jit(step, donate_argnums=(0,), **kw)
