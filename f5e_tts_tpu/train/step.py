"""Jitted training step: CFM loss + AdamW + EMA + grad clip + NaN-skip.

reference training loop semantics: src/f5_tts/model/trainer.py:265-432 —
AdamW, warmup->linear-decay schedule (:334-340), grad clip (:405-406),
NaN-loss skip (:398-401), EMA update (:414). Here the whole update (fwd, bwd,
clip, NaN gate, optimizer, EMA) is ONE jitted, donated, mesh-sharded graph;
the gradient all-reduce over the 'data' axis is inserted by GSPMD instead of
NCCL DDP.
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
    update: jnp.ndarray  # int32 scalar — completed optimizer updates
    skipped: jnp.ndarray  # int32 scalar — NaN-skipped updates


def make_schedule(train: TrainConfig, total_updates: int, num_replicas: int = 1):
    """Warmup (scaled by replica count, trainer.py:316-318) then linear decay
    to zero (SequentialLR of LinearLR ramps, trainer.py:334-340)."""
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
        # reference: accelerator.accumulate(model) (trainer.py:378)
        opt = optax.MultiSteps(opt, every_k_schedule=train.grad_accumulation_steps)
    return opt


def init_train_state(params, model_state, optimizer) -> TrainState:
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        model_state=model_state,
        update=jnp.zeros((), jnp.int32),
        skipped=jnp.zeros((), jnp.int32),
    )


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    flow_loss: jnp.ndarray
    extra_loss: jnp.ndarray
    grad_norm: jnp.ndarray
    skipped: jnp.ndarray


def train_step(
    ts: TrainState,
    batch: dict,
    rng: jax.Array,
    *,
    arch: DiTConfig,
    cfm: CFMConfig,
    optimizer,
    ema_decay: float = 0.999,
    ema_update_after: int = 100,
    ema_update_every: int = 10,
    compute_dtype=jnp.bfloat16,
):
    """One optimizer update. batch: {mel (B,N,D), mel_lens, text_ids, [ppg, ppg_lens, text_lens]}.

    NaN/inf losses skip the whole update (params, opt state, EMA untouched)
    but still count a step — matching trainer.py:398-401.
    EMA: ema_pytorch defaults (update_after_step=100, update_every=10) used by
    the reference trainer (trainer.py:104).
    """
    rng = jax.random.fold_in(rng, ts.update + ts.skipped)

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

    grad_norm = optax.global_norm(grads)
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

    updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)

    def keep_new(new, old):
        return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

    new_params = keep_new(new_params, ts.params)
    new_opt_state = keep_new(new_opt_state, ts.opt_state)
    new_model_state = keep_new(out.new_state, ts.model_state) if out.new_state else ts.model_state

    new_update = ts.update + ok.astype(jnp.int32)

    # EMA (ema_pytorch semantics): before update_after_step -> copy; then decay
    # every `update_every` updates.
    do_ema = (new_update % ema_update_every == 0) & ok
    warm = new_update <= ema_update_after

    def ema_leaf(e, p):
        decayed = e * ema_decay + p * (1.0 - ema_decay)
        candidate = jnp.where(warm, p, decayed)
        return jnp.where(do_ema, candidate, e)

    new_ema = jax.tree.map(ema_leaf, ts.ema_params, new_params)

    metrics = StepMetrics(loss=loss, flow_loss=out.flow_loss, extra_loss=out.extra_loss,
                          grad_norm=grad_norm, skipped=(~ok).astype(jnp.int32))
    new_ts = TrainState(
        params=new_params, ema_params=new_ema, opt_state=new_opt_state,
        model_state=new_model_state, update=new_update,
        skipped=ts.skipped + (~ok).astype(jnp.int32),
    )
    return new_ts, metrics


def make_jitted_train_step(arch: DiTConfig, cfm: CFMConfig, optimizer,
                           ema_decay: float = 0.999, compute_dtype=jnp.bfloat16,
                           mesh=None, batch_spec=None, state_spec=None):
    """Compile the step with donated state for in-place HBM reuse."""
    step = partial(train_step, arch=arch, cfm=cfm, optimizer=optimizer,
                   ema_decay=ema_decay, compute_dtype=compute_dtype)
    kw = {}
    if mesh is not None and batch_spec is not None:
        kw["in_shardings"] = (state_spec, batch_spec, None)
        kw["out_shardings"] = (state_spec, None)
    return jax.jit(step, donate_argnums=(0,), **kw)
