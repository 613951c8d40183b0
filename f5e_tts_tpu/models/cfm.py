"""Conditional flow matching: training loss + ODE samplers with CFG variants.

reference: src/f5_tts/model/cfm.py. TPU-first sampler design:

- the whole NFE-step Euler/midpoint ODE is ONE `lax.scan` inside `jax.jit` —
  the same shape the reference only achieves via its TensorRT-LLM engine
  (f5_tts_trtllm.py:219-231, 344-430),
- the K classifier-free-guidance passes per step (2 for `sample`, 3 for
  `sample_tts`/`sample_vc`) are folded into ONE (K*B)-batch DiT call using
  per-sample drop flags (engine trick, f5_tts_trtllm.py:390-416),
- sway-sampled timesteps are precomputed host-side,
- text/PPG embeddings are computed once per utterance, outside the scan
  (the reference caches text embeddings across steps, dit.py:437-444),
- per-sample seeded noise uses `jax.random.fold_in` so batched and single
  inference agree (reference: cfm.py:450-457 reseeds per item).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.config import CFMConfig, DiTConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.utils.masks import lens_to_mask, mask_from_frac_lengths


# ---------------------------------------------------------------------------
# timestep schedule (host-side)
# ---------------------------------------------------------------------------


def sway_timesteps(steps: int, sway_coef: Optional[float], t_start: float = 0.0) -> np.ndarray:
    """t = linspace + sway * (cos(pi/2 t) - 1 + t). reference: cfm.py:467-469."""
    t = np.linspace(t_start, 1.0, steps + 1, dtype=np.float64)
    if sway_coef is not None:
        t = t + sway_coef * (np.cos(np.pi / 2 * t) - 1 + t)
    return t.astype(np.float32)


def pruned_sway_timesteps(keep, base_steps: int = 32, sway_coef: Optional[float] = -1.0,
                          t_start: float = 0.0):
    """EPSS-style pruned step schedule (arXiv 2505.19931, "Accelerating
    Flow-Matching-Based TTS via Empirically Pruned Step Sampling"): subsample
    the `base_steps` sway grid at the `keep` indices instead of running every
    step. The paper shows ~7 pruned steps can match the 32-step F5-TTS
    quality because the flow is nearly linear over most of the (sway
    front-loaded) grid; the exact keep-set is a per-checkpoint tunable.

    keep must start at 0, end at base_steps, and be strictly increasing.
    Returns a hashable float tuple for the samplers' static `timesteps` arg.
    """
    keep = tuple(int(i) for i in keep)
    if keep[0] != 0 or keep[-1] != base_steps or list(keep) != sorted(set(keep)):
        raise ValueError(f"keep must be strictly increasing 0..{base_steps}, got {keep}")
    grid = sway_timesteps(base_steps, sway_coef, t_start)
    return tuple(float(grid[i]) for i in keep)


def noise_like(key: jax.Array, batch: int, length: int, channels: int,
               durations: jnp.ndarray,
               seeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-sample noise, zero beyond each sample's duration.

    Batch-size invariance via fold_in per item (reference: cfm.py:450-457 uses
    per-item reseeding; identical intent, different RNG).

    When `seeds` (B,) int32 is given, each sample's noise is derived from its
    OWN seed — `fold_in(PRNGKey(seed_i), 0)` — so the result is independent of
    which other requests were co-batched and of the batch slot. A request
    batched by the DynamicBatcher then reproduces bit-for-bit what the same
    request produces alone via the pipeline (which passes key=PRNGKey(seed)
    for a batch of one, i.e. fold_in(PRNGKey(seed), 0)).
    """
    if seeds is not None:
        def one(s):
            return jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(s), 0),
                                     (length, channels), jnp.float32)

        y0 = jax.vmap(one)(seeds)
    else:
        def one(i):
            return jax.random.normal(jax.random.fold_in(key, i), (length, channels), jnp.float32)

        y0 = jax.vmap(one)(jnp.arange(batch))
    keep = lens_to_mask(durations, length)
    return jnp.where(keep[:, :, None], y0, 0.0)


# ---------------------------------------------------------------------------
# generic folded-CFG Euler sampler core
# ---------------------------------------------------------------------------


def _ode_scan(step_fn, y0: jnp.ndarray, ts: jnp.ndarray, method: str = "euler",
              unroll: int = 1):
    """Integrate dy/dt = step_fn(t, y) over the (precomputed) grid ts.

    Euler: y += (t1-t0) * f(t0, y). Midpoint: classic RK2.
    Returns (y_final, trajectory including y0), matching torchdiffeq's odeint
    output shape (steps+1, ...) (reference: cfm.py:471). The trajectory is
    dead-code-eliminated by XLA when the caller only uses y_final (verified
    via compiled memory_analysis). unroll>1 runs that many bodies per loop
    iteration so the carry flows between them without the per-iteration
    loop-tuple layout copy (bitwise-identical output, scheduling only).
    """
    t0s = ts[:-1]
    t1s = ts[1:]

    def body(y, tt):
        t0, t1 = tt
        dt = t1 - t0
        if method == "euler":
            y_new = y + dt * step_fn(t0, y)
        elif method == "midpoint":
            k1 = step_fn(t0, y)
            y_mid = y + 0.5 * dt * k1
            y_new = y + dt * step_fn(t0 + 0.5 * dt, y_mid)
        else:
            raise ValueError(f"unknown ode method {method!r}")
        return y_new, y_new

    y_final, traj = jax.lax.scan(body, y0, (t0s, t1s), unroll=unroll)
    traj = jnp.concatenate([y0[None], traj], axis=0)
    return y_final, traj


class SamplerInputs(NamedTuple):
    """Shape-static inputs to the jitted sampler (one compile per (B, N, NT))."""

    cond: jnp.ndarray  # (B, N, mel) reference mel padded to N
    cond_mask: jnp.ndarray  # (B, N) True where the (possibly edited) prompt is kept
    duration: jnp.ndarray  # (B,) total output frames
    text_ids: Optional[jnp.ndarray]  # (B, NT) or None
    ppg: Optional[jnp.ndarray]  # (B, NP, ppg_dim) or None


def prepare_inputs(
    cond: jnp.ndarray,
    lens: jnp.ndarray,
    duration: jnp.ndarray,
    max_duration: int,
    text_ids: Optional[jnp.ndarray] = None,
    ppg: Optional[jnp.ndarray] = None,
    edit_mask: Optional[jnp.ndarray] = None,
    no_ref_audio: bool = False,
) -> SamplerInputs:
    """Pad cond to the static bucket length and build the prompt-keep mask.

    reference: cfm.py:393-428 — duration clamp/min happens host-side in the
    pipeline; here we only do the tensor prep (static shapes).
    """
    b, cond_len, _ = cond.shape
    if cond_len < max_duration:
        cond = jnp.pad(cond, ((0, 0), (0, max_duration - cond_len), (0, 0)))
    else:
        cond = cond[:, :max_duration]
    cond_mask = lens_to_mask(lens, max_duration)
    if edit_mask is not None:
        if edit_mask.shape[1] < max_duration:
            edit_mask = jnp.pad(edit_mask, ((0, 0), (0, max_duration - edit_mask.shape[1])),
                                constant_values=False)
        cond_mask = cond_mask & edit_mask
    if no_ref_audio:
        cond = jnp.zeros_like(cond)
    step_cond = jnp.where(cond_mask[:, :, None], cond, 0.0)
    return SamplerInputs(cond=step_cond, cond_mask=cond_mask,
                         duration=duration, text_ids=text_ids, ppg=ppg)


def _folded_cfg_flow(params, state, arch: DiTConfig, inputs: SamplerInputs,
                     branches, weights, mask, compute_dtype):
    """Build step_fn(t, x) evaluating all CFG branches in ONE (K*B)-batch call.

    branches: list of dicts {drop_audio, drop_text, drop_ppg} (python bools).
    weights: list of floats — the flow combination sum_k w_k * flow_k.
    Time-independent embeddings are computed here, once.
    """
    b, n, _ = inputs.cond.shape
    k = len(branches)

    # precompute per-branch text/ppg embeddings (time-independent)
    text_embeds = []
    ppg_embeds = []
    for br in branches:
        drop_text = jnp.full((b,), br["drop_text"], bool)
        te = fbb.precompute_text_embed(params, arch, inputs.text_ids, b, n, drop_text, compute_dtype)
        text_embeds.append(te)
        if fbb.uses_ppg(arch):
            drop_ppg = jnp.full((b,), br["drop_ppg"], bool)
            pe, _ = fdit.ppg_embed_fn(params, state, arch, inputs.ppg, b, n, drop_ppg,
                                      training=False, compute_dtype=compute_dtype)
            ppg_embeds.append(pe)
        else:
            ppg_embeds.append(None)

    text_embed_k = jnp.concatenate(text_embeds, axis=0)  # (K*B, N, D)
    ppg_embed_k = jnp.concatenate(ppg_embeds, axis=0) if fbb.uses_ppg(arch) else None
    cond_k = jnp.tile(inputs.cond, (k, 1, 1))
    drop_audio_k = jnp.concatenate(
        [jnp.full((b,), br["drop_audio"], bool) for br in branches], axis=0)
    mask_k = jnp.tile(mask, (k, 1)) if mask is not None else None
    w = jnp.asarray(weights, jnp.float32)

    def step_fn(t, x):
        xk = jnp.tile(x, (k, 1, 1)).astype(compute_dtype)
        tk = jnp.full((k * b,), t, jnp.float32)
        pred = fbb.sample_step(
            params, state, arch,
            x=xk, cond=cond_k, text_embed=text_embed_k, time=tk,
            drop_audio_cond=drop_audio_k, ppg_embed=ppg_embed_k,
            mask=mask_k, compute_dtype=compute_dtype,
        )  # (K*B, N, mel) fp32
        flows = pred.reshape(k, b, n, -1)
        return jnp.einsum("k,kbnd->bnd", w, flows)

    return step_fn


@partial(jax.jit, static_argnames=("arch", "cfm", "steps", "sway_coef", "cfg_strength",
                                   "use_mask", "compute_dtype", "t_start", "timesteps"))
def sample(
    params,
    state,
    arch: DiTConfig,
    cfm: CFMConfig,
    inputs: SamplerInputs,
    key: jax.Array,
    *,
    steps: int = 32,
    cfg_strength: float = 2.0,
    sway_coef: Optional[float] = -1.0,
    use_mask: bool = True,
    t_start: float = 0.0,
    test_cond: Optional[jnp.ndarray] = None,  # duplicate_test diagnostic
    seeds: Optional[jnp.ndarray] = None,  # (B,) per-request noise seeds
    timesteps: Optional[tuple] = None,  # explicit grid (pruned_sway_timesteps)
    compute_dtype=jnp.bfloat16,
):
    """Standard 2-pass CFG sampler: pred + (pred - null_pred) * cfg.

    reference: cfm.py:348-482 (CFM.sample). Branch weights:
    (1+cfg)*cond - cfg*uncond. When cfg < 1e-5 a single branch runs.
    Returns (out, trajectory); the prompt region of `out` is overwritten with
    the conditioning mel (cfm.py:476).
    """
    b, n, mel_dim = inputs.cond.shape
    if t_start > 0.0:
        # duplicate_test probe shrinks the grid so step density matches the
        # full [0, 1] schedule (reference cfm.py:461-465).
        steps = max(int(steps * (1.0 - t_start)), 1)
    mask = lens_to_mask(inputs.duration, n) if use_mask else None

    if cfg_strength < 1e-5:
        branches = [dict(drop_audio=False, drop_text=False, drop_ppg=False)]
        weights = [1.0]
    else:
        branches = [
            dict(drop_audio=False, drop_text=False, drop_ppg=False),
            dict(drop_audio=True, drop_text=True, drop_ppg=True),
        ]
        weights = [1.0 + cfg_strength, -cfg_strength]

    step_fn = _folded_cfg_flow(params, state, arch, inputs, branches, weights, mask, compute_dtype)

    y0 = noise_like(key, b, n, mel_dim, inputs.duration, seeds=seeds)
    if test_cond is not None:
        # duplicate_test diagnostic (reference cfm.py:410-412, 461-465): start
        # the ODE at t_start from a mix of noise and the shifted ground truth
        y0 = (1.0 - t_start) * y0 + t_start * test_cond
    # explicit grid (EPSS-pruned or custom) overrides steps/sway; NFE = len-1
    ts = (jnp.asarray(np.asarray(timesteps, np.float32)) if timesteps is not None
          else jnp.asarray(sway_timesteps(steps, sway_coef, t_start)))
    y_final, traj = _ode_scan(step_fn, y0, ts, cfm.ode_method, cfm.ode_unroll)

    out = jnp.where(inputs.cond_mask[:, :, None], inputs.cond, y_final)
    return out, traj


@partial(jax.jit, static_argnames=("arch", "cfm", "steps", "sway_coef", "use_mask",
                                   "compute_dtype", "timesteps"))
def sample_tts(
    params,
    state,
    arch: DiTConfig,
    cfm: CFMConfig,
    inputs: SamplerInputs,
    key: jax.Array,
    *,
    steps: int = 32,
    alpha_spk: float = 1.0,
    alpha_txt: float = 1.0,
    sway_coef: Optional[float] = None,
    use_mask: bool = True,
    seeds: Optional[jnp.ndarray] = None,
    timesteps: Optional[tuple] = None,  # explicit grid (pruned_sway_timesteps)
    compute_dtype=jnp.bfloat16,
):
    """MegaTTS3-style dual-alpha TTS CFG (3 branches folded into one 3B batch).

    flow = a_spk*(spk_txt - txt) + a_txt*(txt - null) + null
    reference: cfm.py:94-223 (CFM.sample_tts), combine at :187.
    """
    b, n, mel_dim = inputs.cond.shape
    mask = lens_to_mask(inputs.duration, n) if use_mask else None

    branches = [
        dict(drop_audio=True, drop_text=True, drop_ppg=True),    # null
        dict(drop_audio=True, drop_text=False, drop_ppg=True),   # txt
        dict(drop_audio=False, drop_text=False, drop_ppg=True),  # spk+txt
    ]
    weights = [1.0 - alpha_txt, alpha_txt - alpha_spk, alpha_spk]

    step_fn = _folded_cfg_flow(params, state, arch, inputs, branches, weights, mask, compute_dtype)
    y0 = noise_like(key, b, n, mel_dim, inputs.duration, seeds=seeds)
    ts = (jnp.asarray(np.asarray(timesteps, np.float32)) if timesteps is not None
          else jnp.asarray(sway_timesteps(steps, sway_coef)))
    y_final, traj = _ode_scan(step_fn, y0, ts, cfm.ode_method, cfm.ode_unroll)
    out = jnp.where(inputs.cond_mask[:, :, None], inputs.cond, y_final)
    return out, traj


@partial(jax.jit, static_argnames=("arch", "cfm", "steps", "sway_coef", "use_mask",
                                   "compute_dtype", "timesteps"))
def sample_vc(
    params,
    state,
    arch: DiTConfig,
    cfm: CFMConfig,
    inputs: SamplerInputs,
    key: jax.Array,
    *,
    steps: int = 32,
    alpha_spk: float = 1.0,
    alpha_ppg: float = 1.0,
    sway_coef: Optional[float] = None,
    use_mask: bool = True,
    seeds: Optional[jnp.ndarray] = None,
    timesteps: Optional[tuple] = None,  # explicit grid (pruned_sway_timesteps)
    compute_dtype=jnp.bfloat16,
):
    """Voice-conversion CFG over PPG (text fully dropped in all branches).

    flow = a_spk*(spk_ppg - ppg) + a_ppg*(ppg - null) + null
    reference: cfm.py:225-346 (CFM.sample_vc), combine at :310.
    """
    b, n, mel_dim = inputs.cond.shape
    mask = lens_to_mask(inputs.duration, n) if use_mask else None

    branches = [
        dict(drop_audio=True, drop_text=True, drop_ppg=True),    # null
        dict(drop_audio=True, drop_text=True, drop_ppg=False),   # ppg
        dict(drop_audio=False, drop_text=True, drop_ppg=False),  # spk+ppg
    ]
    weights = [1.0 - alpha_ppg, alpha_ppg - alpha_spk, alpha_spk]

    step_fn = _folded_cfg_flow(params, state, arch, inputs, branches, weights, mask, compute_dtype)
    y0 = noise_like(key, b, n, mel_dim, inputs.duration, seeds=seeds)
    ts = (jnp.asarray(np.asarray(timesteps, np.float32)) if timesteps is not None
          else jnp.asarray(sway_timesteps(steps, sway_coef)))
    y_final, traj = _ode_scan(step_fn, y0, ts, cfm.ode_method, cfm.ode_unroll)
    out = jnp.where(inputs.cond_mask[:, :, None], inputs.cond, y_final)
    return out, traj


# ---------------------------------------------------------------------------
# training loss
# ---------------------------------------------------------------------------


class CFMLossOut(NamedTuple):
    loss: jnp.ndarray
    flow_loss: jnp.ndarray
    extra_loss: jnp.ndarray
    new_state: dict
    cond: jnp.ndarray
    pred: jnp.ndarray


def cfm_loss(
    params,
    state,
    arch: DiTConfig,
    cfm: CFMConfig,
    *,
    mel: jnp.ndarray,  # (B, N, mel) padded batch
    mel_lens: jnp.ndarray,  # (B,)
    text_ids: Optional[jnp.ndarray],  # (B, NT) pad -1
    text_lens: Optional[jnp.ndarray] = None,
    ppg: Optional[jnp.ndarray] = None,
    ppg_lens: Optional[jnp.ndarray] = None,
    rng: jax.Array,
    training: bool = True,
    vq_temperature: float | jnp.ndarray = 2.0,
    compute_dtype=jnp.bfloat16,
) -> CFMLossOut:
    """Flow-matching infilling loss. reference: cfm.py:484-590 (CFM.forward).

    Faithful behaviors kept: one random span per sample covering 70-100% of
    its valid frames; batch-shared condition-drop decision (the reference
    draws python `random()` once per batch — cfm.py:549-569); masked MSE over
    the random span only; extra codebook losses added.
    """
    b, n, _ = mel.shape
    (r_frac, r_span, r_time, r_noise, r_drop1, r_drop2, r_model) = jax.random.split(rng, 7)

    mask = lens_to_mask(mel_lens, n)

    frac = jax.random.uniform(r_frac, (b,), minval=cfm.frac_lengths_mask[0],
                              maxval=cfm.frac_lengths_mask[1])
    rand_span_mask = mask_from_frac_lengths(r_span, mel_lens, frac, n) & mask

    x1 = mel.astype(jnp.float32)
    x0 = jax.random.normal(r_noise, x1.shape, jnp.float32)
    time = jax.random.uniform(r_time, (b,), jnp.float32)
    t = time[:, None, None]
    phi = (1 - t) * x0 + t * x1
    flow = x1 - x0

    cond = jnp.where(rand_span_mask[:, :, None], 0.0, x1)

    # condition drop table — batch-shared scalars (cfm.py:549-569)
    u1 = jax.random.uniform(r_drop1)
    u2 = jax.random.uniform(r_drop2)
    drop_audio = u1 < cfm.audio_drop_prob
    if fbb.uses_ppg(arch):
        p = arch.ppg.combined_cond_drop_prob
        c1, c2, c3 = p[0], p[0] + p[1], p[0] + p[1] + p[2]
        drop_text = (u2 >= c1) & (u2 < c2) | (u2 >= c3)
        drop_ppg = (u2 >= c2)
        drop_audio = drop_audio | (u2 >= c3)
    else:
        drop_all = u2 < cfm.cond_drop_prob
        drop_text = drop_all
        drop_audio = drop_audio | drop_all
        drop_ppg = jnp.asarray(True)

    bb = jnp.ones((b,), bool)
    pred, extras = fbb.forward_train(
        params, state, arch,
        x=phi.astype(compute_dtype), cond=cond.astype(compute_dtype),
        text_ids=text_ids, time=time,
        drop_audio_cond=bb & drop_audio, drop_text=bb & drop_text, drop_ppg=bb & drop_ppg,
        ppg=ppg, mask=None,  # reference passes no attention mask in training (cfm.py:571-577)
        text_len=text_lens, ppg_len=ppg_lens,
        training=training, rng=r_model, vq_temperature=vq_temperature,
        compute_dtype=compute_dtype,
    )

    se = jnp.square(pred.astype(jnp.float32) - flow)
    w = rand_span_mask[:, :, None].astype(jnp.float32)
    flow_loss = jnp.sum(se * w) / jnp.maximum(jnp.sum(w) * se.shape[-1], 1.0)
    loss = flow_loss + extras.extra_loss
    return CFMLossOut(loss=loss, flow_loss=flow_loss, extra_loss=extras.extra_loss,
                      new_state=extras.new_state, cond=cond, pred=pred)
