"""Golden parity: our JAX DiT (with ingested torch-layout weights, half-split
rope) vs an independent from-spec torch implementation of the reference
conventions. Catches any convention drift (AdaLN chunk order, pos tables,
rope, conv layouts, text drop/pad order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from f5e_tts_tpu.config import DiTConfig
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.utils.torch_ckpt import dit_from_torch, dit_to_torch
from tests.torch_ref import dit_forward_torch


def _random_torch_sd(cfg: DiTConfig, vocab: int, seed=0):
    """Random torch-layout state dict via init + export (values random,
    layout exactly the reference's)."""
    params, state = fdit.init_dit(jax.random.PRNGKey(seed), cfg, vocab)
    # de-zero the zero-init layers so the test has signal everywhere
    r = np.random.default_rng(seed)

    def dezero(p, scale=0.05):
        return jax.tree.map(
            lambda a: jnp.asarray(r.standard_normal(a.shape).astype(np.float32)) * scale
            if float(jnp.abs(a).max()) == 0 else a, p)

    params["proj_out"] = dezero(params["proj_out"])
    params["norm_out"] = dezero(params["norm_out"])
    params["blocks"]["attn_norm"] = dezero(params["blocks"]["attn_norm"])
    if cfg.qk_norm == "rms_norm":
        # non-trivial per-dim weights to probe the half-split permutation of
        # the qk-norm gains through export/ingest
        for name in ("q_norm", "k_norm"):
            shape = np.asarray(params["blocks"]["attn"][name]["g"]).shape
            params["blocks"]["attn"][name]["g"] = jnp.asarray(
                1.0 + 0.3 * r.standard_normal(shape).astype(np.float32))
    return dit_to_torch(params, state, cfg)


@pytest.mark.parametrize("cfg", [
    DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
              text_dim=32, conv_layers=2, dropout=0.0),
    DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
              text_dim=32, text_mask_padding=False, conv_layers=1,
              pe_attn_head=1, dropout=0.0),
    DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
              text_dim=32, conv_layers=1, qk_norm="rms_norm", dropout=0.0),
], ids=["v1_style", "legacy_pe1", "qk_norm"])
def test_dit_matches_torch_reference(cfg, rng):
    vocab = 20
    sd = _random_torch_sd(cfg, vocab)

    b, n, nt = 2, 24, 9
    x = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, vocab, (b, nt)).astype(np.int32)
    text[1, 6:] = -1
    time = np.asarray([0.25, 0.8], np.float32)

    for drop_audio, drop_text in [(False, False), (True, True), (True, False)]:
        ref = dit_forward_torch(
            sd, cfg, torch.from_numpy(x), torch.from_numpy(cond),
            torch.from_numpy(text).long(), torch.from_numpy(time),
            drop_audio=drop_audio, drop_text=drop_text).numpy()

        params, state = dit_from_torch(sd, cfg)
        params = jax.tree.map(jnp.asarray, params)
        flags = jnp.full((b,), True)
        pred, _ = fdit.dit_forward(
            params, state, cfg, x=jnp.asarray(x), cond=jnp.asarray(cond),
            text_ids=jnp.asarray(text), time=jnp.asarray(time),
            drop_audio_cond=flags & drop_audio, drop_text=flags & drop_text,
            drop_ppg=flags, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(pred), ref, rtol=2e-3, atol=2e-4,
                                   err_msg=f"drop_audio={drop_audio} drop_text={drop_text}")


def test_sampler_step_matches_torch_cfg_combination(rng):
    """One folded-CFG Euler step == torch two-pass CFG combination."""
    from f5e_tts_tpu.config import CFMConfig
    from f5e_tts_tpu.models import cfm as fcfm

    cfg = DiTConfig(dim=64, depth=1, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                    text_dim=32, conv_layers=1, dropout=0.0)
    vocab = 20
    sd = _random_torch_sd(cfg, vocab, seed=3)
    params, state = dit_from_torch(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)

    b, n = 1, 24
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, vocab, (b, 8)).astype(np.int32)
    x = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    t_val = 0.3
    cfg_strength = 2.0

    # torch reference flow: pred + (pred - null) * cfg
    tx = torch.from_numpy(x)
    tc = torch.from_numpy(cond)
    tt = torch.from_numpy(np.full((b,), t_val, np.float32))
    tids = torch.from_numpy(text).long()
    pred = dit_forward_torch(sd, cfg, tx, tc, tids, tt, False, False).numpy()
    null = dit_forward_torch(sd, cfg, tx, torch.zeros_like(tc), tids, tt, True, True).numpy()
    ref_flow = pred + (pred - null) * cfg_strength

    inputs = fcfm.prepare_inputs(jnp.asarray(cond), jnp.asarray([n]), jnp.asarray([n]),
                                 n, text_ids=jnp.asarray(text))
    step_fn = fcfm._folded_cfg_flow(
        params, state, cfg, inputs,
        [dict(drop_audio=False, drop_text=False, drop_ppg=False),
         dict(drop_audio=True, drop_text=True, drop_ppg=True)],
        [1.0 + cfg_strength, -cfg_strength], None, jnp.float32)
    ours = np.asarray(step_fn(jnp.asarray(t_val), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_flow, rtol=2e-3, atol=5e-4)
