"""DiT backbone tests: shapes, zero-init property, CFG fold equivalence,
codebook training path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import DiTConfig, PPGConfig, CodebookConfig
from f5e_tts_tpu.models import dit as fdit

TINY = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                 text_dim=32, conv_layers=1, dropout=0.0)
VOCAB = 20


@pytest.fixture(scope="module")
def tiny_model():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
    return params, state


def _inputs(rng, b=2, n=16, nt=8):
    x = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    text = text.at[1, 5:].set(-1)  # padding
    time = jnp.asarray([0.3, 0.7], np.float32)
    return x, cond, text, time


def test_zero_init_output(tiny_model, rng):
    """AdaLN-zero + zero proj_out => output is exactly zero at init
    (reference: dit.py:273-283 makes the initial model the identity flow)."""
    params, state = tiny_model
    x, cond, text, time = _inputs(rng)
    f = jnp.zeros((2,), bool)
    pred, extras = fdit.dit_forward(
        params, state, TINY, x=x, cond=cond, text_ids=text, time=time,
        drop_audio_cond=f, drop_text=f, drop_ppg=f, compute_dtype=jnp.float32)
    assert pred.shape == (2, 16, TINY.mel_dim)
    np.testing.assert_allclose(np.asarray(pred), 0.0, atol=1e-6)


def test_forward_nonzero_after_perturb(tiny_model, rng):
    params, state = tiny_model
    params = jax.tree.map(lambda a: a, params)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }
    x, cond, text, time = _inputs(rng)
    f = jnp.zeros((2,), bool)
    pred, _ = fdit.dit_forward(
        params, state, TINY, x=x, cond=cond, text_ids=text, time=time,
        drop_audio_cond=f, drop_text=f, drop_ppg=f, compute_dtype=jnp.float32)
    assert np.abs(np.asarray(pred)).max() > 0


def test_drop_flags_per_sample(tiny_model, rng):
    """Per-sample drop flags: dropping text for sample 0 only must equal
    running sample 0 with drop and sample 1 without, batched."""
    params, state = tiny_model
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }
    x, cond, text, time = _inputs(rng)
    f = jnp.zeros((2,), bool)

    def fwd(drop_text):
        pred, _ = fdit.dit_forward(
            params, state, TINY, x=x, cond=cond, text_ids=text, time=time,
            drop_audio_cond=f, drop_text=drop_text, drop_ppg=f, compute_dtype=jnp.float32)
        return np.asarray(pred)

    mixed = fwd(jnp.asarray([True, False]))
    all_drop = fwd(jnp.asarray([True, True]))
    no_drop = fwd(jnp.asarray([False, False]))
    np.testing.assert_allclose(mixed[0], all_drop[0], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(mixed[1], no_drop[1], rtol=2e-4, atol=1e-5)
    assert np.abs(mixed[0] - no_drop[0]).max() > 1e-6  # text actually matters


def test_sample_step_matches_forward(tiny_model, rng):
    """dit_sample_step with precomputed text embedding == dit_forward (eval)."""
    params, state = tiny_model
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }
    x, cond, text, time = _inputs(rng)
    f = jnp.zeros((2,), bool)
    pred_ref, _ = fdit.dit_forward(
        params, state, TINY, x=x, cond=cond, text_ids=text, time=time,
        drop_audio_cond=f, drop_text=f, drop_ppg=f, compute_dtype=jnp.float32)
    te = fdit.text_embed_fn(params, TINY, text, 2, 16, f, jnp.float32)
    pred = fdit.dit_sample_step(
        params, state, TINY, x=x, cond=cond, text_embed=te, time=time,
        drop_audio_cond=f, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref), rtol=1e-5, atol=1e-6)


def test_ppg_codebook_training_path(rng):
    """Full training forward with PPG + codebook losses runs and is finite."""
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
        text_dim=32, conv_layers=1, dropout=0.1,
        ppg=PPGConfig(use_ppg=True, ppg_dim=12, use_cross_mask=True, cross_mask_prob=0.5),
        codebook=CodebookConfig(use_codebook=True, num_vars=8, groups=2,
                                use_perplex_loss=True, use_align_loss=True),
    )
    params, state = fdit.init_dit(jax.random.PRNGKey(1), cfg, VOCAB)
    b, n, nt = 2, 16, 8
    x = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    ppg = jnp.asarray(rng.standard_normal((b, n, cfg.ppg.ppg_dim)).astype(np.float32))
    time = jnp.asarray([0.3, 0.7], np.float32)
    f = jnp.zeros((b,), bool)
    pred, extras = fdit.dit_forward(
        params, state, cfg, x=x, cond=cond, text_ids=text, time=time,
        drop_audio_cond=f, drop_text=f, drop_ppg=f,
        ppg=ppg, text_len=jnp.asarray([8, 5]), ppg_len=jnp.asarray([16, 12]),
        training=True, rng=jax.random.PRNGKey(2), compute_dtype=jnp.float32)
    assert pred.shape == (b, n, cfg.mel_dim)
    assert np.isfinite(np.asarray(pred)).all()
    assert np.isfinite(float(extras.extra_loss))
    assert float(extras.perplex_loss) > 0  # diversity loss is positive at init
    # BN state updated
    assert int(extras.new_state["ppg_bn"][0]["count"]) == 1


def test_gradients_flow(rng):
    """Loss gradients are finite and nonzero for all trainable leaves."""
    cfg = TINY
    params, state = fdit.init_dit(jax.random.PRNGKey(3), cfg, VOCAB)
    x, cond, text, time = _inputs(rng)
    f = jnp.zeros((2,), bool)

    def loss_fn(p):
        pred, _ = fdit.dit_forward(
            p, state, cfg, x=x, cond=cond, text_ids=text, time=time,
            drop_audio_cond=f, drop_text=f, drop_ppg=f, compute_dtype=jnp.float32)
        return jnp.mean(jnp.square(pred - 1.0))

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # proj_out grad must be nonzero (zero-init but gradient flows)
    assert np.abs(np.asarray(grads["proj_out"]["w"])).max() > 0


def test_remat_policies_same_loss_and_grads(rng):
    """checkpoint_activations with remat_policy in {block, save_attn} must be a
    pure memory/time tradeoff: identical loss and gradients (save_attn keeps the
    named "attn_out" residuals so the backward skips the attention recompute)."""
    import dataclasses

    from f5e_tts_tpu.config import CFMConfig
    from f5e_tts_tpu.models import cfm as fcfm

    base = dataclasses.replace(TINY, checkpoint_activations=True)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), base, VOCAB)
    cfm_cfg = CFMConfig()
    mel = jnp.asarray(rng.standard_normal((2, 96, TINY.mel_dim)).astype(np.float32))
    mel_lens = jnp.asarray([96, 70], jnp.int32)
    text_ids = jnp.asarray(rng.integers(0, VOCAB, (2, 12)).astype(np.int32))
    text_lens = jnp.asarray([12, 9], jnp.int32)

    def loss_for(cfg):
        def f(p):
            out = fcfm.cfm_loss(p, state, cfg, cfm_cfg, mel=mel,
                                mel_lens=mel_lens, text_ids=text_ids,
                                text_lens=text_lens, rng=jax.random.PRNGKey(7),
                                training=True, compute_dtype=jnp.float32)
            return out.loss
        return jax.value_and_grad(f)(params)

    l1, g1 = loss_for(base)
    for pol in ("save_attn", "save_attn_ff"):
        l2, g2 = loss_for(dataclasses.replace(base, remat_policy=pol))
        assert float(l1) == float(l2), pol
        md = max(jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)))
        assert md < 1e-5, (pol, md)
