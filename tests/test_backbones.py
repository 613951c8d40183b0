"""UNetT and MMDiT backbone tests + CFM integration through the dispatch layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, MMDiTConfig, UNetTConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.models import cfm as fcfm

UNETT = UNetTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                    text_dim=None, conv_layers=1, pe_attn_head=1,
                    text_mask_padding=False, dropout=0.0)
MMDIT = MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                    dropout=0.0)
VOCAB = 20


def _inputs(rng, mel_dim, b=2, n=16, nt=8):
    x = jnp.asarray(rng.standard_normal((b, n, mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    time = jnp.asarray([0.3, 0.7], np.float32)
    f = jnp.zeros((b,), bool)
    return x, cond, text, time, f


def test_unett_forward_shape(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), UNETT, VOCAB)
    x, cond, text, time, f = _inputs(rng, UNETT.mel_dim)
    pred, extras = fbb.forward_train(params, state, UNETT, x=x, cond=cond, text_ids=text,
                                     time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                     compute_dtype=jnp.float32)
    assert pred.shape == (2, 16, UNETT.mel_dim)
    assert np.isfinite(np.asarray(pred)).all()
    # UNetT is NOT zero-init — output should be nonzero at init
    assert np.abs(np.asarray(pred)).max() > 0


def test_unett_skip_order(rng):
    """Skips pop LIFO: zeroing the *first* layer's params must change the
    *last* layer's skip input. Sanity check: forward differs when first-half
    outputs change."""
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), UNETT, VOCAB)
    x, cond, text, time, f = _inputs(rng, UNETT.mel_dim)

    def fwd(p):
        pred, _ = fbb.forward_train(p, state, UNETT, x=x, cond=cond, text_ids=text,
                                    time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                    compute_dtype=jnp.float32)
        return np.asarray(pred)

    base = fwd(params)
    p2 = jax.tree.map(lambda a: a, params)
    p2["second_half"] = jax.tree.map(lambda a: a * 0.5, params["second_half"])
    assert np.abs(fwd(p2) - base).max() > 1e-6


def test_unett_mask(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(1), UNETT, VOCAB)
    x, cond, text, time, f = _inputs(rng, UNETT.mel_dim)
    mask = jnp.asarray([[True] * 10 + [False] * 6, [True] * 16])
    pred, _ = fbb.forward_train(params, state, UNETT, x=x, cond=cond, text_ids=text,
                                time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                mask=mask, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(pred)).all()


def test_mmdit_forward_zero_init(rng):
    """MMDiT is AdaLN-zero + zero proj_out (mmdit.py:130-142) => zero output."""
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), MMDIT, VOCAB)
    x, cond, text, time, f = _inputs(rng, MMDIT.mel_dim)
    pred, _ = fbb.forward_train(params, state, MMDIT, x=x, cond=cond, text_ids=text,
                                time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                compute_dtype=jnp.float32)
    assert pred.shape == (2, 16, MMDIT.mel_dim)
    np.testing.assert_allclose(np.asarray(pred), 0.0, atol=1e-6)


def test_mmdit_nonzero_after_perturb(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), MMDIT, VOCAB)
    params["proj_out"]["w"] = jnp.asarray(
        rng.standard_normal((MMDIT.dim, MMDIT.mel_dim)).astype(np.float32)) * 0.02
    # also un-zero the AdaLN gates so attention output reaches the head
    params["blocks"]["attn_norm_x"]["w"] = jnp.asarray(
        rng.standard_normal(np.asarray(params["blocks"]["attn_norm_x"]["w"]).shape).astype(np.float32)) * 0.02
    x, cond, text, time, f = _inputs(rng, MMDIT.mel_dim)
    pred, _ = fbb.forward_train(params, state, MMDIT, x=x, cond=cond, text_ids=text,
                                time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                compute_dtype=jnp.float32)
    out = np.asarray(pred)
    assert np.isfinite(out).all() and np.abs(out).max() > 0

    # text must influence the audio stream through joint attention
    pred2, _ = fbb.forward_train(params, state, MMDIT, x=x, cond=cond, text_ids=text,
                                 time=time, drop_audio_cond=f,
                                 drop_text=jnp.ones((2,), bool), drop_ppg=f,
                                 compute_dtype=jnp.float32)
    assert np.abs(np.asarray(pred2) - out).max() > 1e-7


@pytest.mark.parametrize("arch", [UNETT, MMDIT], ids=["unett", "mmdit"])
def test_cfm_sampler_with_backbone(rng, arch):
    """The folded-CFG sampler runs with non-DiT backbones via dispatch."""
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), arch, VOCAB)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((arch.dim, arch.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((arch.mel_dim,), jnp.float32),
    }
    cond = jnp.asarray(rng.standard_normal((2, 24, arch.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (2, 6)).astype(np.int32))
    inputs = fcfm.prepare_inputs(cond, jnp.asarray([8, 10]), jnp.asarray([20, 24]), 24,
                                 text_ids=text)
    out, traj = fcfm.sample(params, state, arch, CFMConfig(), inputs, jax.random.PRNGKey(1),
                            steps=2, cfg_strength=2.0, sway_coef=-1.0,
                            compute_dtype=jnp.float32)
    assert out.shape == (2, 24, arch.mel_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_cfm_loss_with_unett(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(2), UNETT, VOCAB)
    mel = jnp.asarray(rng.standard_normal((2, 16, UNETT.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (2, 6)).astype(np.int32))
    out = fcfm.cfm_loss(params, state, UNETT, CFMConfig(), mel=mel,
                        mel_lens=jnp.asarray([16, 12]), text_ids=text,
                        rng=jax.random.PRNGKey(3), training=False, compute_dtype=jnp.float32)
    assert np.isfinite(float(out.loss)) and float(out.loss) > 0
