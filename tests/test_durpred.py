"""Duration predictor subsystem tests."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.models import durpred as fd


def test_generate_path():
    dur = jnp.asarray([[2, 1, 3]], jnp.int32)
    mask = jnp.ones((1, 3, 6))
    path = np.asarray(fd.generate_path(dur, mask))
    # token 0 covers frames 0-1, token 1 frame 2, token 2 frames 3-5
    expected = np.array([[[1, 1, 0, 0, 0, 0],
                          [0, 0, 1, 0, 0, 0],
                          [0, 0, 0, 1, 1, 1]]], np.float32)
    np.testing.assert_array_equal(path, expected)


def test_duration_loss():
    logw = jnp.asarray([[1.0, 2.0]])
    logw_hat = jnp.asarray([[1.0, 1.0]])
    lens = jnp.asarray([2.0])
    assert float(fd.duration_loss(logw, logw_hat, lens)) == 0.5


def test_style_encoder(rng):
    cfg = fd.StyleEncoderConfig(n_mel_channels=12, style_hidden=16,
                                style_vector_dim=8, style_head=2)
    params = fd.init_style_encoder(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.standard_normal((2, 20, 12)).astype(np.float32))
    style = fd.style_encoder(params, cfg, mel, jnp.asarray([20, 15]))
    assert style.shape == (2, 8)
    assert np.isfinite(np.asarray(style)).all()
    # masked version differs from unmasked for the short sample
    style2 = fd.style_encoder(params, cfg, mel)
    assert np.abs(np.asarray(style2[1]) - np.asarray(style[1])).max() > 1e-7


def test_duration_predictor(rng):
    cfg = fd.DurPredConfig(in_channels=16, filter_channels=8, style_vector_dim=8)
    params = fd.init_duration_predictor(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    mask = jnp.asarray([[True] * 10, [True] * 6 + [False] * 4])
    style = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    logw = fd.duration_predictor(params, cfg, x, mask, style)
    assert logw.shape == (2, 10)
    assert np.abs(np.asarray(logw[1, 6:])).max() == 0  # masked out

    # gradients stop at x and style (reference detaches both, durpred.py:89-91)
    def loss(x, style):
        return jnp.sum(fd.duration_predictor(params, cfg, x, mask, style) ** 2)

    gx, gs = jax.grad(loss, argnums=(0, 1))(x, style)
    assert np.abs(np.asarray(gx)).max() == 0
    assert np.abs(np.asarray(gs)).max() == 0
