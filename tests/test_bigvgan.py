"""BigVGAN generator structural tests (random weights; real-weight parity
pending offline)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from f5e_tts_tpu.models.bigvgan import (BigVGANConfig, bigvgan_decode, bigvgan_from_torch,
                                        init_bigvgan, kaiser_sinc_filter, snake_beta)
from f5e_tts_tpu.ops import nn as fnn

TINY = BigVGANConfig(num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                     upsample_initial_channel=16, resblock_kernel_sizes=(3,),
                     resblock_dilation_sizes=((1, 3),))


def test_decode_shape_and_range(rng):
    params = init_bigvgan(jax.random.PRNGKey(0), TINY)
    mel = jnp.asarray(rng.standard_normal((1, 20, 8)).astype(np.float32))
    wav = bigvgan_decode(params, TINY, mel)
    assert wav.shape == (1, 20 * 4 * 2)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_snake_beta():
    x = jnp.linspace(-2, 2, 64).reshape(1, 64, 1)
    la = jnp.zeros((1,))
    lb = jnp.zeros((1,))
    y = np.asarray(snake_beta(x, la, lb))
    xf = np.linspace(-2, 2, 64)
    ref = xf + np.sin(xf) ** 2  # alpha=beta=1
    np.testing.assert_allclose(y[0, :, 0], ref, rtol=1e-5, atol=1e-6)


def test_kaiser_filter_dc_gain():
    f = kaiser_sinc_filter(0.25, 0.3, 12)
    assert f.shape == (12,)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)


def test_conv_transpose_matches_torch(rng):
    x = rng.standard_normal((2, 10, 6)).astype(np.float32)
    tc = torch.nn.ConvTranspose1d(6, 4, kernel_size=8, stride=4, padding=2)
    ref = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    w = tc.weight.detach().numpy()  # (in, out, K)
    p = {"w": np.ascontiguousarray(w[:, :, ::-1].transpose(2, 0, 1)),
         "b": tc.bias.detach().numpy()}
    ours = np.asarray(fnn.conv_transpose1d(jax.tree.map(jnp.asarray, p), jnp.asarray(x),
                                           stride=4, padding=2))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_from_torch_weight_norm(rng):
    """weight_g/weight_v pairs resolve to the same conv as a plain weight."""
    w = rng.standard_normal((4, 6, 3)).astype(np.float32)  # torch conv (out,in,k)
    g = np.sqrt((w**2).sum(axis=(1, 2), keepdims=True))
    v = w.copy()
    sd = {
        "conv_pre.weight_g": g, "conv_pre.weight_v": v,
        "conv_pre.bias": np.zeros(4, np.float32),
    }
    cfg = BigVGANConfig(num_mels=6, upsample_rates=(), upsample_kernel_sizes=(),
                        upsample_initial_channel=4, resblock_kernel_sizes=(),
                        resblock_dilation_sizes=())
    sd["activation_post.act.alpha"] = np.zeros(4, np.float32)
    sd["activation_post.act.beta"] = np.zeros(4, np.float32)
    sd["conv_post.weight"] = rng.standard_normal((1, 4, 7)).astype(np.float32)
    params = bigvgan_from_torch(sd, cfg)
    np.testing.assert_allclose(params["conv_pre"]["w"], w.transpose(2, 1, 0), rtol=1e-5)
