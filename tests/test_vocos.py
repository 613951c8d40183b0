"""Vocos vocoder structural tests (random weights; ckpt parity needs the real
charactr/vocos-mel-24khz weights, unavailable offline)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode, vocos_from_torch

TINY = VocosConfig(input_channels=10, dim=32, intermediate_dim=64, num_layers=2,
                   n_fft=64, hop_length=16)


def test_decode_shape(rng):
    params = init_vocos(jax.random.PRNGKey(0), TINY)
    mel = jnp.asarray(rng.standard_normal((2, 20, 10)).astype(np.float32))
    wav = vocos_decode(params, TINY, mel)
    # istft center=True length: (n_frames - 1) * hop
    assert wav.shape == (2, (20 - 1) * 16)
    assert np.isfinite(np.asarray(wav)).all()


def test_from_torch_roundtrip(rng):
    """torch-layout dict -> pytree -> decode runs; weights land in right slots."""
    import torch

    cfg = TINY
    sd = {}
    sd["backbone.embed.weight"] = rng.standard_normal((cfg.dim, cfg.input_channels, 7)).astype(np.float32) * 0.1
    sd["backbone.embed.bias"] = np.zeros(cfg.dim, np.float32)
    sd["backbone.norm.weight"] = np.ones(cfg.dim, np.float32)
    sd["backbone.norm.bias"] = np.zeros(cfg.dim, np.float32)
    for i in range(cfg.num_layers):
        sd[f"backbone.convnext.{i}.dwconv.weight"] = rng.standard_normal((cfg.dim, 1, 7)).astype(np.float32) * 0.1
        sd[f"backbone.convnext.{i}.dwconv.bias"] = np.zeros(cfg.dim, np.float32)
        sd[f"backbone.convnext.{i}.norm.weight"] = np.ones(cfg.dim, np.float32)
        sd[f"backbone.convnext.{i}.norm.bias"] = np.zeros(cfg.dim, np.float32)
        sd[f"backbone.convnext.{i}.pwconv1.weight"] = rng.standard_normal((cfg.intermediate_dim, cfg.dim)).astype(np.float32) * 0.1
        sd[f"backbone.convnext.{i}.pwconv1.bias"] = np.zeros(cfg.intermediate_dim, np.float32)
        sd[f"backbone.convnext.{i}.pwconv2.weight"] = rng.standard_normal((cfg.dim, cfg.intermediate_dim)).astype(np.float32) * 0.1
        sd[f"backbone.convnext.{i}.pwconv2.bias"] = np.zeros(cfg.dim, np.float32)
        sd[f"backbone.convnext.{i}.gamma"] = np.full(cfg.dim, 0.5, np.float32)
    sd["backbone.final_layer_norm.weight"] = np.ones(cfg.dim, np.float32)
    sd["backbone.final_layer_norm.bias"] = np.zeros(cfg.dim, np.float32)
    sd["head.out.weight"] = rng.standard_normal((cfg.n_fft + 2, cfg.dim)).astype(np.float32) * 0.1
    sd["head.out.bias"] = np.zeros(cfg.n_fft + 2, np.float32)

    params = vocos_from_torch(sd, cfg)
    mel = jnp.asarray(rng.standard_normal((1, 12, 10)).astype(np.float32))
    wav = vocos_decode(params, cfg, mel)
    assert np.isfinite(np.asarray(wav)).all()

    # embed conv parity against torch on the same weights
    tc = torch.nn.Conv1d(cfg.input_channels, cfg.dim, 7, padding=3)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(sd["backbone.embed.weight"]))
        tc.bias.copy_(torch.from_numpy(sd["backbone.embed.bias"]))
    from f5e_tts_tpu.ops import nn as fnn

    ours = np.asarray(fnn.conv1d(jax.tree.map(jnp.asarray, params["embed"]), mel, padding=3))
    theirs = tc(torch.from_numpy(np.asarray(mel).transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
