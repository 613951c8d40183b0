"""WeNet checkpoint ingestion: synthetic 33.pt-style checkpoint + train.yaml +
global_cmvn -> load_ppg_extractor -> extraction runs."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import yaml

from f5e_tts_tpu.models.conformer import ConformerConfig, load_ppg_extractor


def _mk_wenet_ckpt(path, cfg: ConformerConfig, rng):
    """Build a state dict with the wenet module tree key names."""
    d, lu, h = cfg.output_size, cfg.linear_units, cfg.attention_heads
    fdim = (cfg.input_dim - 1) // 2
    sd = {}

    def lin(key, i, o, bias=True):
        sd[f"{key}.weight"] = torch.from_numpy(rng.standard_normal((o, i)).astype(np.float32) * 0.05)
        if bias:
            sd[f"{key}.bias"] = torch.zeros(o)

    sd["encoder.embed.conv.0.weight"] = torch.from_numpy(
        rng.standard_normal((d, 1, 3, 3)).astype(np.float32) * 0.1)
    sd["encoder.embed.conv.0.bias"] = torch.zeros(d)
    lin("encoder.embed.out.0", d * fdim, d)
    for i in range(cfg.num_blocks):
        k = f"encoder.encoders.{i}"
        for nm in ("norm_ff_macaron", "norm_mha", "norm_conv", "norm_ff", "norm_final"):
            sd[f"{k}.{nm}.weight"] = torch.ones(d)
            sd[f"{k}.{nm}.bias"] = torch.zeros(d)
        lin(f"{k}.feed_forward_macaron.w_1", d, lu)
        lin(f"{k}.feed_forward_macaron.w_2", lu, d)
        lin(f"{k}.feed_forward.w_1", d, lu)
        lin(f"{k}.feed_forward.w_2", lu, d)
        for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(f"{k}.self_attn.{nm}", d, d)
        lin(f"{k}.self_attn.linear_pos", d, d, bias=False)
        sd[f"{k}.self_attn.pos_bias_u"] = torch.from_numpy(
            rng.standard_normal((h, d // h)).astype(np.float32) * 0.02)
        sd[f"{k}.self_attn.pos_bias_v"] = torch.from_numpy(
            rng.standard_normal((h, d // h)).astype(np.float32) * 0.02)
        sd[f"{k}.conv_module.pointwise_conv1.weight"] = torch.from_numpy(
            rng.standard_normal((2 * d, d, 1)).astype(np.float32) * 0.05)
        sd[f"{k}.conv_module.pointwise_conv1.bias"] = torch.zeros(2 * d)
        sd[f"{k}.conv_module.depthwise_conv.weight"] = torch.from_numpy(
            rng.standard_normal((d, 1, cfg.cnn_module_kernel)).astype(np.float32) * 0.05)
        sd[f"{k}.conv_module.depthwise_conv.bias"] = torch.zeros(d)
        sd[f"{k}.conv_module.norm.weight"] = torch.ones(d)
        sd[f"{k}.conv_module.norm.bias"] = torch.zeros(d)
        sd[f"{k}.conv_module.norm.running_mean"] = torch.zeros(d)
        sd[f"{k}.conv_module.norm.running_var"] = torch.ones(d)
        sd[f"{k}.conv_module.norm.num_batches_tracked"] = torch.tensor(0)
        sd[f"{k}.conv_module.pointwise_conv2.weight"] = torch.from_numpy(
            rng.standard_normal((d, d, 1)).astype(np.float32) * 0.05)
        sd[f"{k}.conv_module.pointwise_conv2.bias"] = torch.zeros(d)
    sd["encoder.after_norm.weight"] = torch.ones(d)
    sd["encoder.after_norm.bias"] = torch.zeros(d)
    lin("linear", d, d)  # ASRModel content layer
    # decoder/ctc junk that the loader must ignore
    lin("ctc.ctc_lo", d, 42)
    torch.save(sd, path)


def test_load_ppg_extractor_from_wenet_artifacts(tmp_path, rng):
    cfg = ConformerConfig(input_dim=80, output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2, cnn_module_kernel=7)
    ckpt = str(tmp_path / "33.pt")
    _mk_wenet_ckpt(ckpt, cfg, rng)

    # global_cmvn json (wenet format)
    n = 1000
    mean_stat = rng.standard_normal(80) * n
    var_stat = (np.abs(rng.standard_normal(80)) + 1.0) * n + (mean_stat / n) ** 2 * n
    with open(tmp_path / "global_cmvn", "w") as f:
        json.dump({"mean_stat": mean_stat.tolist(), "var_stat": var_stat.tolist(),
                   "frame_num": n}, f)

    conf = {
        "input_dim": 80, "output_dim": 600, "encoder": "conformer",
        "cmvn_file": str(tmp_path / "global_cmvn"), "is_json_cmvn": True,
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 2,
                         "cnn_module_kernel": 7, "input_layer": "conv2d2"},
    }
    with open(tmp_path / "train.yaml", "w") as f:
        yaml.safe_dump(conf, f)

    ext = load_ppg_extractor(ckpt, str(tmp_path / "train.yaml"))
    assert ext.cfg.num_blocks == 2
    # cmvn loaded (not the zero/one fallback)
    assert float(jnp.abs(ext.params["cmvn_mean"]).max()) > 0

    wav = jnp.asarray((0.1 * rng.standard_normal(16000)).astype(np.float32))[None]
    ppg, lens = ext.audio_to_ppg(wav)
    assert ppg.shape[0] == 1 and ppg.shape[2] == 16
    assert int(lens[0]) > 0
    assert np.isfinite(np.asarray(ppg)).all()
