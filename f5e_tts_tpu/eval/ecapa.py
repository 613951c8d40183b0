"""ECAPA-TDNN speaker-embedding head (eval SIM harness), TPU-native.

reference: src/f5_tts/eval/ecapa_tdnn.py:17-331 (UniSpeech speaker-verification
head: Conv1dReluBn -> 3x SE-Res2Block(k3, dilation 2/3/4, scale 8) -> concat ->
1x1 conv -> attentive stats pooling -> BN -> linear). The reference feeds it
WavLM-large hidden states combined by softmax(feature_weight); the frontend
stays a gated torch loader (weights not available offline), the head runs here
as a pure jitted function over ingested checkpoint weights.

Layout: channels-last (B, T, C) throughout (the torch original is (B, C, T));
convs via the tap-unrolled ops/nn.conv1d, eval-mode BatchNorm (running stats).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import nn as fnn


@dataclass(frozen=True)
class ECAPAConfig:
    feat_dim: int = 1024  # wavlm_large hidden size
    channels: int = 512
    emb_dim: int = 256
    scale: int = 8
    se_bottleneck: int = 128
    attention_channels: int = 128
    num_feat_layers: int = 25  # wavlm_large hidden_states count (24 + input)


def _bn_eval(bn: dict, x: jnp.ndarray) -> jnp.ndarray:
    """BatchNorm1d with running stats, channels-last."""
    xf = x.astype(jnp.float32)
    return ((xf - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["g"]
            + bn["b"]).astype(x.dtype)


def _conv_relu_bn(p: dict, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """conv -> relu -> BN (ecapa_tdnn.py:60-67 Conv1dReluBn; note BN last)."""
    k = p["conv"]["w"].shape[0]
    pad = dilation * (k - 1) // 2
    h = fnn.conv1d(p["conv"], x, padding=pad, dilation=dilation,
                   compute_dtype=jnp.float32)
    return _bn_eval(p["bn"], jnp.maximum(h, 0.0))


def _res2_conv(p: dict, x: jnp.ndarray, cfg: ECAPAConfig, dilation: int) -> jnp.ndarray:
    """Res2 hierarchical convs (ecapa_tdnn.py:17-53): split into `scale`
    groups; group i (< scale-1) is conv(sum of previous input groups);
    conv -> relu -> bn ordering; last group passes through."""
    width = x.shape[-1] // cfg.scale
    groups = [x[..., i * width:(i + 1) * width] for i in range(cfg.scale)]
    outs = []
    sp = None
    for i in range(cfg.scale - 1):
        sp = groups[i] if i == 0 else sp + groups[i]
        k = p["convs"][i]["w"].shape[0]
        pad = dilation * (k - 1) // 2
        sp = fnn.conv1d(p["convs"][i], sp, padding=pad, dilation=dilation,
                        compute_dtype=jnp.float32)
        outs.append(_bn_eval(p["bns"][i], jnp.maximum(sp, 0.0)))
        sp = outs[-1]
    outs.append(groups[-1])
    return jnp.concatenate(outs, axis=-1)


def _se_connect(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-excite over time mean (ecapa_tdnn.py:73-86)."""
    s = jnp.mean(x.astype(jnp.float32), axis=1)
    s = jnp.maximum(fnn.linear(p["linear1"], s, jnp.float32), 0.0)
    s = jax.nn.sigmoid(fnn.linear(p["linear2"], s, jnp.float32))
    return x * s[:, None, :].astype(x.dtype)


def _se_res2_block(p: dict, x: jnp.ndarray, cfg: ECAPAConfig, dilation: int) -> jnp.ndarray:
    """ecapa_tdnn.py:99-127: 1x1 -> res2 -> 1x1 -> SE, residual add."""
    residual = x
    if "shortcut" in p:
        residual = fnn.conv1d(p["shortcut"], x, padding=0, compute_dtype=jnp.float32)
    h = _conv_relu_bn(p["in_conv"], x)
    h = _res2_conv(p["res2"], h, cfg, dilation)
    h = _conv_relu_bn(p["out_conv"], h)
    h = _se_connect(p["se"], h)
    return h + residual


def _attentive_stats_pool(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """tanh(W x) -> softmax(V ...) attention weights; weighted mean+std concat
    (ecapa_tdnn.py:134-161, global_context_att=False)."""
    xf = x.astype(jnp.float32)
    alpha = jnp.tanh(fnn.linear(p["linear1"], xf, jnp.float32))
    alpha = jax.nn.softmax(fnn.linear(p["linear2"], alpha, jnp.float32), axis=1)
    mean = jnp.sum(alpha * xf, axis=1)
    var = jnp.sum(alpha * xf * xf, axis=1) - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 1e-9))
    return jnp.concatenate([mean, std], axis=-1)


def combine_hidden_states(feature_weight: jnp.ndarray, hidden: jnp.ndarray) -> jnp.ndarray:
    """softmax(feature_weight)-weighted sum over frontend layers + 1e-6, then
    per-channel instance norm over time (ecapa_tdnn.py:283-300; InstanceNorm1d
    default: no affine, eps 1e-5). hidden: (L, B, T, C)."""
    w = jax.nn.softmax(feature_weight.astype(jnp.float32))
    x = jnp.einsum("l,lbtc->btc", w, hidden.astype(jnp.float32)) + 1e-6
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def ecapa_embed(params: dict, cfg: ECAPAConfig, feats: jnp.ndarray) -> jnp.ndarray:
    """(B, T, feat_dim) normalized features -> (B, emb_dim) speaker embedding
    (ecapa_tdnn.py:295-310 forward, after get_feat)."""
    out1 = _conv_relu_bn(params["layer1"], feats)
    out2 = _se_res2_block(params["layer2"], out1, cfg, dilation=2)
    out3 = _se_res2_block(params["layer3"], out2, cfg, dilation=3)
    out4 = _se_res2_block(params["layer4"], out3, cfg, dilation=4)
    h = jnp.concatenate([out2, out3, out4], axis=-1)
    h = jnp.maximum(fnn.conv1d(params["conv"], h, padding=0,
                               compute_dtype=jnp.float32), 0.0)
    h = _attentive_stats_pool(params["pooling"], h)
    h = _bn_eval(params["bn"], h)
    return fnn.linear(params["linear"], h, jnp.float32)


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (UniSpeech wavlm_large_finetune.pth head keys)
# ---------------------------------------------------------------------------


def ecapa_from_torch(sd: Dict[str, np.ndarray], cfg: ECAPAConfig = ECAPAConfig()) -> dict:
    """Map the reference head state dict to our pytree. Frontend keys
    (`feature_extract.*`) are ignored — the WavLM features come from the gated
    torch frontend. torch Conv1d (out, in, k) -> ours (k, in, out)."""

    def conv(k):
        p = {"w": np.ascontiguousarray(sd[f"{k}.weight"].transpose(2, 1, 0))}
        if f"{k}.bias" in sd:
            p["b"] = sd[f"{k}.bias"]
        return p

    def lin(k):
        p = {"w": np.ascontiguousarray(sd[f"{k}.weight"].T)}
        if f"{k}.bias" in sd:
            p["b"] = sd[f"{k}.bias"]
        return p

    def bn(k):
        return {"g": sd[f"{k}.weight"], "b": sd[f"{k}.bias"],
                "mean": sd[f"{k}.running_mean"], "var": sd[f"{k}.running_var"]}

    def crb(k):
        return {"conv": conv(f"{k}.conv"), "bn": bn(f"{k}.bn")}

    def block(k):
        p = {
            "in_conv": crb(f"{k}.Conv1dReluBn1"),
            "res2": {
                "convs": [conv(f"{k}.Res2Conv1dReluBn.convs.{i}")
                          for i in range(cfg.scale - 1)],
                "bns": [bn(f"{k}.Res2Conv1dReluBn.bns.{i}")
                        for i in range(cfg.scale - 1)],
            },
            "out_conv": crb(f"{k}.Conv1dReluBn2"),
            "se": {"linear1": lin(f"{k}.SE_Connect.linear1"),
                   "linear2": lin(f"{k}.SE_Connect.linear2")},
        }
        if f"{k}.shortcut.weight" in sd:
            p["shortcut"] = conv(f"{k}.shortcut")
        return p

    params = {
        "feature_weight": sd["feature_weight"],
        "layer1": crb("layer1"),
        "layer2": block("layer2"),
        "layer3": block("layer3"),
        "layer4": block("layer4"),
        "conv": conv("conv"),
        "pooling": {"linear1": conv("pooling.linear1"),
                    "linear2": conv("pooling.linear2")},
        "bn": bn("bn"),
        "linear": lin("linear"),
    }
    # pooling convs are k=1: (1, in, out) -> linear layout (in, out)
    for k in ("linear1", "linear2"):
        p = params["pooling"][k]
        p["w"] = np.ascontiguousarray(np.asarray(p["w"])[0])
    return params


def load_wavlm_ecapa(ckpt_path: str, wavlm_path: Optional[str] = None,
                     cfg: ECAPAConfig = ECAPAConfig()):
    """Speaker embedder: gated transformers-WavLM frontend + native JAX head.

    reference: utils_eval.py:714-719 (ECAPA_TDNN_SMALL + wavlm_large_finetune).
    Returns path -> (emb_dim,) np.ndarray for scorers.score_sim.
    """
    import os

    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(
            f"ECAPA checkpoint not found at {ckpt_path} (offline build: supply "
            "wavlm_large_finetune.pth locally)")
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    raw = raw.get("model", raw)
    sd = {k: v.numpy().astype(np.float32) for k, v in raw.items()
          if hasattr(v, "numpy") and not k.startswith("feature_extract.")}
    params = jax.tree.map(jnp.asarray, ecapa_from_torch(sd, cfg))

    from transformers import WavLMModel

    frontend = WavLMModel.from_pretrained(wavlm_path or "microsoft/wavlm-large").eval()

    embed_jit = jax.jit(lambda fw, h: ecapa_embed(
        params, cfg, combine_hidden_states(fw, h)))

    def embed(path: str) -> np.ndarray:
        from f5e_tts_tpu.infer.audio import read_wav, resample

        wav, sr = read_wav(path)
        wav = resample(wav, sr, 16000)
        with torch.no_grad():
            out = frontend(torch.from_numpy(wav[None]).float(),
                           output_hidden_states=True)
        hidden = np.stack([h.numpy() for h in out.hidden_states], axis=0)
        return np.asarray(embed_jit(params["feature_weight"],
                                    jnp.asarray(hidden)))[0]

    return embed
