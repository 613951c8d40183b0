"""Vocos vocoder (mel -> waveform) as a fused XLA graph.

Architecture of `charactr/vocos-mel-24khz` (the reference's default vocoder,
loaded via the `vocos` pip package — reference: src/f5_tts/infer/
utils_infer.py:101-124): Conv1d embed (k7) -> LayerNorm -> 8x ConvNeXt-V1
blocks (dim 512, intermediate 1536, layer-scale) -> LayerNorm -> Linear head to
n_fft+2 -> exp-magnitude clip(1e2) + cos/sin phase -> ISTFT (center).

TPU notes: the whole decode is one jitted graph; the ISTFT overlap-add is the
scatter-free reshape formulation in ops/mel.py; everything rides MXU matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import mel as fmel
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops import convnext as fcnx


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    sample_rate: int = 24_000


def init_vocos(key, cfg: VocosConfig):
    ks = jax.random.split(key, cfg.num_layers + 2)
    params = {
        "embed": fnn.conv1d_init(ks[0], cfg.input_channels, cfg.dim, kernel=7),
        "norm": fnn.layernorm_init(cfg.dim),
        "blocks": [
            fcnx.convnext_v1_init(ks[i + 1], cfg.dim, cfg.intermediate_dim,
                                  layer_scale_init=1.0 / cfg.num_layers)
            for i in range(cfg.num_layers)
        ],
        "final_norm": fnn.layernorm_init(cfg.dim),
        "head": fnn.linear_init(ks[-1], cfg.dim, cfg.n_fft + 2),
    }
    return params


def istft_head(head_params, h: jnp.ndarray, n_fft: int, hop_length: int,
               compute_dtype=jnp.float32) -> jnp.ndarray:
    """Vocos ISTFT head: (B, N, dim) backbone features -> (B, wav) waveform.

    Linear to n_fft+2 channels, split into (log-mag, phase), exp-magnitude
    clipped at 1e2, cos/sin phase -> real/imag spectrum -> centered ISTFT.
    Math cross-validated against the reference's own conv-STFT export
    (reference: runtime/triton_trtllm/scripts/export_vocoder_to_onnx.py:45-60,
    conv_stft.py:194-232) in tests/test_oracle_crosscheck.py.
    """
    h = fnn.linear(head_params, h, compute_dtype)  # (B, N, n_fft + 2)
    half = n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(h[..., :half].astype(jnp.float32), max=1e2))
    phase = h[..., half:].astype(jnp.float32)
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    return fmel.istft(real, imag, n_fft, hop_length, n_fft, center=True)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def vocos_decode(params, cfg: VocosConfig, mel: jnp.ndarray,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, N, n_mels) log-mel -> (B, N*hop) waveform."""
    h = fnn.conv1d(params["embed"], mel.astype(compute_dtype), padding=3,
                   compute_dtype=compute_dtype)
    h = fnn.layernorm(params["norm"], h, eps=1e-6)
    for blk in params["blocks"]:
        h = fcnx.convnext_v1(blk, h, compute_dtype=compute_dtype)
    h = fnn.layernorm(params["final_norm"], h, eps=1e-6)
    return istft_head(params["head"], h, cfg.n_fft, cfg.hop_length, compute_dtype)


def vocos_from_torch(sd: Dict[str, np.ndarray], cfg: VocosConfig):
    """Map the vocos pip-package state dict to our pytree.

    Torch keys: backbone.embed, backbone.norm, backbone.convnext.{i}.*,
    backbone.final_layer_norm, head.out.
    """
    def lin(k):
        return {"w": sd[f"{k}.weight"].T, "b": sd[f"{k}.bias"]}

    def conv(k):
        return {"w": sd[f"{k}.weight"].transpose(2, 1, 0), "b": sd[f"{k}.bias"]}

    def ln(k):
        return {"g": sd[f"{k}.weight"], "b": sd[f"{k}.bias"]}

    params = {
        "embed": conv("backbone.embed"),
        "norm": ln("backbone.norm"),
        "blocks": [
            {
                "dwconv": conv(f"backbone.convnext.{i}.dwconv"),
                "norm": ln(f"backbone.convnext.{i}.norm"),
                "pwconv1": lin(f"backbone.convnext.{i}.pwconv1"),
                "pwconv2": lin(f"backbone.convnext.{i}.pwconv2"),
                "gamma": sd[f"backbone.convnext.{i}.gamma"],
            }
            for i in range(cfg.num_layers)
        ],
        "final_norm": ln("backbone.final_layer_norm"),
        "head": lin("head.out"),
    }
    return jax.tree.map(lambda a: np.asarray(a, np.float32), params)


def load_vocos(path: str, cfg: VocosConfig = VocosConfig()):
    """Load a vocos checkpoint (.bin/.pt torch or .safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu",
                                                  weights_only=True).items()}
    return vocos_from_torch(sd, cfg)
