"""Torch twin of the Vocos backbone + the reference's conv-STFT head.

The `vocos` pip package is absent offline, so the ConvNeXt backbone here is a
from-spec twin (charactr/vocos-mel-24khz architecture: Conv1d k7 embed ->
LayerNorm -> N ConvNeXt-V1 blocks with layer scale -> LayerNorm), but the
ISTFT *head* — where all the tricky signal math lives — is the
reference-authored export math (tests/oracle/trt_math.istft_head, ported from
runtime/triton_trtllm/scripts/{export_vocoder_to_onnx,conv_stft}.py).

Used by scripts/parity_check.py stage 3 to turn the vocoder check from
finiteness-only into a numeric max|err|.
"""

from __future__ import annotations

import numpy as np
import torch

from . import trt_math


def backbone_forward(sd: dict, mel: torch.Tensor, num_layers: int) -> torch.Tensor:
    """(B, N, n_mels) -> (B, N, dim) using pip-vocos state-dict keys."""

    def t(k):
        return torch.from_numpy(np.ascontiguousarray(sd[k])).float()

    x = mel.transpose(1, 2)  # (B, C, N)
    x = torch.nn.functional.conv1d(x, t("backbone.embed.weight"),
                                   t("backbone.embed.bias"), padding=3)
    x = x.transpose(1, 2)
    x = torch.nn.functional.layer_norm(
        x, (x.shape[-1],), t("backbone.norm.weight"), t("backbone.norm.bias"), eps=1e-6)
    for i in range(num_layers):
        p = f"backbone.convnext.{i}"
        res = x
        h = torch.nn.functional.conv1d(
            x.transpose(1, 2), t(f"{p}.dwconv.weight"), t(f"{p}.dwconv.bias"),
            padding=3, groups=x.shape[-1]).transpose(1, 2)
        h = torch.nn.functional.layer_norm(
            h, (h.shape[-1],), t(f"{p}.norm.weight"), t(f"{p}.norm.bias"), eps=1e-6)
        h = h @ t(f"{p}.pwconv1.weight").T + t(f"{p}.pwconv1.bias")
        h = torch.nn.functional.gelu(h)
        h = h @ t(f"{p}.pwconv2.weight").T + t(f"{p}.pwconv2.bias")
        h = h * t(f"{p}.gamma")
        x = res + h
    x = torch.nn.functional.layer_norm(
        x, (x.shape[-1],),
        t("backbone.final_layer_norm.weight"), t("backbone.final_layer_norm.bias"),
        eps=1e-6)
    return x


def decode(sd: dict, mel: np.ndarray, num_layers: int, n_fft: int,
           hop_length: int) -> np.ndarray:
    """Full vocos decode: builder backbone twin + reference-authored head.
    mel: (B, N, n_mels) float32. Returns (B, N*hop) waveform."""
    with torch.no_grad():
        h = backbone_forward(sd, torch.from_numpy(mel).float(), num_layers)
        wav = trt_math.istft_head(
            np.asarray(sd["head.out.weight"], np.float32),
            np.asarray(sd["head.out.bias"], np.float32),
            h, n_fft, hop_length)
    return wav.numpy()
