"""BigVGAN v2 generator (mel -> waveform) in JAX.

The reference consumes BigVGAN as an external git submodule
(reference: .gitmodules:1-3, loaded at src/f5_tts/infer/utils_infer.py:125-139
for mel_spec_type="bigvgan"). This is a from-scratch JAX implementation of the
published BigVGAN v2 generator architecture
(`nvidia/bigvgan_v2_24khz_100band_256x`):

- conv_pre k7 -> 6 transposed-conv upsample stages (rates 4,4,2,2,2,2, kernel
  2*rate, channels halving from 1536) each followed by 3 AMP blocks
  (dilations 1,3,5 at kernels 3,7,11, averaged),
- snake-beta activations (per-channel log-scale alpha/beta) wrapped in
  anti-aliased 2x up/activation/2x down resampling (kaiser-windowed sinc),
- final anti-aliased activation + conv_post k7 (bias=False), clamp to [-1, 1]
  (v2 uses no tanh).

TPU notes: transposed convs run as zero-stuff + tap-unrolled conv (ops/nn.py);
the anti-alias filters are depthwise tap convs. Weight ingestion maps the
published torch checkpoint layout; numerical parity against real weights is
pending (weights not available offline).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import nn as fnn


@dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 100
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    sample_rate: int = 24_000


# ---------------------------------------------------------------------------
# snake-beta + anti-aliased resampling
# ---------------------------------------------------------------------------


def snake_beta(x: jnp.ndarray, log_alpha: jnp.ndarray, log_beta: jnp.ndarray) -> jnp.ndarray:
    """x + 1/beta * sin^2(alpha x), per-channel alpha/beta in log scale."""
    xf = x.astype(jnp.float32)
    alpha = jnp.exp(log_alpha.astype(jnp.float32))
    beta = jnp.exp(log_beta.astype(jnp.float32))
    out = xf + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(alpha * xf))
    return out.astype(x.dtype)


def kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass (BigVGAN alias_free_activation filter)."""
    even = kernel_size % 2 == 0
    half = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    if even:
        t = np.arange(-half, half) + 0.5
    else:
        t = np.arange(kernel_size) - half
    window = np.i0(beta * np.sqrt(np.maximum(1 - (t / half) ** 2, 0.0))) / np.i0(beta)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * t)
    f = f / np.sum(f)
    return f.astype(np.float32)


def _depthwise_filter(x: jnp.ndarray, filt: np.ndarray, stride: int = 1,
                      pad: Tuple[int, int] = (0, 0), up: int = 1) -> jnp.ndarray:
    """Apply a shared scalar FIR filter depthwise over (B, N, C)."""
    b, n, c = x.shape
    if up > 1:
        z = jnp.zeros((b, n, up - 1, c), x.dtype)
        x = jnp.concatenate([x[:, :, None, :], z], axis=2).reshape(b, n * up, c)
    x = jnp.pad(x, ((0, 0), pad, (0, 0)))
    k = len(filt)
    n_out = x.shape[1] - k + 1
    acc = jnp.zeros((b, n_out, c), jnp.float32)
    for i in range(k):
        acc = acc + x[:, i : i + n_out, :].astype(jnp.float32) * float(filt[i])
    if stride > 1:
        acc = acc[:, ::stride]
    return acc.astype(x.dtype)


def aa_activation(x: jnp.ndarray, log_alpha, log_beta,
                  up_filter: np.ndarray, down_filter: np.ndarray) -> jnp.ndarray:
    """Anti-aliased activation: 2x upsample -> snake-beta -> 2x downsample.

    BigVGAN's Activation1d with up_ratio=down_ratio=2, kernel 12.
    """
    k = len(up_filter)
    # UpSample1d: pad, zero-stuff x2, filter*2, trim
    pad = (k - 2) // 2  # up path padding on the stuffed signal
    h = _depthwise_filter(x, up_filter * 2.0, stride=1, pad=(pad, pad + 1), up=2)
    h = snake_beta(h, log_alpha, log_beta)
    # DownSample1d: lowpass then stride 2
    pad_d = (k - 2) // 2
    h = _depthwise_filter(h, down_filter, stride=2, pad=(pad_d, pad_d + 1))
    return h


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


def init_bigvgan(key, cfg: BigVGANConfig):
    keys = iter(jax.random.split(key, 512))
    ch0 = cfg.upsample_initial_channel
    params: Dict = {
        "conv_pre": fnn.conv1d_init(next(keys), cfg.num_mels, ch0, kernel=7),
        "ups": [],
        "resblocks": [],  # [stage][kernel_idx]
        "act_post": {},
        "conv_post": None,
    }
    ch = ch0
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        params["ups"].append(fnn.conv_transpose1d_init(next(keys), ch, ch // 2, k))
        ch //= 2
        stage = []
        for kr, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            block = {"convs1": [], "convs2": [], "acts1": [], "acts2": []}
            for d in dils:
                block["convs1"].append(fnn.conv1d_init(next(keys), ch, ch, kernel=kr))
                block["convs2"].append(fnn.conv1d_init(next(keys), ch, ch, kernel=kr))
                block["acts1"].append({"log_alpha": jnp.zeros((ch,)), "log_beta": jnp.zeros((ch,))})
                block["acts2"].append({"log_alpha": jnp.zeros((ch,)), "log_beta": jnp.zeros((ch,))})
            stage.append(block)
        params["resblocks"].append(stage)
    params["act_post"] = {"log_alpha": jnp.zeros((ch,)), "log_beta": jnp.zeros((ch,))}
    params["conv_post"] = fnn.conv1d_init(next(keys), ch, 1, kernel=7, bias=False)
    return params


def _amp_block(block, x, kernel: int, dilations, up_f, down_f, compute_dtype):
    """AMPBlock1: per dilation: aa-act -> dilated conv -> aa-act -> conv, residual."""
    for j, d in enumerate(dilations):
        h = aa_activation(x, block["acts1"][j]["log_alpha"], block["acts1"][j]["log_beta"],
                          up_f, down_f)
        h = fnn.conv1d(block["convs1"][j], h, padding=(kernel - 1) // 2 * d,
                       dilation=d, compute_dtype=compute_dtype)
        h = aa_activation(h, block["acts2"][j]["log_alpha"], block["acts2"][j]["log_beta"],
                          up_f, down_f)
        h = fnn.conv1d(block["convs2"][j], h, padding=(kernel - 1) // 2,
                       compute_dtype=compute_dtype)
        x = x + h
    return x


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def bigvgan_decode(params, cfg: BigVGANConfig, mel: jnp.ndarray,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, N, num_mels) log-mel (bigvgan flavor) -> (B, N * prod(rates)) waveform."""
    up_f = kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)
    down_f = kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)

    h = fnn.conv1d(params["conv_pre"], mel.astype(compute_dtype), padding=3,
                   compute_dtype=compute_dtype)
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        h = fnn.conv_transpose1d(params["ups"][i], h, stride=r, padding=(k - r) // 2,
                                 compute_dtype=compute_dtype)
        stage = params["resblocks"][i]
        acc = None
        for bi, (kr, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                            cfg.resblock_dilation_sizes)):
            out = _amp_block(stage[bi], h, kr, dils, up_f, down_f, compute_dtype)
            acc = out if acc is None else acc + out
        h = acc / len(cfg.resblock_kernel_sizes)
    h = aa_activation(h, params["act_post"]["log_alpha"], params["act_post"]["log_beta"],
                      up_f, down_f)
    h = fnn.conv1d(params["conv_post"], h, padding=3, compute_dtype=compute_dtype)
    return jnp.clip(h[..., 0].astype(jnp.float32), -1.0, 1.0)


def bigvgan_from_torch(sd: Dict[str, np.ndarray], cfg: BigVGANConfig):
    """Map the published BigVGAN generator state dict to our pytree.

    Torch keys: conv_pre, ups.{i}.0 (ConvTranspose1d), resblocks.{i*3+b}.convs1/
    convs2.{j} (weight-normed: weight_g/weight_v or plain weight),
    resblocks.*.activations... BigVGAN stores snake params as
    resblocks.{n}.activations.{m}.act.alpha/beta; conv_post.
    """
    def get_w(key):
        if f"{key}.weight" in sd:
            return sd[f"{key}.weight"]
        g = sd[f"{key}.weight_g"]
        v = sd[f"{key}.weight_v"]
        norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
        return g * v / np.maximum(norm, 1e-12)

    def conv(key):
        p = {"w": np.ascontiguousarray(get_w(key).transpose(2, 1, 0))}
        if f"{key}.bias" in sd:
            p["b"] = sd[f"{key}.bias"]
        return p

    def convT(key):
        w = get_w(key)  # torch ConvTranspose1d: (in, out, K)
        w = w[:, :, ::-1].transpose(2, 0, 1)  # flip K, -> (K, in, out)
        p = {"w": np.ascontiguousarray(w)}
        if f"{key}.bias" in sd:
            p["b"] = sd[f"{key}.bias"]
        return p

    n_stages = len(cfg.upsample_rates)
    n_blocks = len(cfg.resblock_kernel_sizes)
    params = {
        "conv_pre": conv("conv_pre"),
        "ups": [convT(f"ups.{i}.0") for i in range(n_stages)],
        "resblocks": [],
        "act_post": {"log_alpha": sd["activation_post.act.alpha"],
                     "log_beta": sd["activation_post.act.beta"]},
        "conv_post": conv("conv_post"),
    }
    for i in range(n_stages):
        stage = []
        for b in range(n_blocks):
            rb = f"resblocks.{i * n_blocks + b}"
            dils = cfg.resblock_dilation_sizes[b]
            block = {"convs1": [], "convs2": [], "acts1": [], "acts2": []}
            for j in range(len(dils)):
                block["convs1"].append(conv(f"{rb}.convs1.{j}"))
                block["convs2"].append(conv(f"{rb}.convs2.{j}"))
                # activations interleave: acts[2j] before convs1[j], acts[2j+1] before convs2[j]
                block["acts1"].append({"log_alpha": sd[f"{rb}.activations.{2*j}.act.alpha"],
                                       "log_beta": sd[f"{rb}.activations.{2*j}.act.beta"]})
                block["acts2"].append({"log_alpha": sd[f"{rb}.activations.{2*j+1}.act.alpha"],
                                       "log_beta": sd[f"{rb}.activations.{2*j+1}.act.beta"]})
            stage.append(block)
        params["resblocks"].append(stage)
    return jax.tree.map(lambda a: np.asarray(a, np.float32), params)
