"""Ports of the reference's OWN second statements of core numerics.

The reference repo contains, inside its TensorRT-LLM runtime, independent
re-implementations of the math that tests/oracle/shims.py re-implements from
external-package semantics (x_transformers RoPE, torchaudio MelSpectrogram's
STFT, vocos' ISTFT head).  Porting that in-repo math to numpy/torch gives a
*reference-authored* cross-check of the shims: if a shim misread the external
package, it would now disagree with the reference's own TRT runtime.

Sources (all under /root/reference/src/f5_tts/runtime/triton_trtllm/):
- model_repo_f5_tts/f5_tts/1/f5_tts_trtllm.py:101-112   precompute_freqs_cis
  (abs sinusoidal text pos-emb table, cat[cos|sin])
- f5_tts_trtllm.py:209-216   rope cos/sin tables (repeat_interleave pairs)
- f5_tts_trtllm.py:218-221   sway timestep schedule + delta_t (NFE table)
- f5_tts_trtllm.py:222-231   sinusoidal time embedding table (scale 1000,
  cat[sin|cos])
- patch/f5tts/modules.py:201-247   rotate_every_two_3dim /
  apply_rotary_pos_emb_3dim (interleaved-pair rotation in TRT DSL)
- scripts/conv_stft.py:53-248   conv-kernel STFT/ISTFT (hann, center pad,
  COLA envelope normalization)
- scripts/export_vocoder_to_onnx.py:45-60   ISTFTHead (exp-mag clip 1e2,
  cos/sin phase -> inverse STFT)

Test-only machinery; nothing here runs in the framework.
"""

from __future__ import annotations

import math

import numpy as np
import torch


# ---------------------------------------------------------------------------
# RoPE — f5_tts_trtllm.py:209-216 + patch/f5tts/modules.py:201-247
# ---------------------------------------------------------------------------


def rope_tables(head_dim: int, max_len: int, theta: float = 10000.0,
                base_rescale_factor: float = 1.0,
                interpolation_factor: float = 1.0):
    """(cos, sin) tables of shape (max_len, head_dim), interleave-duplicated.

    f5_tts_trtllm.py:209-216: base rescale, inv_freq over even indices, outer
    product with positions, then repeat_interleave(2, dim=-1).
    """
    base = theta * base_rescale_factor ** (head_dim / (head_dim - 2))
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = np.outer(np.arange(max_len, dtype=np.float64), inv_freq) / interpolation_factor
    freqs = np.repeat(freqs, 2, axis=-1)  # (max_len, head_dim)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def rotate_every_two(x: np.ndarray) -> np.ndarray:
    """(..., d) -> interleave(-odd, even): patch/f5tts/modules.py:201-227.

    The TRT DSL slices stride-2 (x1=even lanes, x2=odd lanes), negates x2,
    and re-interleaves as (-x2, x1).
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return np.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary_trt(x: np.ndarray, cos: np.ndarray, sin: np.ndarray) -> np.ndarray:
    """patch/f5tts/modules.py:230-247: rotate the first rot_dim features of x,
    pass the rest through unrotated."""
    rot_dim = cos.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    out = x_rot * cos + rotate_every_two(x_rot) * sin
    return np.concatenate([out, x_pass], axis=-1)


# ---------------------------------------------------------------------------
# Sway schedule + time embedding — f5_tts_trtllm.py:218-231
# ---------------------------------------------------------------------------


def sway_time(nfe_steps: int, sway_coef: float = -1.0):
    """(time_step (nfe+1,), delta_t (nfe,)): f5_tts_trtllm.py:218-221.
    float32 throughout, as the TRT runtime computes it."""
    t = np.linspace(0.0, 1.0, nfe_steps + 1, dtype=np.float32)
    time_step = t + np.float32(sway_coef) * (np.cos(np.float32(np.pi) * np.float32(0.5) * t) - 1 + t)
    return time_step, np.diff(time_step)


def time_expand(nfe_steps: int, dim: int = 256, sway_coef: float = -1.0) -> np.ndarray:
    """(nfe, dim) sinusoidal embedding of the sway timesteps, [sin | cos]
    halves, scale 1000: f5_tts_trtllm.py:222-231 (float32, as the TRT
    runtime computes it)."""
    time_step, _ = sway_time(nfe_steps, sway_coef)
    half = dim // 2
    emb_factor = math.log(10000) / (half - 1)
    emb_factor = np.float32(1000.0) * np.exp(np.arange(half, dtype=np.float32) * np.float32(-emb_factor))
    out = np.zeros((nfe_steps, dim), np.float32)
    for i in range(nfe_steps):
        emb = time_step[i] * emb_factor
        out[i] = np.concatenate([np.sin(emb), np.cos(emb)])
    return out


def freqs_cis_cat(dim: int, end: int, theta: float = 10000.0,
                  theta_rescale_factor: float = 1.0) -> np.ndarray:
    """Abs sinusoidal pos table (end, dim) = cat[cos | sin] over dim/2 freqs,
    added to text embeddings: f5_tts_trtllm.py:101-112 (+ usage :38,:48)."""
    theta *= theta_rescale_factor ** (dim / (dim - 2))
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    angles = np.outer(np.arange(end, dtype=np.float64), freqs)
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# Conv-kernel STFT / ISTFT — scripts/conv_stft.py:53-248 ('continue' mode,
# hann window, pad_center, win_sqrt=False; the configuration the vocoder
# export uses: export_vocoder_to_onnx.py:46-49 STFT(fft_len=n_fft,
# win_hop=hop, win_len=n_fft)).
# ---------------------------------------------------------------------------


class ConvSTFT:
    def __init__(self, win_len=1024, win_hop=256, fft_len=1024):
        from scipy.signal import get_window

        assert fft_len >= win_len
        self.win_hop = win_hop
        self.fft_len = fft_len
        self.pad_amount = fft_len // 2

        # fft kernel: real DFT of the identity, real|imag stacked along
        # columns (conv_stft.py:116-124); inverse kernel is its pseudoinverse.
        eye = torch.eye(fft_len, dtype=torch.float64)
        spec = torch.fft.rfft(eye, dim=-1)
        fft_kernel = torch.cat([spec.real, spec.imag], dim=1)  # (N, 2F)
        ifft_kernel = torch.linalg.pinv(fft_kernel)  # (2F, N)

        window = torch.from_numpy(get_window("hann", win_len).astype(np.float64))
        left = (fft_len - win_len) // 2
        window = torch.nn.functional.pad(window, (left, fft_len - win_len - left))
        self.window = window
        self.win_sq = window**2  # 'padded_window' for the OLA envelope

        self.fft_k = (fft_kernel.T * window).float()  # (2F, N)
        self.ifft_k = (ifft_kernel * window).float()  # (2F, N)

    def transform(self, wav: torch.Tensor):
        """(B, T) -> (real, imag) each (B, F, n_frames)."""
        x = torch.nn.functional.pad(
            wav[:, None, :], (self.pad_amount, self.pad_amount), mode="reflect")[:, 0]
        frames = x.unfold(-1, self.fft_len, self.win_hop)  # (B, n_frames, N)
        spec = frames @ self.fft_k.T  # (B, n_frames, 2F)
        spec = spec.transpose(1, 2)
        f = self.fft_len // 2 + 1
        return spec[:, :f], spec[:, f:]

    def inverse(self, real: torch.Tensor, imag: torch.Tensor) -> torch.Tensor:
        """(B, F, n_frames) real/imag -> (B, n_frames*hop) waveform
        (conv_stft.py:194-232: transposed-conv OLA, window-square envelope
        normalized where > 1e-8, pad_amount trimmed)."""
        inputs = torch.cat([real, imag], dim=1)  # (B, 2F, n_frames)
        out = torch.nn.functional.conv_transpose1d(
            inputs, self.ifft_k[:, None, :], stride=self.win_hop)[:, 0]
        n_frames = real.shape[-1]
        env = torch.nn.functional.conv_transpose1d(
            self.win_sq.float()[None, :, None].repeat(1, 1, n_frames),
            torch.eye(self.fft_len)[:, None, :], stride=self.win_hop)[0, 0]
        num_samples = n_frames * self.win_hop
        out = out[:, self.pad_amount : self.pad_amount + num_samples]
        env = env[self.pad_amount : self.pad_amount + num_samples]
        mask = env > 1e-8
        out[:, mask] = out[:, mask] / env[mask]
        return out


def istft_head(out_weight: np.ndarray, out_bias: np.ndarray, h: torch.Tensor,
               n_fft: int, hop_length: int) -> torch.Tensor:
    """Vocos ISTFT head per export_vocoder_to_onnx.py:45-60: linear to
    n_fft+2, chunk into (log-mag, phase), exp-clip mag at 1e2, cos/sin to
    real/imag, conv-STFT inverse. h: (B, N, dim) backbone output."""
    x = h @ torch.from_numpy(out_weight).T + torch.from_numpy(out_bias)
    x = x.transpose(1, 2)  # (B, n_fft+2, N)
    mag, p = x.chunk(2, dim=1)
    mag = torch.clip(torch.exp(mag), max=1e2)
    real = mag * torch.cos(p)
    imag = mag * torch.sin(p)
    return ConvSTFT(win_len=n_fft, win_hop=hop_length, fft_len=n_fft).inverse(real, imag)
