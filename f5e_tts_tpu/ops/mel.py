"""Log-mel spectrogram frontend and (I)STFT, as jittable XLA graphs.

Two flavors, numerically matching the reference's two vocoder frontends
(reference: src/f5_tts/model/modules.py:30-101):

- "vocos":   torchaudio.transforms.MelSpectrogram semantics — power=1 magnitude,
  center=True reflect padding, periodic Hann, HTK mel scale, no filterbank norm,
  then clamp(min=1e-5).log().
- "bigvgan": manual STFT — reflect pad by (n_fft-hop)//2, center=False,
  sqrt(|S|^2 + 1e-9), librosa Slaney mel filterbank (slaney norm),
  clamp(min=1e-5).log().

The STFT is expressed as frame-gather + rFFT so XLA lowers it to its native FFT;
the mel projection is a single (n_freqs x n_mels) matmul that rides the MXU.
Filterbanks are precomputed host-side in float64 numpy and embedded as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.config import MelConfig


# ---------------------------------------------------------------------------
# Mel filterbanks (host-side, float64, returned as float32)
# ---------------------------------------------------------------------------


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "htk",
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels).

    scale="htk", norm=None reproduces torchaudio.functional.melscale_fbanks
    defaults (used by the reference's vocos frontend); scale="slaney",
    norm="slaney" reproduces librosa.filters.mel defaults (bigvgan frontend,
    reference: src/f5_tts/model/modules.py:44-46).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs, dtype=np.float64)

    hz_to_mel = _hz_to_mel_htk if scale == "htk" else _hz_to_mel_slaney
    mel_to_hz = _mel_to_hz_htk if scale == "htk" else _mel_to_hz_slaney

    m_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    f_pts = mel_to_hz(m_pts)  # (n_mels + 2,)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default, sym=False)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length) via gather. Static shapes."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft_magnitude(
    wav: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
    magnitude_eps: float = 0.0,
) -> jnp.ndarray:
    """|STFT| of (B, T) waveform -> (B, n_frames, n_fft//2+1).

    center=True matches torch.stft center semantics: pad n_fft//2 both sides,
    n_frames = 1 + T//hop. The window (length win_length) is zero-padded to
    n_fft centered, as torch does.
    """
    win = hann_window(win_length)
    if win_length < n_fft:
        pad_l = (n_fft - win_length) // 2
        win = np.pad(win, (pad_l, n_fft - win_length - pad_l))
    win = jnp.asarray(win)

    if center:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(n_fft // 2, n_fft // 2)], mode=pad_mode)
    frames = _frame(wav, n_fft, hop_length)  # (B, n_frames, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32) * win, n=n_fft, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if magnitude_eps:
        return jnp.sqrt(mag2 + magnitude_eps)
    return jnp.sqrt(jnp.maximum(mag2, 1e-30))


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (B, n_frames, frame_len) -> (B, (n_frames-1)*hop + frame_len).

    Scatter-free: when frame_len = m*hop, the OLA is the sum of m shifted
    reshapes — each sub-chunk stream j contributes a contiguous signal offset
    by j*hop. Falls back to a padded variant when not divisible.
    """
    b, n_frames, frame_len = frames.shape
    m = -(-frame_len // hop)  # ceil
    pad = m * hop - frame_len
    if pad:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    out_len = (n_frames - 1) * hop + m * hop
    chunks = frames.reshape(b, n_frames, m, hop)
    out = jnp.zeros((b, out_len), frames.dtype)
    for j in range(m):
        stream = chunks[:, :, j, :].reshape(b, n_frames * hop)
        out = out.at[:, j * hop : j * hop + n_frames * hop].add(stream)
    true_len = (n_frames - 1) * hop + frame_len
    return out[:, :true_len]


def _overlap_add_np(frames: np.ndarray, hop: int) -> np.ndarray:
    """numpy overlap-add of (n_frames, frame_len) -> ((n_frames-1)*hop + frame_len,)."""
    n_frames, frame_len = frames.shape
    out = np.zeros((n_frames - 1) * hop + frame_len, np.float64)
    for i in range(n_frames):
        out[i * hop : i * hop + frame_len] += frames[i]
    return out


def istft(
    spec_real: jnp.ndarray,
    spec_imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with Hann window, matching torch.istft semantics.

    Inputs are (B, n_frames, n_fft//2+1) real/imag parts. Output (B, T) with
    T = n_frames*hop - n_fft when center=True (both n_fft//2 edges trimmed),
    normalized by the summed squared window envelope.
    Used by the Vocos ISTFT head (reference: runtime conv_stft.py semantics).
    """
    win_np = hann_window(win_length)
    if win_length < n_fft:
        pad_l = (n_fft - win_length) // 2
        win_np = np.pad(win_np, (pad_l, n_fft - win_length - pad_l))
    win = jnp.asarray(win_np)

    frames = jnp.fft.irfft(jax.lax.complex(spec_real, spec_imag), n=n_fft, axis=-1)
    frames = frames * win
    y = overlap_add(frames, hop_length)

    n_frames = spec_real.shape[1]
    # window-square envelope — pure numpy (this function may be traced, so the
    # constant path must not touch jnp)
    env = _overlap_add_np((win_np**2)[None, :].repeat(n_frames, axis=0), hop_length)
    env = np.where(env > 1e-11, env, 1.0).astype(np.float32)
    y = y / jnp.asarray(env)

    if center:
        half = n_fft // 2
        y = y[:, half:-half]
    return y


# ---------------------------------------------------------------------------
# Mel spectrogram flavors
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _vocos_mel(wav, n_fft, hop_length, win_length, n_mels, sr):
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, scale="htk", norm=None))
    mag = stft_magnitude(wav, n_fft, hop_length, win_length, center=True, pad_mode="reflect")
    # full fp32 precision: XLA's default matmul precision is reduced, which
    # costs ~0.6% rel error — unacceptable for a frontend feeding WER parity
    mel = jnp.matmul(mag, fb, precision=jax.lax.Precision.HIGHEST)  # (B, n_frames, n_mels)
    return jnp.log(jnp.clip(mel, min=1e-5))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _bigvgan_mel(wav, n_fft, hop_length, win_length, n_mels, sr):
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, scale="slaney", norm="slaney"))
    pad = (n_fft - hop_length) // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    mag = stft_magnitude(wav, n_fft, hop_length, win_length, center=False, magnitude_eps=1e-9)
    mel = jnp.matmul(mag, fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(wav: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """(B, T) float waveform -> (B, n_frames, n_mels) log-mel, frames-first layout.

    NOTE: the reference returns channels-first (B, n_mels, n_frames) and then
    permutes to (B, n, d) at every call site (e.g. src/f5_tts/model/cfm.py:499-500);
    we keep feature-last throughout.
    """
    if wav.ndim == 1:
        wav = wav[None, :]
    fn = _vocos_mel if cfg.mel_spec_type == "vocos" else _bigvgan_mel
    return fn(wav, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.n_mel_channels, cfg.target_sample_rate)


def num_frames(num_samples: int, cfg: MelConfig) -> int:
    """Number of mel frames the frontend produces for a waveform length."""
    if cfg.mel_spec_type == "vocos":
        return 1 + num_samples // cfg.hop_length
    pad = (cfg.n_fft - cfg.hop_length) // 2
    return 1 + (num_samples + 2 * pad - cfg.n_fft) // cfg.hop_length
