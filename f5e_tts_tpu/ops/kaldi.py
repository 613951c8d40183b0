"""Kaldi-compatible log-mel filterbank frontend (16 kHz, 25 ms / 10 ms).

Implements the exact torchaudio.compliance.kaldi.fbank semantics the PPG
frontend uses (reference: src/f5_tts/ppg/wenet/dataset/feats.py:49-83 —
kaldiFbank: wav * (1<<15), num_mel_bins=80, frame 25 ms / shift 10 ms,
dither=0, energy_floor=0, sample_frequency=16000), i.e. Kaldi defaults:
snip_edges, remove-DC per frame, preemphasis 0.97, povey window,
FFT padded to 512, power spectrum, Kaldi-style mel banks (1127*ln(1+f/700),
low 20 Hz .. Nyquist), log with float-eps floor.

Parity is asserted two ways: a straight-line numpy twin sharing these
helpers (tests/test_conformer.py) and an INDEPENDENT from-source torch
re-derivation of the torchaudio algorithm (tests/oracle/
kaldi_torchaudio_twin.py, golden-tested in tests/test_kaldi_golden.py).
A banked real-torchaudio golden (tests/test_goldens.py) activates if a
wheel ever lands.

Known eps-level deviation vs torch: XLA fuses the dc-removal/preemphasis/
rfft chain and recomputes the mean subtraction with reassociation, so an
EXACTLY-constant frame leaves |x|*2^-25-scale residue (~-135 dBFS) instead
of cancelling to exact zero and hitting the log floor. Unreachable by real
audio (any noise floor sits far above it); linear-domain agreement is at
int16-scale epsilon (see test_fbank_matches_twin_dc_and_silence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1.1920928955078125e-07  # float32 machine eps (Kaldi's log floor)


def povey_window(n: int) -> np.ndarray:
    """Kaldi 'povey' window: hann(sym, N-1 denominator) ** 0.85."""
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))
    return (hann**0.85).astype(np.float32)


def kaldi_mel_banks(num_bins: int, padded_window_size: int, sample_freq: float,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi triangular mel banks, shape (num_bins, padded_window_size // 2).

    Triangles are linear in MEL space (unlike librosa/torchaudio-HTK banks
    which are linear in Hz). The Nyquist bin is excluded (torchaudio pads a
    zero column).
    """
    if high_freq <= 0.0:
        high_freq = sample_freq / 2.0 + high_freq
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    mel_low = mel(low_freq)
    mel_high = mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins, dtype=np.float64)[:, None]
    left = mel_low + bins * mel_delta
    center = left + mel_delta
    right = center + mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)[None, :]
    m = mel(freqs)
    up = (m - left) / (center - left)
    down = (right - m) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _fbank_impl(wav, sample_rate, frame_length, frame_shift, num_mel_bins, n_fft):
    win_size = int(sample_rate * frame_length / 1000)  # 400
    hop = int(sample_rate * frame_shift / 1000)  # 160
    t = wav.shape[-1]
    n_frames = 1 + (t - win_size) // hop  # snip_edges

    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_size)[None, :]
    frames = wav[..., idx].astype(jnp.float32)  # (B, M, win)

    # remove DC per frame
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis 0.97 (first sample uses itself as predecessor)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(povey_window(win_size))

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, M, n_fft//2+1)
    power = power[..., : n_fft // 2]  # drop the Nyquist bin (zero weight)

    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, n_fft, float(sample_rate)))
    mel = jnp.matmul(power, banks.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, _EPS))


def kaldi_fbank(wav: jnp.ndarray, sample_rate: int = 16_000, frame_length: int = 25,
                frame_shift: int = 10, num_mel_bins: int = 80) -> jnp.ndarray:
    """(B, T) float waveform in [-1, 1] -> (B, M, num_mel_bins) log-mel.

    Applies the (1 << 15) int16-scale the reference frontend uses
    (feats.py:63) before Kaldi processing.
    """
    if wav.ndim == 1:
        wav = wav[None]
    win_size = int(sample_rate * frame_length / 1000)
    n_fft = 1 << (win_size - 1).bit_length()  # round up to power of two (512)
    return _fbank_impl(wav * 32768.0, sample_rate, frame_length, frame_shift,
                       num_mel_bins, n_fft)


def kaldi_fbank_numpy(wav: np.ndarray, sample_rate: int = 16_000, frame_length: int = 25,
                      frame_shift: int = 10, num_mel_bins: int = 80) -> np.ndarray:
    """Independent straight-line numpy implementation (test oracle)."""
    wav = np.asarray(wav, np.float64) * 32768.0
    win_size = int(sample_rate * frame_length / 1000)
    hop = int(sample_rate * frame_shift / 1000)
    n_fft = 1 << (win_size - 1).bit_length()
    n_frames = 1 + (len(wav) - win_size) // hop
    win = povey_window(win_size).astype(np.float64)
    banks = kaldi_mel_banks(num_mel_bins, n_fft, float(sample_rate)).astype(np.float64)
    out = np.zeros((n_frames, num_mel_bins))
    for m in range(n_frames):
        fr = wav[m * hop : m * hop + win_size].copy()
        fr -= fr.mean()
        fr = np.concatenate([[fr[0] - 0.97 * fr[0]], fr[1:] - 0.97 * fr[:-1]])
        fr = fr * win
        spec = np.fft.rfft(fr, n=n_fft)
        power = (spec.real**2 + spec.imag**2)[: n_fft // 2]
        out[m] = np.log(np.maximum(banks @ power, _EPS))
    return out.astype(np.float32)
