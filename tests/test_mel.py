"""Golden tests for the mel frontend against torch.stft (the numeric oracle
for padding/window conventions) and analytic filterbank properties."""

import numpy as np
import pytest
import torch

from f5e_tts_tpu.config import MelConfig
from f5e_tts_tpu.ops import mel as fmel

pytestmark = pytest.mark.core


def _torch_stft_mag(wav, n_fft, hop, win_length, center, pad_mode="reflect"):
    w = torch.hann_window(win_length)
    spec = torch.stft(
        torch.from_numpy(wav),
        n_fft,
        hop_length=hop,
        win_length=win_length,
        window=w,
        center=center,
        pad_mode=pad_mode,
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.abs().numpy()  # (B, n_freqs, n_frames)


@pytest.mark.parametrize("center", [True, False])
def test_stft_matches_torch(rng, center):
    wav = rng.standard_normal((2, 24000), dtype=np.float32) * 0.3
    if not center:
        pad = (1024 - 256) // 2
        wav_in = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    else:
        wav_in = wav
    ours = np.asarray(fmel.stft_magnitude(wav_in, 1024, 256, 1024, center=center))
    theirs = _torch_stft_mag(wav_in, 1024, 256, 1024, center=center).transpose(0, 2, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_htk_filterbank_matches_formula():
    fb = fmel.mel_filterbank(24000, 1024, 100, scale="htk", norm=None)
    assert fb.shape == (513, 100)
    # every filter is a triangle: nonneg, unit-free peak <= 1 for htk no-norm
    assert fb.min() >= 0.0
    # columns sum > 0 (no empty filters at 24 kHz / 100 mels / 1024 fft)
    assert (fb.sum(axis=0) > 0).all()
    # peak position increases monotonically with mel index
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_slaney_filterbank_norm():
    fb = fmel.mel_filterbank(24000, 1024, 100, scale="slaney", norm="slaney")
    # slaney norm: area of each triangle ~ 2/(width) * width/2 * bin spacing
    # check against librosa-reference invariant: max weight < 0.06 for 24kHz/1024
    assert fb.shape == (513, 100)
    assert fb.min() >= 0.0
    assert 0 < fb.max() < 0.1


def test_vocos_mel_shape_and_range(rng):
    cfg = MelConfig()
    wav = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    mel = np.asarray(fmel.mel_spectrogram(wav, cfg))
    assert mel.shape == (1, 1 + 24000 // 256, 100)
    assert mel.min() >= np.log(1e-5) - 1e-6
    assert np.isfinite(mel).all()
    assert mel.shape[1] == fmel.num_frames(24000, cfg)


def test_bigvgan_mel_shape(rng):
    cfg = MelConfig(mel_spec_type="bigvgan")
    wav = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    mel = np.asarray(fmel.mel_spectrogram(wav, cfg))
    assert mel.shape == (1, fmel.num_frames(24000, cfg), 100)
    assert np.isfinite(mel).all()


def test_vocos_mel_matches_torch_pipeline(rng):
    """Full-path check: jax mel == torch.stft + our fb, clamp, log."""
    cfg = MelConfig()
    wav = (rng.standard_normal((2, 12000)) * 0.2).astype(np.float32)
    ours = np.asarray(fmel.mel_spectrogram(wav, cfg))

    mag = _torch_stft_mag(wav, cfg.n_fft, cfg.hop_length, cfg.win_length, center=True)
    fb = fmel.mel_filterbank(cfg.target_sample_rate, cfg.n_fft, cfg.n_mel_channels, scale="htk", norm=None)
    mel = np.einsum("bft,fm->btm", mag, fb)
    ref = np.log(np.clip(mel, 1e-5, None))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_istft_roundtrip(rng):
    """ISTFT(STFT(x)) == x for center=True (COLA holds for hann, 75% overlap)."""
    import jax.numpy as jnp

    n_fft, hop, win = 1024, 256, 1024
    wav = (rng.standard_normal((1, 8192)) * 0.5).astype(np.float32)
    w = torch.hann_window(win)
    spec = torch.stft(torch.from_numpy(wav), n_fft, hop, win, window=w, center=True,
                      return_complex=True)  # (B, F, T)
    sr = spec.real.numpy().transpose(0, 2, 1)
    si = spec.imag.numpy().transpose(0, 2, 1)
    y = np.asarray(fmel.istft(jnp.asarray(sr), jnp.asarray(si), n_fft, hop, win, center=True))
    assert y.shape[-1] == wav.shape[-1]
    np.testing.assert_allclose(y, wav, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch(rng):
    import jax.numpy as jnp

    n_fft, hop, win = 1024, 256, 1024
    f = n_fft // 2 + 1
    t = 20
    sr = rng.standard_normal((1, t, f)).astype(np.float32)
    si = rng.standard_normal((1, t, f)).astype(np.float32)
    ours = np.asarray(fmel.istft(jnp.asarray(sr), jnp.asarray(si), n_fft, hop, win, center=True))
    spec = torch.complex(torch.from_numpy(sr), torch.from_numpy(si)).transpose(1, 2)
    theirs = torch.istft(spec, n_fft, hop, win, window=torch.hann_window(win), center=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
