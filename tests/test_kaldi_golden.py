"""ops/kaldi.py vs the from-source torchaudio.compliance.kaldi.fbank twin.

Closes the VERDICT r4 §2.2 'partial': the PPG frontend numerics
(reference src/f5_tts/ppg/wenet/dataset/feats.py:49-83) were previously only
checked against a from-spec numpy oracle that SHARED the window/mel-bank
helpers with the implementation. tests/oracle/kaldi_torchaudio_twin.py is an
independent torch re-derivation of the actual torchaudio algorithm (framing,
dc removal, replicate-pad preemphasis, povey window, pow2 zero-pad, Kaldi mel
banks, eps-floored log) sharing no code with ops/kaldi.py, so agreement here
is a genuine two-implementation golden. The banked-real-torchaudio golden
(tests/test_goldens.py::test_kaldi_fbank_golden) remains the final word if a
wheel ever lands.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from f5e_tts_tpu.ops import kaldi as fkaldi
from oracle import kaldi_torchaudio_twin as twin

pytestmark = pytest.mark.core


def _twin_fbank(wav: np.ndarray) -> np.ndarray:
    return twin.kaldi_fbank_frontend(torch.from_numpy(wav.astype(np.float32))).numpy()


def test_fbank_matches_twin_noise(rng):
    wav = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    ours = np.asarray(fkaldi.kaldi_fbank(jnp.asarray(wav)))
    ref = _twin_fbank(wav)
    assert ours.shape == ref.shape == (2, 98, 80)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_fbank_matches_twin_tones(rng):
    # pure tones plus a realistic -60 dB noise floor: without the floor,
    # spectral-leakage bins ~8 orders below the peak amplify f32 FFT
    # rounding differences (jnp vs torch rfft) into ~0.03 log-domain deltas
    t = np.arange(12345) / 16000
    wav = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3150 * t + 0.3)
        + 1e-3 * rng.standard_normal(len(t))
    ).astype(np.float32)
    ours = np.asarray(fkaldi.kaldi_fbank(jnp.asarray(wav[None])))[0]
    ref = _twin_fbank(wav[None])[0]
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_fbank_matches_twin_dc_and_silence(rng):
    """Exactly-constant frames: agreement in LINEAR mel domain only.

    torch materializes the DC-removed frame, so constant input cancels to
    exact zero and hits the eps log floor (-15.94). XLA fuses the dc-removal
    / preemphasis / rfft chain and recomputes the subtraction with
    reassociation, leaving |x|*2^-25-scale noise (~2e-4 at int16 scale,
    i.e. -135 dB) that the log floor then amplifies into visible log-domain
    deltas. Unreachable by real audio (see ops/kaldi.py docstring); in the
    linear domain the two agree to int16-scale epsilon.
    """
    wav = np.full((1, 8000), 0.25, np.float32)
    wav[:, 4000:] = 1e-9
    ours = np.asarray(fkaldi.kaldi_fbank(jnp.asarray(wav)))
    ref = _twin_fbank(wav)
    np.testing.assert_allclose(np.exp(ours), np.exp(ref), atol=1e-2, rtol=1e-4)
    # frames containing real signal (the step edge: frame 23 = samples
    # 3680-4080 is the first to cross the 4000 boundary) match in log domain
    np.testing.assert_allclose(ours[:, 23:28], ref[:, 23:28], atol=2e-3, rtol=1e-4)


def test_fbank_matches_twin_near_silence_noise(rng):
    # a real recording's noise floor (~-80 dBFS) stays in log-domain parity
    wav = (rng.standard_normal((1, 8000)) * 1e-4).astype(np.float32)
    ours = np.asarray(fkaldi.kaldi_fbank(jnp.asarray(wav)))
    ref = _twin_fbank(wav)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_window_matches_twin():
    np.testing.assert_allclose(
        fkaldi.povey_window(400), twin._feature_window_function(400).numpy(), atol=1e-6
    )


def test_mel_banks_match_twin():
    # ours builds the banks in float64 then casts; torchaudio builds in
    # float32 — agreement to f32 epsilon at weight scale (max ~1.4e-5)
    ours = fkaldi.kaldi_mel_banks(80, 512, 16000.0)
    ref = twin.get_mel_banks(80, 512, 16000.0).numpy()
    assert ours.shape == ref.shape == (80, 256)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_frame_count_odd_lengths():
    for t in (400, 401, 559, 560, 561, 16000):
        wav = np.zeros((1, t), np.float32)
        ours = np.asarray(fkaldi.kaldi_fbank(jnp.asarray(wav)))
        ref = _twin_fbank(wav)
        assert ours.shape == ref.shape, t
