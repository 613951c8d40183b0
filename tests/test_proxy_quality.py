"""Quality-proxy harness unit tests (VERDICT r4 #2).

The toyspeech language must be perfectly decodable from GROUND-TRUTH mel —
otherwise TER measures the decoder, not the model. These tests lock that
invariant plus the metric definitions; the trained-model lever table comes
from scripts/quality_proxy.py.
"""

import numpy as np
import pytest

from f5e_tts_tpu.eval import proxy_quality as pq

pytestmark = pytest.mark.core


def test_decoder_roundtrip_groundtruth():
    """decode(mel(synth(tokens))) == tokens across speakers (TER = 0)."""
    rng = np.random.default_rng(3)
    for _ in range(8):
        text, spk, wav = pq.make_utterance(rng)
        mel = pq._mel(wav)
        hyp = pq.decode_mel(mel, len(text))
        assert hyp == text, (hyp, text, spk)


def test_decoder_speaker_extremes():
    """decoding is speaker-invariant at the f0/tilt range corners."""
    rng = np.random.default_rng(0)
    text = "ajbichdgef"
    for f0 in (100.0, 200.0):
        for tilt in (0.8, 1.2):
            wav = pq.synth_utterance(text, pq.Speaker(f0=f0, tilt=tilt), rng)
            assert pq.decode_mel(pq._mel(wav), len(text)) == text, (f0, tilt)


def test_utterance_duration_is_isochronous():
    rng = np.random.default_rng(1)
    text, spk, wav = pq.make_utterance(rng)
    assert len(wav) == len(text) * pq.SAMPLES_PER_TOKEN
    mel = pq._mel(wav)
    assert mel.shape[0] >= len(text) * pq.FRAMES_PER_TOKEN


def test_token_error_rate():
    assert pq.token_error_rate("abc", "abc") == 0.0
    assert pq.token_error_rate("abd", "abc") == pytest.approx(1 / 3)
    assert pq.token_error_rate("ab", "abc") == pytest.approx(1 / 3)   # deletion
    assert pq.token_error_rate("abxc", "abc") == pytest.approx(1 / 3)  # insertion
    assert pq.token_error_rate("", "abc") == 1.0


def test_mel_metrics_identity_and_order():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((40, 24)).astype(np.float32)
    m0 = pq.mel_metrics(a, a)
    assert m0["mel_mse"] == 0.0 and m0["mcd_db"] == 0.0 and m0["lsd"] == 0.0
    small = pq.mel_metrics(a + 0.01, a)
    big = pq.mel_metrics(a + 0.5, a)
    for k in ("mel_mse", "mcd_db", "lsd"):
        assert 0 < small[k] < big[k], k


def test_mcd_constant_offset_excluded():
    """MCD uses c1.. only — a constant log-mel offset (gain) is ignored."""
    rng = np.random.default_rng(4)
    a = rng.standard_normal((20, 24)).astype(np.float32)
    m = pq.mel_metrics(a + 1.0, a)
    assert m["mcd_db"] == pytest.approx(0.0, abs=1e-4)
    assert m["mel_mse"] == pytest.approx(1.0, rel=1e-5)


def test_dataset_rows_layout():
    rows = pq.make_dataset(5, seed=0)
    assert len(rows) == 5
    r = rows[0]
    assert r["audio"]["sampling_rate"] == pq.SR
    assert set(r["text"]) <= set(pq.TOKENS)
    ids = pq.tokenize([r["text"], "ab"])
    assert ids.shape[0] == 2 and ids[1][2] == -1  # pad -1
