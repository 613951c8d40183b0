"""Scoring CLI glue tests (external models mocked/gated)."""

import json
import os

import numpy as np
import pytest

from f5e_tts_tpu.eval import score_cli
from f5e_tts_tpu.infer.audio import write_wav
from f5e_tts_tpu.infer.pipeline import CachedTranscriber


def test_pairs_from_meta(tmp_path):
    gen = tmp_path / "gen"
    gen.mkdir()
    for utt in ("u1", "u2"):
        write_wav(str(gen / f"{utt}.wav"), np.zeros(100, np.float32), 8000)
    meta = tmp_path / "meta.lst"
    meta.write_text("u1|ptext|p1.wav|gtext one\nu2|ptext|p2.wav|gtext two\n"
                    "u3|ptext|p3.wav|missing gen\n")
    pairs = score_cli._pairs_from_meta(str(meta), str(gen), "wer")
    assert len(pairs) == 2
    assert pairs[0] == ("u1", "gtext one", str(gen / "u1.wav"))
    sim_pairs = score_cli._pairs_from_meta(str(meta), str(gen), "sim")
    assert sim_pairs[0][1].endswith("u1.wav")
    assert sim_pairs[0][2].endswith("p1.wav")


def test_gated_loaders_raise(tmp_path):
    from f5e_tts_tpu.eval import scorers as fs

    with pytest.raises(FileNotFoundError):
        fs.load_whisper_asr(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        fs.load_utmos(str(tmp_path / "nope.pt"))
    with pytest.raises(FileNotFoundError):
        score_cli._load_speaker_embedder(str(tmp_path / "nope.pt"))


def test_cached_transcriber():
    calls = []

    def fake_asr(wav, sr):
        calls.append(1)
        return f"text {len(wav)}"

    t = CachedTranscriber(fake_asr)
    wav = np.ones(100, np.float32)
    assert t(wav, 8000) == "text 100"
    assert t(wav, 8000) == "text 100"
    assert len(calls) == 1  # cache hit
    assert t(np.ones(200, np.float32), 8000) == "text 200"
    assert len(calls) == 2
