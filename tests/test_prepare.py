"""Dataset preparation pipeline tests."""

import json
import os

import numpy as np
import pytest

from f5e_tts_tpu.data import prepare as fprep
from f5e_tts_tpu.infer.audio import write_wav


def _mk_wavs(tmp_path, n=3, sr=8000):
    paths = []
    for i in range(n):
        wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr))).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, wav, sr)
        paths.append(p)
    return paths


def test_prepare_csv(tmp_path):
    paths = _mk_wavs(tmp_path)
    meta = tmp_path / "metadata.csv"
    meta.write_text("\n".join(f"{os.path.basename(p)}|hello world {i}"
                              for i, p in enumerate(paths)) + "\n")
    out = str(tmp_path / "out")
    stats = fprep.prepare(fprep.rows_from_csv(str(tmp_path)), out, tokenizer="char",
                          workers=1)
    assert stats["rows"] == 3
    assert os.path.exists(os.path.join(out, "raw.arrow"))
    dur = json.load(open(os.path.join(out, "duration.json")))
    assert len(dur["duration"]) == 3
    vocab = open(os.path.join(out, "vocab.txt")).read().splitlines()
    assert vocab[0] == " "  # space pinned at 0
    assert "h" in vocab

    # loadable by the dataset class
    from f5e_tts_tpu.config import MelConfig
    from f5e_tts_tpu.data.dataset import ArrowSpeechDataset

    ds = ArrowSpeechDataset.from_dir(out, MelConfig(target_sample_rate=8000, hop_length=64))
    assert len(ds) == 3
    item = ds[0]
    assert "audio" in item and item["audio"].ndim == 1


def test_duration_filter(tmp_path):
    sr = 8000
    short = (0.1 * np.ones(int(0.1 * sr))).astype(np.float32)  # 0.1s < 0.3s min
    p = str(tmp_path / "short.wav")
    write_wav(p, short, sr)
    out = str(tmp_path / "out2")
    stats = fprep.prepare([(p, "too short")], out, tokenizer="char", workers=1)
    assert stats["rows"] == 0


def test_rows_from_emilia(tmp_path):
    wavs = _mk_wavs(tmp_path, 2)
    manifest = tmp_path / "shard.jsonl"
    lines = [
        json.dumps({"wav": os.path.basename(wavs[0]), "text": "hello", "language": "EN"}),
        json.dumps({"wav": os.path.basename(wavs[1]), "text": "bonjour", "language": "FR"}),
    ]
    manifest.write_text("\n".join(lines) + "\n")
    rows = list(fprep.rows_from_emilia(str(tmp_path), languages=("EN",)))
    assert len(rows) == 1
    assert rows[0][1] == "hello"


def test_rows_from_wenetspeech(tmp_path):
    wavs = _mk_wavs(tmp_path, 2)
    for i, w in enumerate(wavs):
        open(w[:-4] + ".txt", "w").write(f"text {i}")
    rows = sorted(fprep.rows_from_wenetspeech4tts(str(tmp_path)))
    assert len(rows) == 2
    assert rows[0][1] == "text 0"
