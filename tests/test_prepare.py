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


def test_rows_from_emilia_v2(tmp_path):
    d = tmp_path / "Emilia-YODAS" / "EN" / "dir0"
    d.mkdir(parents=True)
    cases = [
        ("u0", {"text": "hello world", "language": "en", "duration": 2.5}, True),
        # junk charset -> dropped
        ("u1", {"text": "bad ا text", "language": "en", "duration": 1.0}, True),
        # zh halfwidth punctuation normalized
        ("u2", {"text": "你好,世界!", "language": "zh", "duration": 3.0}, True),
        # no audio file next to the json -> dropped
        ("u3", {"text": "orphan", "language": "en", "duration": 1.0}, False),
        # repetition (en length-4 filter) -> dropped
        ("u4", {"text": "abcd" * 20, "language": "en", "duration": 1.0}, True),
    ]
    for stem, obj, with_audio in cases:
        (d / f"{stem}.json").write_text(json.dumps(obj))
        if with_audio:
            (d / f"{stem}.mp3").write_bytes(b"\x00")

    rows = sorted(fprep.rows_from_emilia_v2(str(tmp_path)))
    texts = [t for _, t, _ in rows]
    assert texts == ["hello world", "你好，世界！"]
    assert all(len(r) == 3 for r in rows)  # duration from manifest
    assert {d for _, _, d in rows} == {2.5, 3.0}

    # manifest-duration rows skip audio decoding entirely in prepare()
    out = str(tmp_path / "out")
    stats = fprep.prepare(rows, out, tokenizer="char", workers=1)
    assert stats["rows"] == 2
    assert abs(stats["total_hours"] - 5.5 / 3600) < 1e-9


def test_filter_repetition_flag_reaches_workers(tmp_path):
    wavs = _mk_wavs(tmp_path, 1)
    rows = [(wavs[0], "ab" * 50)]  # length-2 repetition
    out1 = str(tmp_path / "keep")
    out2 = str(tmp_path / "drop")
    assert fprep.prepare(rows, out1, tokenizer="char", workers=1)["rows"] == 1
    assert fprep.prepare(rows, out2, tokenizer="char", workers=2,
                         filter_repetition=True)["rows"] == 0


def test_count_max_epoch_cli(capsys):
    import sys
    sys.path.insert(0, "scripts")
    try:
        from count_max_epoch import count_max_epoch
    finally:
        sys.path.pop(0)
    # reference constants (count_max_epoch.py): 95282h, 8 gpus, 38400 frames
    out = count_max_epoch(95282, 8, 38400, 1_200_000)
    assert out["mini_batch_frames"] == 307200
    assert out["updates_per_epoch"] == round(95282 / (307200 * 256 / 24000 / 3600))
    assert out["epochs"] == round(1_200_000 / (95282 / (307200 * 256 / 24000 / 3600)))


def test_rows_from_wenetspeech(tmp_path):
    wavs = _mk_wavs(tmp_path, 2)
    for i, w in enumerate(wavs):
        open(w[:-4] + ".txt", "w").write(f"text {i}")
    rows = sorted(fprep.rows_from_wenetspeech4tts(str(tmp_path)))
    assert len(rows) == 2
    assert rows[0][1] == "text 0"
