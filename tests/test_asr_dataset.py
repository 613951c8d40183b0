"""ASR data pipeline (SURVEY §2.2 #25): raw/shard sources, processors,
batching, padding — wenet dataset/processor semantics."""

import json
import random
import tarfile

import numpy as np
import pytest

from f5e_tts_tpu.data import asr_dataset as ad

SYMS = {c: i + 3 for i, c in enumerate("abcdefgh ")}
SYMS["<unk>"] = 1


def _write_wav_corpus(tmp_path, n=4, sr=16000):
    from f5e_tts_tpu.infer.audio import write_wav

    lines = []
    for i in range(n):
        path = str(tmp_path / f"u{i}.wav")
        dur = 0.3 + 0.2 * i
        wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(int(sr * dur)) / sr)
               ).astype(np.float32)
        write_wav(path, wav, sr)
        lines.append(json.dumps({"key": f"u{i}", "wav": path,
                                 "txt": "abc def ga"[: 4 + i]}))
    lst = tmp_path / "data.list"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def test_parse_tokenize_filter(tmp_path):
    lst = _write_wav_corpus(tmp_path)
    data = ad.parse_raw(ad.read_lists(lst))
    data = list(ad.tokenize(data, SYMS))
    # txt for u0 is "abc " -> char tokenizer drops spaces
    assert data[0]["label"] == [SYMS[c] for c in "abc"]
    # unknown char -> <unk>
    one = list(ad.tokenize([dict(key="x", txt="aZ", wav=np.zeros(10),
                                 sample_rate=16000)], SYMS))[0]
    assert one["label"] == [SYMS["a"], SYMS["<unk>"]]

    # filters: too-short utterance dropped (min_length=10 -> 100ms)
    short = dict(key="s", wav=np.zeros(800, np.float32), sample_rate=16000,
                 label=[3, 4])
    assert list(ad.filter_samples([short])) == []
    ok = dict(key="o", wav=np.zeros(8000, np.float32), sample_rate=16000,
              label=[3, 4])
    assert len(list(ad.filter_samples([ok]))) == 1
    # token/frames ratio bound
    many = dict(ok, label=[3] * 60)  # 60 tokens / 50 frames > 1
    assert list(ad.filter_samples([many])) == []


def test_shard_mode_tar(tmp_path):
    import wave as wavmod

    sr = 16000
    tar_path = tmp_path / "shard0.tar"
    with tarfile.open(tar_path, "w") as tf:
        for i in range(2):
            wav_path = tmp_path / f"s{i}.wav"
            with wavmod.open(str(wav_path), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes((np.zeros(sr // 2)).astype(np.int16).tobytes())
            txt_path = tmp_path / f"s{i}.txt"
            txt_path.write_text(f"ab c{i}")
            tf.add(wav_path, arcname=f"s{i}.wav")
            tf.add(txt_path, arcname=f"s{i}.txt")
    lst = tmp_path / "shards.list"
    lst.write_text(f"{tar_path}\n")
    out = list(ad.tar_shards(ad.read_lists(str(lst))))
    assert len(out) == 2
    assert out[0]["sample_rate"] == sr
    assert out[0]["txt"].startswith("ab")


def test_fbank_spec_aug_and_perturb():
    sr = 16000
    wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    sample = dict(key="k", wav=wav, sample_rate=sr, label=[3, 4])
    feat = list(ad.compute_fbank([sample]))[0]["feat"]
    assert feat.shape[1] == 80
    assert 95 <= feat.shape[0] <= 100  # ~1s at 10ms hop
    assert np.isfinite(feat).all()

    rng = random.Random(0)
    auged = list(ad.spec_aug([dict(key="k", label=[3], feat=feat)], rng=rng))[0]
    assert (auged["feat"] == 0).sum() > (feat == 0).sum()  # masks applied
    assert auged["feat"].shape == feat.shape

    sp = list(ad.speed_perturb([sample], speeds=[0.9], rng=random.Random(0)))[0]
    assert abs(len(sp["wav"]) - int(len(wav) / 0.9)) <= 2


def test_batching_and_padding():
    feats = [np.ones((n, 4), np.float32) * i for i, n in enumerate([30, 10, 20, 40, 5])]
    data = [dict(key=f"k{i}", label=[3] * (i + 1), feat=f)
            for i, f in enumerate(feats)]
    # static
    batches = list(ad.batch(iter(data), "static", batch_size=2))
    assert [len(b) for b in batches] == [2, 2, 1]
    # dynamic: budget of 60 padded frames
    batches = list(ad.batch(iter(data), "dynamic", max_frames_in_batch=60))
    for b in batches:
        longest = max(s["feat"].shape[0] for s in b)
        assert longest * len(b) <= 60 or len(b) == 1
    # padding: desc order, len_multiple rounding, label pad -1
    padded = list(ad.padding(ad.batch(iter(data), "static", 5), len_multiple=16))[0]
    assert padded["feats"].shape == (5, 48, 4)  # max 40 -> 48
    assert list(padded["feat_lens"]) == [40, 30, 20, 10, 5]
    assert padded["labels"].shape[0] == 5
    assert (padded["labels"][0] != -1).sum() == 4  # key k3 has 4 tokens


def test_full_pipeline(tmp_path):
    lst = _write_wav_corpus(tmp_path, n=5)
    batches = list(ad.asr_data_pipeline(
        lst, SYMS, training=True,
        conf={"batch": {"type": "static", "size": 2}, "len_multiple": 8,
              "speed_perturb": True}))
    assert sum(b["feats"].shape[0] for b in batches) == 5
    for b in batches:
        assert b["feats"].shape[1] % 8 == 0
        assert np.isfinite(b["feats"]).all()
        assert (b["labels"] >= -1).all()
        # lengths sorted descending within each batch (processor.py:691-707)
        assert list(b["feat_lens"]) == sorted(b["feat_lens"], reverse=True)
