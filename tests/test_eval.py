"""Eval harness tests: metainfo parsing, bucketing, WER core, SIM core, runner."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.eval import harness as fh
from f5e_tts_tpu.eval import scorers as fs
from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.infer.pipeline import TTSEngine
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.utils.text import list_str_to_idx

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)


def test_edit_distance_and_wer():
    assert fs.edit_distance("kitten", "sitting") == 3
    assert fs.wer(["a", "b", "c"], ["a", "b", "c"]) == 0.0
    assert fs.wer(["a", "b", "c"], ["a", "x", "c"]) == pytest.approx(1 / 3)
    assert fs.wer([], []) == 0.0


def test_number_to_words():
    # reference-exact conventions (utils_eval.py:566-603, oracle-parity-locked
    # in tests/test_wer_stack.py): "and" before sub-hundred remainders
    assert fs.number_to_words(0) == "zero"
    assert fs.number_to_words(21) == "twenty one"
    assert fs.number_to_words(105) == "one hundred and five"
    assert fs.number_to_words(1234) == "one thousand two hundred and thirty four"


def test_normalize_text():
    assert fs.normalize_text_en("Hello, World! 42") == ["hello", "world", "forty", "two"]
    assert fs.normalize_text_zh("你好，世界。") == ["你", "好", "世", "界"]


def test_score_wer_jsonl(tmp_path):
    path = str(tmp_path / "wer.jsonl")
    out = fs.score_wer([("u1", "hello world", "hello word"),
                        ("u2", "a b", "a b")], lang="en", results_path=path)
    assert 0 < out["wer"] < 1
    assert os.path.exists(path)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 3  # 2 utts + corpus line


def test_score_sim():
    embeds = {"a.wav": np.array([1.0, 0.0]), "b.wav": np.array([1.0, 0.1]),
              "c.wav": np.array([0.0, 1.0])}
    out = fs.score_sim([("u1", "a.wav", "b.wav"), ("u2", "a.wav", "c.wav")],
                       embed_fn=lambda p: embeds[p])
    assert out["n"] == 2
    assert 0.4 < out["sim"] < 0.6  # (0.995 + 0.0) / 2


def test_seedtts_metainfo(tmp_path):
    meta = tmp_path / "meta.lst"
    meta.write_text("utt1|prompt text|p1.wav|gt text\n"
                    "utt2|pt|/abs/p2.wav|gt|/abs/gt2.wav\n")
    info = fh.get_seedtts_metainfo(str(meta))
    assert len(info) == 2
    assert info[0][2] == str(tmp_path / "p1.wav")
    assert info[0][4] == str(tmp_path / "wavs" / "utt1.wav")
    assert info[1][2] == "/abs/p2.wav"


def test_shard_for_host():
    items = list(range(10))
    s0 = fh.shard_for_host(items, 0, 3)
    s1 = fh.shard_for_host(items, 1, 3)
    s2 = fh.shard_for_host(items, 2, 3)
    assert sorted(s0 + s1 + s2) == items


def _mk_testset(tmp_path, n=3):
    meta_lines = []
    os.makedirs(tmp_path / "wavs", exist_ok=True)
    for i in range(n):
        wav = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(28000) / 8000)).astype(np.float32)
        p = tmp_path / f"prompt{i}.wav"
        faudio.write_wav(str(p), wav, 8000)
        meta_lines.append(f"utt{i}|prompt text here|{p}|generated text longer than prompt")
    meta = tmp_path / "meta.lst"
    meta.write_text("\n".join(meta_lines) + "\n")
    return str(meta)


def test_inference_prompts_and_runner(tmp_path):
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz")}
    tokenize = lambda texts: list_str_to_idx([list(t) for t in texts], vocab)
    meta = _mk_testset(tmp_path)
    info = fh.get_seedtts_metainfo(meta)
    batches = fh.get_inference_prompts(info, tokenize, MEL, infer_batch_size=2,
                                       min_secs=0.5, max_secs=20, num_buckets=10)
    assert sum(len(b.utts) for b in batches) == 3

    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                     text_dim=16, conv_layers=0, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    engine = TTSEngine(params=params, state=state, arch=arch, vocab=vocab, mel=MEL,
                       cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2),
                       tokenizer="char",
                       vocoder_decode=lambda m: np.zeros((m.shape[0], m.shape[1] * 64),
                                                         np.float32),
                       compute_dtype=jnp.float32, buckets=(256, 512, 1024))
    out_dir = str(tmp_path / "gen")
    stats = fh.run_batch_inference(engine, batches, out_dir, nfe_steps=2, seed=1)
    assert stats["n_batches"] == len(batches)
    wavs = os.listdir(out_dir)
    assert len(wavs) == 3
    assert stats["rtf"] > 0
