"""WER scoring stack (VERDICT #3): reference-exact normalization pipelines,
jiwer-equivalent measures, parallel scoring, zh/en backends.

Where the reference function is importable offline (number_to_words,
replace_mixed_numbers, replace_special via tests/oracle), parity is against
the ACTUAL reference code; the inline normalization blocks of
run_asr_wer/run_asr_wer_whisper_large_v3 are locked by traced expectations.
"""

import json
import string

import numpy as np
import pytest

from f5e_tts_tpu.eval import scorers as fs

from tests.oracle import loader


@pytest.fixture(scope="module")
def ue():
    return loader.load().utils_eval


# ---------------------------------------------------------------------------
# oracle parity of the normalization helpers
# ---------------------------------------------------------------------------

def test_number_to_words_matches_reference(ue):
    cases = list(range(0, 310)) + [999, 1000, 1001, 1005, 1100, 1234, 9999,
                                   10000, 100000, 123456, 999999, 1000000,
                                   1000001, 1234567, 90000017, 999999999]
    for n in cases:
        assert fs.number_to_words(n) == ue.number_to_words(n), n


def test_replace_mixed_numbers_matches_reference(ue):
    cases = [
        "abc123def 45",
        "no digits at all",
        "42",
        "version 2 point 0 build 1987",
        "x1y2z3",
        "  spaced   7  out ",
        "1000000 dollars and 99 cents",
    ]
    for c in cases:
        assert fs.replace_mixed_numbers(c) == ue.replace_mixed_numbers(c), c


def test_replace_special_matches_reference(ue):
    cases = [
        "the $5 supercomputer on the 18th",
        "born on the 19th of may",
        "plain text",
        "$100 $200",
        "a supercomputer supercomputer",
    ]
    for c in cases:
        assert fs.replace_special(c) == ue.replace_special(c), c


# ---------------------------------------------------------------------------
# normalization pipelines (traced expectations of the inline reference code)
# ---------------------------------------------------------------------------

def test_normalize_seedtts_en():
    t, h = fs.normalize_seedtts("Hello, World! It's fine.", "hello world its FINE", "en")
    assert t == "hello world its fine"
    assert h == "hello world its fine"
    assert fs.jiwer_wer(t, h) == 0.0


def test_normalize_seedtts_zh():
    # zh punctuation (zhon.hanzi) must be stripped too, then char-split
    t, h = fs.normalize_seedtts("你好,世界。", "你好世界", "zh")
    assert t == "你 好 世 界"
    assert h == "你 好 世 界"
    assert fs.jiwer_wer(t, h) == 0.0


def test_normalize_whisper_v3_en():
    # digits verbalized + special fixes on the HYPOTHESIS only
    t, h = fs.normalize_whisper_v3("one hundred and five cats", "105 cats", "en")
    assert t == "one hundred and five cats"
    assert h == "one hundred and five cats"
    assert fs.jiwer_wer(t, h) == 0.0

    # truth keeps its digits (reference only converts hypo)
    t, h = fs.normalize_whisper_v3("105 cats", "105 cats", "en")
    assert t == "105 cats"
    assert h == "one hundred and five cats"
    assert fs.jiwer_wer(t, h) > 0


def test_jiwer_equivalents():
    assert fs.jiwer_wer("a b c", "a b c") == 0.0
    assert fs.jiwer_wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert fs.jiwer_wer("a  b   c ", "a b c") == 0.0  # multiple-space collapse
    assert fs.jiwer_cer("abc", "axc") == pytest.approx(1 / 3)
    assert fs.jiwer_cer(" abc ", "abc") == 0.0  # strip


# ---------------------------------------------------------------------------
# runner + parallel scoring + jsonl contract
# ---------------------------------------------------------------------------

def _stub_transcriber(rank, lang):
    # picklable factory: "transcribes" by decoding the path stem
    def transcribe(path):
        stem = path.rsplit("/", 1)[-1].split(".")[0]
        return stem.replace("_", " ")
    return transcribe


def test_run_asr_wer_pairs_modes(tmp_path):
    test_set = [
        (str(tmp_path / "hello_world.wav"), "", "hello world"),
        (str(tmp_path / "good_morning.wav"), "", "good evening"),
    ]
    rows = fs.run_asr_wer_pairs(test_set, _stub_transcriber(0, "en"),
                                lang="en", mode="whisper_v3")
    assert rows[0]["wer"] == 0.0 and "cer" in rows[0]
    assert rows[1]["wer"] == pytest.approx(0.5)
    rows_s = fs.run_asr_wer_pairs(test_set, _stub_transcriber(0, "en"),
                                  lang="en", mode="seedtts")
    assert "cer" not in rows_s[0]
    assert rows_s[0]["wav"] == "hello_world"
    assert rows_s[0]["truth"] == "hello world"  # raw text kept in the row


def test_parallel_scoring_matches_serial(tmp_path):
    test_set = [(str(tmp_path / f"w{i}_x.wav"), "", f"w{i} x") for i in range(7)]
    serial = fs.run_asr_wer_parallel(test_set, _stub_transcriber, lang="en",
                                     mode="whisper_v3", n_jobs=1)
    par = fs.run_asr_wer_parallel(test_set, _stub_transcriber, lang="en",
                                  mode="whisper_v3", n_jobs=3)
    assert [r["wav"] for r in par] == [r["wav"] for r in serial]
    assert [r["wer"] for r in par] == [r["wer"] for r in serial]


def test_split_test_set_reference_semantics():
    splits = fs.split_test_set(list(range(10)), 3)
    # wav_per_job = 10 // 3 + 1 = 4 -> [4, 4, 2] contiguous
    assert [s for _r, s in splits] == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert [r for r, _s in splits] == [0, 1, 2]


def test_write_results_jsonl_mean_of_per_utt(tmp_path):
    rows = [{"wav": "a", "wer": 0.5}, {"wav": "b", "wer": 0.0}]
    path = str(tmp_path / "_wer_results.jsonl")
    mean = fs.write_results_jsonl(rows, "wer", path)
    assert mean == 0.25  # mean of per-utterance rates, not corpus-pooled
    lines = open(path).read().strip().split("\n")
    assert json.loads(lines[0])["wav"] == "a"
    assert lines[-1] == "WER: 0.25"


# ---------------------------------------------------------------------------
# backends are gated with actionable errors when packages are missing
# ---------------------------------------------------------------------------

def test_backends_gated():
    with pytest.raises(RuntimeError, match="funasr"):
        fs.load_asr_backend("zh")
    with pytest.raises(RuntimeError, match="faster.whisper|faster_whisper"):
        fs.load_asr_backend("en")
    with pytest.raises(ValueError, match="unknown ASR backend"):
        fs.load_asr_backend("en", backend="bogus")


def test_score_cli_wer_with_stub_backend(tmp_path, monkeypatch):
    """score_cli wer end-to-end over a seedtts-layout metalst with a stub
    ASR backend and 2 workers."""
    from f5e_tts_tpu.eval import score_cli

    gen = tmp_path / "gen"
    gen.mkdir()
    meta = tmp_path / "meta.lst"
    rows = []
    for i, text in enumerate(["hello world", "good morning"]):
        utt = f"utt{i}"
        (gen / f"{utt}.wav").write_bytes(b"")
        rows.append(f"{utt}|prompt text|p{i}.wav|{text}|g{i}.wav")
    meta.write_text("\n".join(rows) + "\n")

    def fake_backend(lang, backend=None, ckpt_dir="", device="cpu"):
        def transcribe(path):
            stem = path.rsplit("/", 1)[-1].split(".")[0]
            return {"utt0": "hello world", "utt1": "good evening"}[stem]
        return transcribe

    monkeypatch.setattr(fs, "load_asr_backend", fake_backend)
    out = score_cli.main(["wer", "--gen_dir", str(gen), "--metalst", str(meta),
                          "--lang", "en", "--workers", "1"])
    assert out["n"] == 2
    assert out["wer"] == pytest.approx(0.25)
    assert (gen / "_wer_results.jsonl").exists()
