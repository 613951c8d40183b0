"""Tokenizer / text pipeline tests."""

import numpy as np
import pytest

from f5e_tts_tpu.utils import text as ftext


def test_g2p_mix_vocab():
    vocab = ftext.g2p_mix_vocab()
    assert vocab["_"] == 0
    # deterministic size: 1 + 31 + 40 + 26 + 60 + 48 + 10
    assert len(vocab) == 216
    assert "zh" in vocab and "AA" in vocab and "a1" in vocab and "AA1" in vocab


def test_list_str_to_idx():
    vocab = {" ": 0, "a": 1, "b": 2}
    ids = ftext.list_str_to_idx([["a", "b"], ["b"]], vocab)
    assert ids.tolist() == [[1, 2], [2, -1]]
    # unknown -> 0
    ids = ftext.list_str_to_idx([["z"]], vocab)
    assert ids.tolist() == [[0]]


def test_list_str_to_bytes():
    ids = ftext.list_str_to_bytes(["ab", "c"])
    assert ids.tolist() == [[97, 98], [99, -1]]


def test_intersperse():
    out = ftext.intersperse([["a", "b"]])
    assert out == [["_", "a", "_", "b", "_"]]
    assert ftext.intersperse([[]]) == [["_"]]


def test_split_pinyin():
    assert ftext.split_pinyin("chuan") == ["ch", "u", "a", "n"]
    assert ftext.split_pinyin("an") == ["a", "n"]
    assert ftext.split_pinyin("e") == ["e"]
    # reference quirk: coda list tries "n" before "ng", so "ang" -> a + n? No:
    # endswith("n") matches "ang"[-1] -> coda "n", rime "a"+"g"? No — "ang"
    # endswith "n" is False ("g"); endswith "ng" handled second.
    assert ftext.split_pinyin("ang") == ["a", "ng"]
    assert ftext.split_pinyin("zhong") == ["zh", "o", "ng"]


def test_repetition_found():
    assert ftext.repetition_found("ababababababababababababab", length=2, tolerance=10)
    assert not ftext.repetition_found("abcdefgh", length=2, tolerance=10)


def test_byte_tokenizer_registry():
    vocab, size = ftext.get_tokenizer("unused", "byte")
    assert vocab is None and size == 256


def test_g2p_mix_registry():
    vocab, size = ftext.get_tokenizer("unused", "g2p-mix")
    assert size == len(vocab) == 216


def test_pinyin_conversion_if_available():
    pytest.importorskip("pypinyin")
    out = ftext.convert_char_to_pinyin(["hello 世界"])
    assert isinstance(out[0], list)
