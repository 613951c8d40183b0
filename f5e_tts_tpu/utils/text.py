"""Text pipeline: tokenizers, pinyin conversion, interspersing.

reference: src/f5_tts/model/utils.py:80-311 (tokenizers + pinyin converters)
and src/f5_tts/durpred/utils.py:10-16 (intersperse).

pypinyin/jieba are optional at runtime: English/char/byte paths work without
them; Chinese g2p raises a clear error if pypinyin is unavailable.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# vocab / tokenizers
# ---------------------------------------------------------------------------


def load_vocab_file(path: str) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    with open(path, "r", encoding="utf-8") as f:
        for i, line in enumerate(f):
            vocab[line[:-1]] = i
    return vocab


def g2p_mix_vocab() -> Dict[str, int]:
    """Phone inventory for the g2p-mix tokenizer (reference: utils.py:103-130).

    Order matters (ids are positional): pad, Mandarin initials/finals, English
    ARPAbet, punctuation, toned Mandarin finals, stressed English vowels, digits.
    """
    pad = "_"
    en_phones = [
        "AA", "AE", "AH", "AO", "AW", "AX", "AY", "B", "CH", "D", "DH", "EH", "ER",
        "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
        "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z", "ZH",
    ]
    zh_phones = [
        "a", "b", "c", "ch", "d", "e", "er", "f", "g", "h", "i", "j", "k", "l",
        "m", "n", "ng", "o", "p", "q", "r", "s", "sh", "t", "u", "v", "w", "x",
        "y", "z", "zh",
    ]
    punc = [",", ".", "?", "!", " ", "(", ")", ";", ":", "-", "'", '"',
            "，", "。", "、", "？", "！", "：", "；", "（", "）", "“", "”", "‘", "’", "—"]
    base = [pad] + zh_phones + en_phones + punc

    zh_finals = ["a", "e", "er", "i", "o", "u", "v", "ng", "n", "m"]
    zh_toned = [p + t for p in zh_finals for t in "012345"]
    en_vowels = ["AA", "AE", "AH", "AO", "AW", "AX", "AY", "EH", "ER", "EY",
                 "IH", "IY", "OW", "OY", "UH", "UW"]
    en_toned = [p + t for p in en_vowels for t in "012"]
    digits = list("0123456789")

    phones = base + zh_toned + en_toned + digits
    return {p: i for i, p in enumerate(phones)}


def get_tokenizer(dataset_name: str, tokenizer: str = "pinyin",
                  data_dir: Optional[str] = None) -> Tuple[Optional[Dict[str, int]], int]:
    """Resolve (vocab_char_map, vocab_size). reference: utils.py:136-170.

    - pinyin/char/char-level-pinyin/phone-level-pinyin: data/{name}_{tok}/vocab.txt
    - byte: utf-8, size 256, no map
    - custom: dataset_name IS the vocab path
    - g2p-mix: built-in phone inventory
    """
    if tokenizer in ("pinyin", "char", "char-level-pinyin", "phone-level-pinyin"):
        base = data_dir or os.path.join(os.getcwd(), "data")
        path = os.path.join(base, f"{dataset_name}_{tokenizer}", "vocab.txt")
        vocab = load_vocab_file(path)
        assert vocab.get(" ") == 0, "space must be idx 0 in vocab.txt (0 = unknown)"
        return vocab, len(vocab)
    if tokenizer == "byte":
        return None, 256
    if tokenizer == "custom":
        vocab = load_vocab_file(dataset_name)
        return vocab, len(vocab)
    if tokenizer == "g2p-mix":
        vocab = g2p_mix_vocab()
        return vocab, len(vocab)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def list_str_to_idx(texts: Sequence[Sequence[str]], vocab: Dict[str, int],
                    padding_value: int = -1) -> np.ndarray:
    """Char/phone sequences -> (B, NT) int array padded with -1
    (unknown chars -> 0, reference: utils.py:87-100)."""
    rows = [[vocab.get(c, 0) for c in t] for t in texts]
    nt = max((len(r) for r in rows), default=0)
    out = np.full((len(rows), nt), padding_value, np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def list_str_to_bytes(texts: Sequence[str], padding_value: int = -1) -> np.ndarray:
    """UTF-8 byte tokenizer (ByT5-style, reference: utils.py:80-83)."""
    rows = [list(bytes(t, "utf-8")) for t in texts]
    nt = max((len(r) for r in rows), default=0)
    out = np.full((len(rows), nt), padding_value, np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def split_rime(rime: str) -> List[str]:
    """Split a toned Mandarin rime to vocab granularity (reference:
    model/dataset.py:141-154). The tone digit rides with the final 'er'/'ng'
    (or the last single char); every preceding char is its own phone:
    'iang3' -> ['i', 'a', 'ng3'], 'er2' -> ['er2'], 'a1' -> ['a1']."""
    if not rime or not rime[-1].isdigit():
        raise ValueError(f"rime must end in a tone digit: {rime!r}")
    if len(rime) >= 3 and rime[-3:-1] in ("er", "ng"):
        last, rime = rime[-3:], rime[:-3]
    else:
        last, rime = rime[-2:], rime[:-2]
    return list(rime) + [last]


def g2p_mix_process_token(token) -> List[str]:
    """One g2p-mix token -> phone list at training granularity (reference:
    model/dataset.py:156-164): ZH finals are rime-split, NUM tokens become
    individual digits, everything else passes through."""
    phones = list(token.phones)
    if token.lang == "ZH":
        phones = phones[:-1] + split_rime(phones[-1])
    if token.lang == "NUM":
        phones = list(phones[0])
    return phones


_g2p_singleton = None


def g2p_mix_phonemize(texts: Sequence[str], *, split_rimes: bool,
                      g2p=None) -> List[List[str]]:
    """Phonemize with g2p_mix into per-sentence phone lists.

    split_rimes=True is the TRAIN-side convention (reference:
    model/dataset.py:166-181 — " n't" fixup, ZH rime splitting, NUM digit
    splitting); False is the eval/infer convention (utils_eval.py:135-137 —
    raw phones). Both insert " " before each non-SYM token after the first.

    ``g2p=`` injects a prebuilt phonemizer (tests pass a fixture); otherwise
    a module singleton is built, raising a loud ImportError when the
    ``g2p_mix`` package is absent.
    """
    if g2p is None:
        global _g2p_singleton
        if _g2p_singleton is None:
            try:
                from g2p_mix import G2pMix
            except ImportError as e:
                raise ImportError(
                    "tokenizer='g2p-mix' requires the g2p_mix package, which is "
                    "not installed — install g2p-mix or choose another tokenizer "
                    "(silent char fall-through would emit ids outside the phone "
                    "vocab)") from e
            _g2p_singleton = G2pMix()
        g2p = _g2p_singleton
    proc = g2p_mix_process_token if split_rimes else (lambda t: list(t.phones))
    out: List[List[str]] = []
    for text in texts:
        if split_rimes:
            # LibriTTS spaces out "n't"; g2p-mix expects it attached
            # (reference: dataset.py:176)
            text = text.replace(" n't", "n't")
        items = g2p.g2p(text)
        phones = proc(items[0]) if items else []
        for token in items[1:]:
            phones += proc(token) if token.lang == "SYM" else [" "] + proc(token)
        out.append(phones)
    return out


def intersperse(texts: Sequence[Sequence[str]], sep: str = "_") -> List[List[str]]:
    """[a, b] -> [_, a, _, b, _] per sentence (reference: durpred/utils.py:10-16)."""
    out = []
    for sent in texts:
        row = [sep] * (len(sent) * 2 + 1)
        row[1::2] = list(sent)
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# Chinese g2p (pinyin) — optional deps
# ---------------------------------------------------------------------------


_CUSTOM_TRANS = str.maketrans({";": ",", "“": '"', "”": '"', "‘": "'", "’": "'"})


def _is_chinese(c: str) -> bool:
    return "㄀" <= c <= "鿿"


def _require_g2p():
    try:
        import jieba  # noqa: F401
        from pypinyin import Style, lazy_pinyin  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "Chinese g2p requires jieba + pypinyin; install them or use the "
            "'char'/'byte' tokenizer for non-Chinese text") from e
    import jieba

    if not jieba.dt.initialized:
        jieba.default_logger.setLevel(50)
        jieba.initialize()


def convert_char_to_pinyin(text_list: Sequence[str], polyphone: bool = True) -> List[List[str]]:
    """Mixed zh/en text -> token lists; Chinese chars become TONE3 pinyin
    syllables with a leading space separator. reference: utils.py:270-311."""
    _require_g2p()
    import jieba
    from pypinyin import Style, lazy_pinyin

    final: List[List[str]] = []
    for text in text_list:
        chars: List[str] = []
        text = text.translate(_CUSTOM_TRANS)
        for seg in jieba.cut(text):
            seg_bytes = len(bytes(seg, "utf-8"))
            if seg_bytes == len(seg):  # pure ascii
                if chars and seg_bytes > 1 and chars[-1] not in " :'\"":
                    chars.append(" ")
                chars.extend(seg)
            elif polyphone and seg_bytes == 3 * len(seg):  # pure CJK
                pys = lazy_pinyin(seg, style=Style.TONE3, tone_sandhi=True)
                for i, c in enumerate(seg):
                    if _is_chinese(c):
                        chars.append(" ")
                    chars.append(pys[i])
            else:  # mixed
                for c in seg:
                    if ord(c) < 256:
                        chars.extend(c)
                    elif _is_chinese(c):
                        chars.append(" ")
                        chars.extend(lazy_pinyin(c, style=Style.TONE3, tone_sandhi=True))
                    else:
                        chars.append(c)
        final.append(chars)
    return final


_ONSETS = ["zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l", "g", "k",
           "h", "j", "q", "x", "r", "z", "c", "s", "y", "w"]
_CODAS = ["ng", "n"]
_MEDIALS = ["i", "u", "ü"]


def split_pinyin(pinyin: str) -> List[str]:
    """One syllable -> [onset?, medial?, rime, coda?] per Chinese phonology.

    reference: utils.py:174-211. Note the reference tries onsets/codas in its
    own list order (e.g. "n" before "ng" would mis-split); we check the
    longest first which matches its effective behavior ("ng" endswith check
    happens before "n"? — the reference list is ["n", "ng"], so "n" wins for
    "ang" -> coda "n"; we replicate that exact order).
    """
    onset = medial = coda = None
    for o in ["b", "p", "m", "f", "d", "t", "n", "l", "g", "k", "h", "j", "q",
              "x", "zh", "ch", "sh", "r", "z", "c", "s", "y", "w"]:
        if pinyin.startswith(o):
            onset = o
            pinyin = pinyin[len(o):]
            break
    for c in ["n", "ng"]:
        if pinyin.endswith(c):
            coda = c
            pinyin = pinyin[: -len(c)]
            break
    for m in _MEDIALS:
        if pinyin.startswith(m):
            medial = m
            pinyin = pinyin[len(m):]
            break
    rime = pinyin
    return [x for x in (onset, medial, rime, coda) if x]


def convert_char_to_finer_pinyin(text_list: Sequence[str], polyphone: bool = True) -> List[List[str]]:
    """Chinese syllables split into onset/medial/rime/coda parts with "_zh"
    suffix. reference: utils.py:217-264."""
    _require_g2p()
    import jieba
    from pypinyin import Style, lazy_pinyin

    final: List[List[str]] = []
    for text in text_list:
        chars: List[str] = []
        text = text.translate(_CUSTOM_TRANS)
        for seg in jieba.cut(text):
            seg_bytes = len(bytes(seg, "utf-8"))
            if seg_bytes == len(seg):
                if chars and seg_bytes > 1 and chars[-1] not in " :'\"":
                    chars.append(" ")
                chars.extend(seg)
            elif polyphone and seg_bytes == 3 * len(seg):
                pys = lazy_pinyin(seg, style=Style.TONE, tone_sandhi=True)
                for i, c in enumerate(seg):
                    if _is_chinese(c):
                        if chars and chars[-1] not in " :'\"":
                            chars.append(" ")
                        chars.extend(part + "_zh" for part in split_pinyin(pys[i]))
                    else:
                        chars.extend(list(pys[i]))
            else:
                for c in seg:
                    if ord(c) < 256:
                        chars.extend(c)
                    elif _is_chinese(c):
                        if chars and chars[-1] not in " :'\"":
                            chars.append(" ")
                        syllable = lazy_pinyin(c, style=Style.TONE, tone_sandhi=True)[0]
                        chars.extend(part + "_zh" for part in split_pinyin(syllable))
                    else:
                        chars.append(c)
        final.append(chars)
    return final


def repetition_found(text: str, length: int = 2, tolerance: int = 10) -> bool:
    """Dirty-data filter (reference: utils.py:317-325)."""
    from collections import defaultdict

    counts: Dict[str, int] = defaultdict(int)
    for i in range(len(text) - length + 1):
        counts[text[i : i + length]] += 1
    return any(c > tolerance for c in counts.values())
