"""Vendored pypinyin outputs for the parity-test corpus.

pypinyin is not installed in this environment, so `shims.install()` backs
`pypinyin.lazy_pinyin` with this table.  Entries were derived from
pypinyin's published TONE3 + tone_sandhi semantics (neutral tones carry no
digit; 3-3 sandhi applies within a jieba word, e.g. 你好 -> ni2 hao3).

Both the reference converter (/root/reference/src/f5_tts/model/utils.py:270-311)
and the framework converter (f5e_tts_tpu/utils/text.py) consume the SAME shim,
so converter-logic parity holds token-for-token regardless of this table;
absolute fidelity to real pypinyin matters only for the vendored values below.

Unknown segments raise KeyError so a test can never silently diverge.
"""

from __future__ import annotations

# jieba segment -> lazy_pinyin(seg, style=TONE3, tone_sandhi=True) output
TABLE = {
    "你好": ["ni2", "hao3"],
    "世界": ["shi4", "jie4"],
    "今天天气": ["jin1", "tian1", "tian1", "qi4"],
    "很": ["hen3"],
    "好": ["hao3"],
    "我": ["wo3"],
    "爱": ["ai4"],
    "语音": ["yu3", "yin1"],
    "合成": ["he2", "cheng2"],
    "这是": ["zhe4", "shi4"],
    "中文": ["zhong1", "wen2"],
    "测试": ["ce4", "shi4"],
    "技术": ["ji4", "shu4"],
    "他": ["ta1"],
    "说": ["shuo1"],
    "我们": ["wo3", "men"],
    "明天": ["ming2", "tian1"],
    "见": ["jian4"],
    # Non-hanzi east-asian-width segments pass through lazy_pinyin unchanged.
    "。": ["。"],
    ",": [","],
    ":": [":"],
    "!": ["!"],
    "、": ["、"],
}

# Per-character entries (the mixed-characters path converts one char at a
# time, reference utils.py:305).
_CHARS = {
    "你": ["ni3"],
    "世": ["shi4"],
    "界": ["jie4"],
    "今": ["jin1"],
    "天": ["tian1"],
    "气": ["qi4"],
    "语": ["yu3"],
    "音": ["yin1"],
    "合": ["he2"],
    "成": ["cheng2"],
    "这": ["zhe4"],
    "中": ["zhong1"],
    "文": ["wen2"],
    "测": ["ce4"],
    "试": ["shi4"],
    "技": ["ji4"],
    "术": ["shu4"],
    "们": ["men"],
    "明": ["ming2"],
}
for _k, _v in _CHARS.items():
    TABLE.setdefault(_k, _v)


# Style.TONE (diacritic marks) variants, used by the finer-pinyin converter
# (reference utils.py:242).  Same segments, tone digits -> tone marks.
TABLE_TONE = {
    "你好": ["ní", "hǎo"],
    "世界": ["shì", "jiè"],
    "今天天气": ["jīn", "tiān", "tiān", "qì"],
    "很": ["hěn"],
    "好": ["hǎo"],
    "我": ["wǒ"],
    "爱": ["ài"],
    "语音": ["yǔ", "yīn"],
    "合成": ["hé", "chéng"],
    "这是": ["zhè", "shì"],
    "中文": ["zhōng", "wén"],
    "测试": ["cè", "shì"],
    "技术": ["jì", "shù"],
    "他": ["tā"],
    "说": ["shuō"],
    "我们": ["wǒ", "men"],
    "明天": ["míng", "tiān"],
    "见": ["jiàn"],
    "。": ["。"],
    ",": [","],
    ":": [":"],
    "!": ["!"],
    "、": ["、"],
    "你": ["nǐ"],
    "世": ["shì"],
    "界": ["jiè"],
    "今": ["jīn"],
    "天": ["tiān"],
    "气": ["qì"],
    "语": ["yǔ"],
    "音": ["yīn"],
    "合": ["hé"],
    "成": ["chéng"],
    "这": ["zhè"],
    "中": ["zhōng"],
    "文": ["wén"],
    "测": ["cè"],
    "试": ["shì"],
    "技": ["jì"],
    "术": ["shù"],
    "们": ["men"],
    "明": ["míng"],
}


def lookup(seg, style="tone3"):
    table = TABLE_TONE if style == "tone" else TABLE
    if isinstance(seg, str):
        if seg in table:
            return list(table[seg])
        raise KeyError(
            f"pinyin fixture has no {style} entry for segment {seg!r}; "
            "add it to tests/oracle/pinyin_fixture.py"
        )
    # list of chars/strings
    out = []
    for s in seg:
        out.extend(lookup(s, style))
    return out
