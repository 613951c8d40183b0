"""Objective scorers: WER (ASR + jiwer-style edit distance), SIM (speaker
cosine), UTMOS hooks.

reference: src/f5_tts/eval/utils_eval.py:400-753 + eval_seedtts_testset.py +
eval_utmos.py. The external scoring models (Whisper-large-v3, Paraformer,
WavLM-ECAPA, UTMOS) require downloaded weights; loading is gated with clear
errors in this offline build, while the text normalization, edit-distance, and
result-aggregation machinery (the actual harness logic) is implemented and
tested here.
"""

from __future__ import annotations

import json
import os
import re
import string
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# edit distance / WER (jiwer-equivalent core)
# ---------------------------------------------------------------------------


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance over token sequences."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def wer(ref_words: Sequence[str], hyp_words: Sequence[str]) -> float:
    """Word error rate = edit distance / reference length."""
    if len(ref_words) == 0:
        return 0.0 if len(hyp_words) == 0 else 1.0
    return edit_distance(ref_words, hyp_words) / len(ref_words)


_PUNC_TABLE = str.maketrans("", "", string.punctuation + "。，、？！：；“”‘’（）—")

_NUM_WORDS = {
    0: "zero", 1: "one", 2: "two", 3: "three", 4: "four", 5: "five", 6: "six",
    7: "seven", 8: "eight", 9: "nine", 10: "ten", 11: "eleven", 12: "twelve",
    13: "thirteen", 14: "fourteen", 15: "fifteen", 16: "sixteen", 17: "seventeen",
    18: "eighteen", 19: "nineteen", 20: "twenty", 30: "thirty", 40: "forty",
    50: "fifty", 60: "sixty", 70: "seventy", 80: "eighty", 90: "ninety",
}


def number_to_words(n: int) -> str:
    """Small-number verbalization (reference normalizes digits before WER,
    utils_eval.py:566-627)."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n in _NUM_WORDS:
        return _NUM_WORDS[n]
    if n < 100:
        return _NUM_WORDS[n // 10 * 10] + " " + _NUM_WORDS[n % 10]
    if n < 1000:
        rest = n % 100
        head = _NUM_WORDS[n // 100] + " hundred"
        return head if rest == 0 else head + " " + number_to_words(rest)
    for unit, name in ((10**9, "billion"), (10**6, "million"), (10**3, "thousand")):
        if n >= unit:
            head = number_to_words(n // unit) + " " + name
            rest = n % unit
            return head if rest == 0 else head + " " + number_to_words(rest)
    return str(n)


def normalize_text_en(text: str) -> List[str]:
    """Lowercase, strip punctuation, verbalize digits -> word list."""
    text = text.lower()
    text = re.sub(r"\d+", lambda m: " " + number_to_words(int(m.group())) + " ", text)
    text = text.translate(_PUNC_TABLE)
    return text.split()


def normalize_text_zh(text: str) -> List[str]:
    """Character-level tokens for CER."""
    text = text.translate(_PUNC_TABLE).replace(" ", "")
    return list(text)


def score_wer(
    pairs: Sequence[Tuple[str, str, str]],  # (utt, ref_text, hyp_text)
    lang: str = "en",
    results_path: Optional[str] = None,
) -> Dict[str, float]:
    """Compute corpus WER/CER + per-utt jsonl (eval_seedtts_testset.py:76-85)."""
    norm = normalize_text_en if lang == "en" else normalize_text_zh
    rows = []
    total_err, total_ref = 0, 0
    for utt, ref, hyp in pairs:
        r, h = norm(ref), norm(hyp)
        e = edit_distance(r, h)
        total_err += e
        total_ref += max(len(r), 1)
        rows.append({"utt": utt, "wer": e / max(len(r), 1),
                     "ref": " ".join(r), "hyp": " ".join(h)})
    mean = total_err / max(total_ref, 1)
    if results_path:
        with open(results_path, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
            f.write(json.dumps({"corpus_wer": mean}) + "\n")
    return {"wer": mean, "n": len(rows)}


# ---------------------------------------------------------------------------
# SIM (speaker cosine similarity)
# ---------------------------------------------------------------------------


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = a / (np.linalg.norm(a) + 1e-8)
    b = b / (np.linalg.norm(b) + 1e-8)
    return float(np.dot(a, b))


def score_sim(
    pairs: Sequence[Tuple[str, str, str]],  # (utt, gen_wav_path, prompt_wav_path)
    embed_fn: Callable[[str], np.ndarray],
    results_path: Optional[str] = None,
) -> Dict[str, float]:
    """Mean speaker cosine similarity gen vs prompt (utils_eval.py:714-753).

    embed_fn: path -> speaker embedding (plug a WavLM-ECAPA model here).
    """
    rows, sims = [], []
    for utt, gen_path, prompt_path in pairs:
        s = cosine_similarity(embed_fn(gen_path), embed_fn(prompt_path))
        sims.append(s)
        rows.append({"utt": utt, "sim": s})
    mean = float(np.mean(sims)) if sims else 0.0
    if results_path:
        with open(results_path, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
            f.write(json.dumps({"mean_sim": mean}) + "\n")
    return {"sim": mean, "n": len(sims)}


# ---------------------------------------------------------------------------
# external model loaders (gated — weights must be local)
# ---------------------------------------------------------------------------


def load_whisper_asr(model_path: str, lang: str = "en") -> Callable[[str], str]:
    """HF Whisper transcription fn (reference uses whisper-large-v3 via
    transformers pipeline, utils_eval.py:472-488). Needs local weights."""
    try:
        from transformers import pipeline
    except ImportError as e:
        raise RuntimeError("transformers unavailable for ASR scoring") from e
    if not os.path.exists(model_path):
        raise FileNotFoundError(
            f"ASR weights not found at {model_path}; download whisper-large-v3 "
            "locally to score WER (offline build, no auto-download)")
    asr = pipeline("automatic-speech-recognition", model=model_path, device=-1)

    def transcribe(path: str) -> str:
        return asr(path, generate_kwargs={"language": lang})["text"]

    return transcribe


def load_wavlm_xvector(model_path: str) -> Callable[[str], np.ndarray]:
    """Speaker embedder via transformers WavLMForXVector (local weights).

    The reference uses WavLM-large + a custom ECAPA-TDNN head
    (eval/ecapa_tdnn.py + utils_eval.py:714-719); for the exact reference head
    use eval/ecapa.py:load_wavlm_ecapa (native JAX ECAPA over the ingested
    wavlm_large_finetune.pth, parity-tested) — plug either into score_sim's
    embed_fn. This loader is the packaged-head alternative.
    """
    if not os.path.exists(model_path):
        raise FileNotFoundError(
            f"WavLM x-vector weights not found at {model_path} (offline build)")
    import torch
    from transformers import WavLMForXVector

    model = WavLMForXVector.from_pretrained(model_path).eval()

    def embed(path: str) -> np.ndarray:
        from f5e_tts_tpu.infer.audio import read_wav, resample

        wav, sr = read_wav(path)
        wav = resample(wav, sr, 16_000)
        with torch.no_grad():
            out = model(input_values=torch.from_numpy(wav[None]))
        return out.embeddings[0].numpy()

    return embed


def load_utmos(model_path: str) -> Callable[[str], float]:
    """UTMOS strong scorer (reference loads tarepan/SpeechMOS via torch.hub,
    eval_utmos.py:10-42). Needs a local scripted checkpoint."""
    if not os.path.exists(model_path):
        raise FileNotFoundError(
            f"UTMOS weights not found at {model_path} (offline build)")
    import torch

    model = torch.jit.load(model_path).eval()

    def score(path: str) -> float:
        from f5e_tts_tpu.infer.audio import read_wav

        wav, sr = read_wav(path)
        with torch.no_grad():
            return float(model(torch.from_numpy(wav[None]), sr))

    return score


def score_utmos(wav_paths: Sequence[str], utmos_fn: Callable[[str], float],
                results_path: Optional[str] = None) -> Dict[str, float]:
    rows = [{"wav": os.path.basename(p), "utmos": utmos_fn(p)} for p in wav_paths]
    mean = float(np.mean([r["utmos"] for r in rows])) if rows else 0.0
    if results_path:
        with open(results_path, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
            f.write(json.dumps({"mean_utmos": mean}) + "\n")
    return {"utmos": mean, "n": len(rows)}
