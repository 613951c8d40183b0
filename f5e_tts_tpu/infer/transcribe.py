"""Lazy Whisper ASR pipeline for reference-audio transcription.

reference: src/f5_tts/infer/utils_infer.py:143-179 — a module-global
`asr_pipe` lazily initialized with whisper-large-v3-turbo, used by
preprocess_ref_audio_text when ref_text is empty (result cached by audio
md5, :334-348 — the cache lives in infer.pipeline.CachedTranscriber here).

Offline build: weights are NOT auto-downloaded; point `model_dir` (or the
F5E_ASR_MODEL environment variable) at a local whisper directory.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_asr_pipe = None
_asr_dir = None


def asr_model_dir(model_dir: Optional[str] = None) -> Optional[str]:
    return model_dir or os.environ.get("F5E_ASR_MODEL")


def initialize_asr_pipeline(model_dir: Optional[str] = None, device=-1):
    """Build the transformers ASR pipeline once (utils_infer.py:148-163)."""
    global _asr_pipe, _asr_dir
    model_dir = asr_model_dir(model_dir)
    if _asr_pipe is not None and _asr_dir == model_dir:
        return _asr_pipe
    if not model_dir:
        raise RuntimeError(
            "no ASR model configured: pass asr_model=<local whisper dir> or "
            "set F5E_ASR_MODEL (the reference auto-downloads "
            "openai/whisper-large-v3-turbo, utils_infer.py:159; this offline "
            "build needs local weights)")
    if not os.path.exists(model_dir):
        raise FileNotFoundError(f"ASR weights not found at {model_dir}")
    from transformers import pipeline

    _asr_pipe = pipeline("automatic-speech-recognition", model=model_dir,
                         device=device)
    _asr_dir = model_dir
    return _asr_pipe


def transcribe(ref_audio, language: Optional[str] = None,
               model_dir: Optional[str] = None) -> str:
    """Transcribe a path or {array, sampling_rate} input
    (utils_infer.py:168-179 semantics: chunked long-form, task=transcribe)."""
    pipe = initialize_asr_pipeline(model_dir)
    kwargs = {"task": "transcribe"}
    if language:
        kwargs["language"] = language
    return pipe(ref_audio, chunk_length_s=30,
                generate_kwargs=kwargs, return_timestamps=False)["text"].strip()


def make_cached_transcriber(model_dir: Optional[str] = None,
                            language: Optional[str] = None):
    """(wav, sr) -> text callable with the md5 cache, or None when no ASR
    model is configured. Plug into preprocess_ref_audio_text(transcribe=...).
    """
    from f5e_tts_tpu.infer.pipeline import CachedTranscriber

    if not asr_model_dir(model_dir):
        return None

    def fn(wav: np.ndarray, sr: int) -> str:
        return transcribe({"array": np.asarray(wav, np.float32),
                           "sampling_rate": int(sr)},
                          language=language, model_dir=model_dir)

    return CachedTranscriber(fn)
