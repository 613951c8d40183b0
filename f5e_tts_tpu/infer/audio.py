"""Host-side audio utilities: wav IO, resampling, RMS normalization, silence.

The reference uses torchaudio/pydub/soundfile for these (not bundled here);
this module is stdlib `wave` + numpy + scipy. These run on host CPU — they are
not compute-path code.
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM wav -> (float32 mono [-1,1] array (T,), sample_rate)."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    """Write float32 [-1,1] mono as 16-bit PCM."""
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (host-side; replaces torchaudio.transforms.Resample)."""
    if sr_in == sr_out:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g).astype(np.float32)


def rms(x: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0


def normalize_rms(x: np.ndarray, target_rms: float) -> Tuple[np.ndarray, float]:
    """Scale up quiet audio to target RMS; return (audio, original_rms).

    reference: utils_infer.py:441-447 — only scales UP (rms < target).
    """
    r = rms(x)
    if 0 < r < target_rms:
        x = x * (target_rms / r)
    return x, r


def remove_silence_edges(x: np.ndarray, sr: int, silence_threshold_db: float = -42.0,
                         frame_ms: float = 10.0) -> np.ndarray:
    """Trim leading/trailing silence by dBFS threshold (replaces pydub-based
    edge trim, reference: utils_infer.py:274-287)."""
    frame = max(int(sr * frame_ms / 1000), 1)
    n_frames = len(x) // frame
    if n_frames == 0:
        return x
    frames = x[: n_frames * frame].reshape(n_frames, frame)
    db = 20 * np.log10(np.sqrt(np.mean(frames**2, axis=1)) + 1e-10)
    loud = np.where(db > silence_threshold_db)[0]
    if len(loud) == 0:
        return x
    start = loud[0] * frame
    end = min((loud[-1] + 1) * frame, len(x))
    return x[start:end]


def detect_leading_silence(x: np.ndarray, sr: int, silence_threshold_db: float = -42.0,
                           chunk_ms: float = 10.0) -> int:
    """Sample index of the first non-silent chunk (pydub.detect_leading_silence
    semantics, used by ref clipping, utils_infer.py:299-327)."""
    chunk = max(int(sr * chunk_ms / 1000), 1)
    pos = 0
    while pos + chunk <= len(x):
        seg = x[pos : pos + chunk]
        db = 20 * np.log10(np.sqrt(np.mean(seg**2)) + 1e-10)
        if db > silence_threshold_db:
            return pos
        pos += chunk
    return len(x)
