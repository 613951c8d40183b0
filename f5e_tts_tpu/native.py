"""ctypes bindings for the native host runtime (native/f5e_host.cpp).

Auto-builds the shared library on first use (g++ is in the image); every entry
point has a pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _src_hash(d: str) -> str:
    h = hashlib.sha256()
    for name in ("f5e_host.cpp", "Makefile"):
        p = os.path.join(d, name)
        if os.path.exists(p):
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    d = _native_dir()
    so = os.path.join(d, "libf5e_host.so")
    hash_file = so + ".srchash"
    if os.path.exists(os.path.join(d, "f5e_host.cpp")):
        # Rebuild when the .so is absent OR stale (source changed since the
        # last build) — a leftover binary must never shadow an edited
        # f5e_host.cpp. The source hash is recorded beside the .so.
        want = _src_hash(d)
        have = None
        if os.path.exists(hash_file):
            try:
                with open(hash_file) as f:
                    have = f.read().strip()
            except OSError:
                have = None
        if not os.path.exists(so) or have != want:
            try:
                subprocess.run(["make", "-C", d, "-B"], check=True, capture_output=True)
                with open(hash_file, "w") as f:
                    f.write(want)
            except Exception:
                if not os.path.exists(so):
                    return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
    pi16 = ctypes.POINTER(ctypes.c_int16)
    pi32 = ctypes.POINTER(i32)
    pi64 = ctypes.POINTER(i64)
    pf32 = ctypes.POINTER(f32)
    lib.pcm16_to_f32.argtypes = [pi16, pf32, i64]
    lib.f32_to_pcm16.argtypes = [pf32, pi16, i64]
    lib.resample_poly_f32.argtypes = [pf32, i64, i64, i64, pf32]
    lib.resample_poly_f32.restype = i64
    lib.crossfade_stitch_f32.argtypes = [pf32, pi64, i64, i64, pf32]
    lib.crossfade_stitch_f32.restype = i64
    lib.pack_batches_i32.argtypes = [pi32, i64, i32, i32, i32, i32, pi32]
    lib.pack_batches_i32.restype = i64
    _LIB = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Native polyphase resampler; falls back to scipy."""
    lib = load_library()
    if lib is None:
        from f5e_tts_tpu.infer.audio import resample as py_resample

        return py_resample(x, sr_in, sr_out)
    if sr_in == sr_out:
        return x
    from math import gcd

    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty((len(x) * up + down - 1) // down, np.float32)
    n = lib.resample_poly_f32(_ptr(x, ctypes.c_float), len(x), up, down,
                              _ptr(out, ctypes.c_float))
    return out[:n]


def crossfade_stitch(waves: List[np.ndarray], sr: int, cross_fade_duration: float) -> np.ndarray:
    lib = load_library()
    if lib is None or not waves:
        from f5e_tts_tpu.infer.pipeline import cross_fade_stitch as py_stitch

        return py_stitch(waves, sr, cross_fade_duration)
    flat = np.ascontiguousarray(np.concatenate(waves), np.float32)
    lens = np.asarray([len(w) for w in waves], np.int64)
    out = np.empty(int(lens.sum()), np.float32)
    n = lib.crossfade_stitch_f32(_ptr(flat, ctypes.c_float), _ptr(lens, ctypes.c_int64),
                                 len(waves), int(cross_fade_duration * sr),
                                 _ptr(out, ctypes.c_float))
    return out[:n]


def pack_batches(frame_lens, frames_threshold: int, max_samples: int = 0,
                 min_frames: int = 0, max_frames: int = 2**30) -> List[List[int]]:
    lib = load_library()
    if lib is None:
        from f5e_tts_tpu.data.dataset import pack_batches as py_pack

        return py_pack(frame_lens, frames_threshold, max_samples, min_frames, max_frames)
    fl = np.ascontiguousarray(frame_lens, np.int32)
    batch_of = np.empty(len(fl), np.int32)
    nb = lib.pack_batches_i32(_ptr(fl, ctypes.c_int32), len(fl), frames_threshold,
                              max_samples, min_frames, min(max_frames, 2**30),
                              _ptr(batch_of, ctypes.c_int32))
    batches: List[List[int]] = [[] for _ in range(nb)]
    order = np.argsort(fl, kind="stable")
    for idx in order:
        b = batch_of[idx]
        if b >= 0:
            batches[b].append(int(idx))
    return batches


def pcm16_bytes_to_f32(data: bytes) -> np.ndarray:
    lib = load_library()
    pcm = np.frombuffer(data, np.int16)
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(len(pcm), np.float32)
    lib.pcm16_to_f32(_ptr(np.ascontiguousarray(pcm), ctypes.c_int16),
                     _ptr(out, ctypes.c_float), len(pcm))
    return out


def f32_to_pcm16_bytes(x: np.ndarray) -> bytes:
    lib = load_library()
    if lib is None:
        return (np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.int16)
    lib.f32_to_pcm16(_ptr(x, ctypes.c_float), _ptr(out, ctypes.c_int16), len(x))
    return out.tobytes()
