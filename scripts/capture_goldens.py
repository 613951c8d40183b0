#!/usr/bin/env python
"""Bank golden tensors from the REAL external packages, when available.

Several numeric surfaces of this framework are validated offline against
builder-written re-implementations of external-package semantics
(tests/oracle/shims.py, ops/kaldi.py). This script closes that loop: run it
on any machine that has the real wheels (torchaudio, pypinyin, vocos,
x_transformers, torchdiffeq) and it writes golden input/output pairs under
tests/goldens/. tests/test_goldens.py then asserts the framework (and the
shims) reproduce every banked golden — skipping files that have not been
captured yet.

Inputs are generated deterministically from fixed seeds by `make_inputs`,
shared between capture and verification, so goldens captured elsewhere
verify here byte-for-byte.

Usage (on a machine with the wheels):
    python scripts/capture_goldens.py [--out tests/goldens]

Each capture is independent: missing packages are reported and skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(REPO, "tests", "goldens")

# the test corpus for pypinyin: mixed zh/en/punct, covering tone sandhi and
# the fork's finer-pinyin splitting inputs (reference: model/utils.py:270-311)
PINYIN_CORPUS = [
    "你好世界",
    "我们在一起学习语音合成",
    "这是一个测试句子，包含标点。",
    "银行行长很行",
    "不对，一定是你不了解",
    "小猫咪喜欢吃鱼",
    "春眠不觉晓处处闻啼鸟",
    "了解了吗了不起",
]


def make_inputs(name: str):
    """Deterministic inputs per golden; shared by capture and verification."""
    rng = np.random.default_rng(20260817)
    if name == "kaldi_fbank":
        # 1.3 s of 16 kHz tone+noise, float in [-1, 1]
        t = np.arange(20800, dtype=np.float64)
        wav = 0.4 * np.sin(2 * np.pi * 330 * t / 16000) + 0.05 * rng.standard_normal(t.shape)
        return np.clip(wav, -1, 1).astype(np.float32)
    if name == "mel_vocos":
        # 1 s of 24 kHz audio-like signal
        t = np.arange(24000, dtype=np.float64)
        wav = 0.3 * np.sin(2 * np.pi * 220 * t / 24000) + 0.1 * rng.standard_normal(t.shape)
        return np.clip(wav, -1, 1).astype(np.float32)
    if name == "rotary":
        return rng.standard_normal((2, 4, 64, 64)).astype(np.float32)
    if name == "vocos_mel":
        return rng.standard_normal((1, 40, 100)).astype(np.float32) * 0.5 - 1.0
    raise KeyError(name)


def _save(out_dir: str, name: str, **arrays):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"[captured] {path}")


def capture_kaldi_fbank(out_dir: str) -> bool:
    """torchaudio.compliance.kaldi.fbank with the PPG frontend's exact args
    (reference: ppg/wenet/dataset/feats.py:49-83)."""
    try:
        import torch
        import torchaudio.compliance.kaldi as kaldi
    except ImportError as e:
        print(f"[skip] kaldi_fbank: {e}")
        return False
    wav = make_inputs("kaldi_fbank")
    feat = kaldi.fbank(
        torch.from_numpy(wav)[None] * (1 << 15),
        num_mel_bins=80, frame_length=25, frame_shift=10,
        dither=0.0, energy_floor=0.0, sample_frequency=16000)
    _save(out_dir, "kaldi_fbank", feat=feat.numpy())
    return True


def capture_mel_vocos(out_dir: str) -> bool:
    """torchaudio.transforms.MelSpectrogram with the vocos-frontend args
    (reference: model/modules.py:75-101)."""
    try:
        import torch
        import torchaudio
    except ImportError as e:
        print(f"[skip] mel_vocos: {e}")
        return False
    wav = make_inputs("mel_vocos")
    ms = torchaudio.transforms.MelSpectrogram(
        sample_rate=24000, n_fft=1024, win_length=1024, hop_length=256,
        n_mels=100, power=1, center=True, normalized=False, norm=None)
    with torch.no_grad():
        spec = ms(torch.from_numpy(wav)[None])
    _save(out_dir, "mel_vocos", spec=spec.numpy())
    return True


def capture_pinyin(out_dir: str) -> bool:
    """Real pypinyin lazy_pinyin outputs (TONE3, tone_sandhi) for the corpus
    (reference converter: model/utils.py:270-311 passes per-seg strings)."""
    try:
        import pypinyin
    except ImportError as e:
        print(f"[skip] pinyin: {e}")
        return False
    if getattr(pypinyin, "__file__", None) is None:
        print("[skip] pinyin: pypinyin is the offline shim, not the real wheel")
        return False
    rows = {}
    for seg in PINYIN_CORPUS:
        rows[seg] = pypinyin.lazy_pinyin(seg, style=pypinyin.Style.TONE3,
                                         tone_sandhi=True)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "pinyin.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=False, indent=1)
    print(f"[captured] {path}")
    return True


def capture_rotary(out_dir: str) -> bool:
    """Real x_transformers RotaryEmbedding + apply_rotary_pos_emb."""
    try:
        import torch
        from x_transformers.x_transformers import (RotaryEmbedding,
                                                   apply_rotary_pos_emb)
        import x_transformers
    except ImportError as e:
        print(f"[skip] rotary: {e}")
        return False
    if getattr(x_transformers, "__file__", None) is None:
        print("[skip] rotary: x_transformers is the offline shim, not the real wheel")
        return False
    x = make_inputs("rotary")
    rot = RotaryEmbedding(dim=64)
    freqs, scale = rot.forward_from_seq_len(64)
    with torch.no_grad():
        out = apply_rotary_pos_emb(torch.from_numpy(x), freqs, scale)
    _save(out_dir, "rotary", freqs=freqs.detach().numpy(), out=out.numpy())
    return True


def capture_vocos(out_dir: str) -> bool:
    """Real pip `vocos` decode on seeded weights + mel (no network needed)."""
    try:
        import torch
        from vocos import Vocos  # noqa: F401
        from vocos.models import VocosBackbone
        from vocos.heads import ISTFTHead
    except ImportError as e:
        print(f"[skip] vocos: {e}")
        return False
    torch.manual_seed(0)
    backbone = VocosBackbone(input_channels=100, dim=512, intermediate_dim=1536,
                             num_layers=8)
    head = ISTFTHead(dim=512, n_fft=1024, hop_length=256)
    backbone.eval(), head.eval()
    mel = make_inputs("vocos_mel")
    with torch.no_grad():
        wav = head(backbone(features=torch.from_numpy(mel).transpose(1, 2)))
    sd = {f"backbone.{k}": v.numpy() for k, v in backbone.state_dict().items()}
    sd.update({f"head.{k}": v.numpy() for k, v in head.state_dict().items()})
    _save(out_dir, "vocos", wav=wav.numpy(),
          **{f"sd::{k}": v for k, v in sd.items()})
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()
    got = [f(args.out) for f in (capture_kaldi_fbank, capture_mel_vocos,
                                 capture_pinyin, capture_rotary, capture_vocos)]
    print(f"captured {sum(got)}/{len(got)} goldens -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
