"""Verify banked goldens from the REAL external packages, when present.

scripts/capture_goldens.py (run on a machine with the wheels) writes
tests/goldens/*.npz|json; each test below loads its golden and asserts the
framework (and where relevant the tests/oracle shim) reproduces it. Tests
skip when a golden has not been captured yet — the suite stays green offline
while becoming strictly stronger the moment goldens are banked.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from capture_goldens import make_inputs, PINYIN_CORPUS  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _load(name):
    path = os.path.join(GOLDENS, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not captured yet (scripts/capture_goldens.py)")
    if name.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return np.load(path)


def test_kaldi_fbank_golden():
    """ops/kaldi.py vs real torchaudio.compliance.kaldi.fbank."""
    from f5e_tts_tpu.ops.kaldi import kaldi_fbank

    g = _load("kaldi_fbank.npz")
    wav = make_inputs("kaldi_fbank")
    ours = np.asarray(kaldi_fbank(jnp.asarray(wav[None])))[0]
    ref = g["feat"]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_mel_vocos_golden():
    """ops/mel.py vocos frontend + the torchaudio shim vs real torchaudio."""
    import torch

    from f5e_tts_tpu.config import MelConfig
    from f5e_tts_tpu.ops import mel as fmel
    from oracle import shims

    g = _load("mel_vocos.npz")
    wav = make_inputs("mel_vocos")
    ref = g["spec"]  # (1, n_mels, frames), linear magnitude mel

    ms = shims.MelSpectrogram(sample_rate=24000, n_fft=1024, win_length=1024,
                              hop_length=256, n_mels=100, power=1, center=True)
    with torch.no_grad():
        shim_spec = ms(torch.from_numpy(wav)[None]).numpy()
    np.testing.assert_allclose(shim_spec, ref, atol=2e-4, rtol=1e-4)

    ours = np.asarray(fmel.mel_spectrogram(jnp.asarray(wav[None]), MelConfig()))
    log_ref = np.log(np.clip(ref.transpose(0, 2, 1), 1e-5, None))
    np.testing.assert_allclose(ours, log_ref, atol=2e-3, rtol=1e-3)


def test_pinyin_golden():
    """The vendored pinyin fixture vs real pypinyin on the shared corpus."""
    from oracle import pinyin_fixture

    rows = _load("pinyin.json")
    for seg in PINYIN_CORPUS:
        assert seg in rows
        assert pinyin_fixture.lookup(seg, "tone3") == rows[seg], seg


def test_rotary_golden():
    """The x_transformers shim + framework rotary vs the real wheel."""
    import torch

    from f5e_tts_tpu.ops import rope as frope
    from oracle import shims

    g = _load("rotary.npz")
    x = make_inputs("rotary")

    rot = shims.RotaryEmbedding(dim=64)
    freqs, scale = rot.forward_from_seq_len(64)
    np.testing.assert_allclose(freqs.numpy(), g["freqs"], atol=1e-6)
    out_shim = shims.apply_rotary_pos_emb(torch.from_numpy(x), freqs, scale).numpy()
    np.testing.assert_allclose(out_shim, g["out"], atol=1e-5)

    cos, sin = frope.rotary_cos_sin(64, 64)
    out_f = np.asarray(frope.apply_rotary(jnp.asarray(x), jnp.asarray(cos),
                                          jnp.asarray(sin)))
    np.testing.assert_allclose(out_f, g["out"], atol=1e-5)


def test_vocos_golden():
    """models/vocos.py decode vs the real pip vocos on banked seeded weights."""
    from f5e_tts_tpu.models.vocos import VocosConfig, vocos_decode, vocos_from_torch
    import jax

    g = _load("vocos.npz")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    mel = make_inputs("vocos_mel")
    cfg = VocosConfig()
    params = jax.tree.map(jnp.asarray, vocos_from_torch(sd, cfg))
    ours = np.asarray(vocos_decode(params, cfg, jnp.asarray(mel)))
    ref = g["wav"]
    n = min(ours.shape[-1], ref.shape[-1])
    scale = max(float(np.abs(ref).max()), 1e-6)
    assert np.abs(ours[:, :n] - ref[:, :n]).max() / scale < 2e-3
