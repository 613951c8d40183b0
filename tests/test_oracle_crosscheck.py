"""Cross-validate the oracle shims against the reference's OWN in-repo math.

The parity oracle (tests/oracle/) runs the actual reference model code, but
two of its dependencies — x_transformers RoPE and torchaudio MelSpectrogram —
are builder-written shims: a misreading there would fool framework and oracle
identically.  The reference repo, however, contains *second, independently
authored statements* of the same semantics inside its TensorRT-LLM runtime
(see tests/oracle/trt_math.py for file:line sources).  These tests assert the
three-way agreement  shim == TRT port == framework  on random tensors, so a
shared-misreading would have to be shared with the reference's own authors.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from oracle import trt_math
from oracle import shims
from oracle import loader

from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.ops import mel as fmel
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops import rope as frope


# ---------------------------------------------------------------------------
# RoPE: shim (x_transformers semantics) == TRT runtime == framework
# ---------------------------------------------------------------------------


def test_rope_shim_matches_trt_runtime(rng):
    """The x_transformers shim rotation == the TRT engine's own rope math
    (repeat_interleave cos/sin tables + rotate_every_two)."""
    b, h, n, d = 2, 3, 37, 64
    x = rng.standard_normal((b, h, n, d)).astype(np.float32)

    # shim path: RotaryEmbedding freq table + apply_rotary_pos_emb
    rot = shims.RotaryEmbedding(dim=d)
    freqs, scale = rot.forward_from_seq_len(n)
    out_shim = shims.apply_rotary_pos_emb(torch.from_numpy(x), freqs, scale).numpy()

    # TRT path: f5_tts_trtllm.py:209-216 tables + patch modules.py:230-247
    cos, sin = trt_math.rope_tables(d, n)
    out_trt = trt_math.apply_rotary_trt(x, cos, sin)

    np.testing.assert_allclose(out_shim, out_trt, atol=2e-6, rtol=1e-5)


def test_rope_framework_matches_trt_runtime(rng):
    b, n, d = 2, 64, 64
    x = rng.standard_normal((b, n, d)).astype(np.float32)

    cos, sin = trt_math.rope_tables(d, n)
    out_trt = trt_math.apply_rotary_trt(x, cos, sin)

    fcos, fsin = frope.rotary_cos_sin(d, n)
    np.testing.assert_allclose(fcos, cos, atol=5e-6)
    np.testing.assert_allclose(fsin, sin, atol=5e-6)
    out_f = np.asarray(frope.apply_rotary(jnp.asarray(x), jnp.asarray(fcos),
                                          jnp.asarray(fsin)))
    np.testing.assert_allclose(out_f, out_trt, atol=2e-6, rtol=1e-5)


def test_rope_half_split_matches_trt_runtime(rng):
    """The TPU-fast half-split layout: rotating permuted features equals
    permuting the TRT-rotated output (q.k invariance argument in ops/rope.py)."""
    b, n, d = 2, 48, 64
    x = rng.standard_normal((b, n, d)).astype(np.float32)

    cos, sin = trt_math.rope_tables(d, n)
    out_trt = trt_math.apply_rotary_trt(x, cos, sin)

    perm = frope.half_split_perm(d)
    hcos, hsin = frope.rotary_cos_sin_half(d, n)
    out_half = np.asarray(frope.apply_rotary_half(
        jnp.asarray(x[..., perm]), jnp.asarray(hcos), jnp.asarray(hsin)))
    np.testing.assert_allclose(out_half, out_trt[..., perm], atol=2e-6, rtol=1e-5)


def test_rope_trt_rotation_is_partial_when_rot_dim_lt_width(rng):
    """apply_rotary_pos_emb_3dim passes features beyond rot_dim through
    unrotated (patch modules.py:236-246) — pin the port's slicing."""
    x = rng.standard_normal((1, 8, 128)).astype(np.float32)
    cos, sin = trt_math.rope_tables(64, 8)
    out = trt_math.apply_rotary_trt(x, cos, sin)
    np.testing.assert_array_equal(out[..., 64:], x[..., 64:])
    assert np.abs(out[..., :64] - x[..., :64]).max() > 1e-3


# ---------------------------------------------------------------------------
# Sway schedule + time embedding: framework == TRT precompute == reference
# ---------------------------------------------------------------------------


def test_sway_schedule_matches_trt_runtime():
    ts, dt = trt_math.sway_time(16, sway_coef=-1.0)
    ours = fcfm.sway_timesteps(16, -1.0)
    np.testing.assert_allclose(ours, ts, atol=1e-7)
    np.testing.assert_allclose(np.diff(ours), dt, atol=1e-6)


def test_time_embedding_matches_trt_runtime():
    """Three-way: framework sinus embed == TRT time_expand table == the
    reference model's SinusPositionEmbedding (scale 1000, [sin|cos])."""
    table_trt = trt_math.time_expand(16, dim=256)
    ts, _ = trt_math.sway_time(16, sway_coef=-1.0)

    # tolerance: sin/cos of angles up to 1000 rad in float32 — ULP noise of
    # the argument reduction is ~1000*eps32 ~ 6e-5 and differs per backend
    ours = np.asarray(fnn.sinus_time_embedding(jnp.asarray(ts[:16]), 256))
    np.testing.assert_allclose(ours, table_trt, atol=2e-4)

    ref = loader.load()
    with torch.no_grad():
        ref_emb = ref.modules.SinusPositionEmbedding(256)(
            torch.from_numpy(ts[:16])).numpy()
    np.testing.assert_allclose(ref_emb, table_trt, atol=2e-4)


def test_text_pos_table_matches_trt_runtime():
    """Abs sinusoidal text pos-emb: framework == TRT TextEmbedding buffer ==
    reference precompute_freqs_cis."""
    dim, end = 512, 96
    table_trt = trt_math.freqs_cis_cat(dim, end)
    ours = fnn.precompute_freqs_cis(dim, end)
    np.testing.assert_allclose(ours, table_trt, atol=1e-5)

    ref = loader.load()
    ref_table = ref.modules.precompute_freqs_cis(dim, end).numpy()
    np.testing.assert_allclose(ref_table, table_trt, atol=1e-5)


# ---------------------------------------------------------------------------
# STFT/ISTFT: framework == the reference's conv-STFT (vocoder export path)
# ---------------------------------------------------------------------------


def test_stft_magnitude_matches_conv_stft(rng):
    """Our STFT core (hann, center reflect pad) == conv_stft.transform —
    validates the torchaudio-MelSpectrogram shim's STFT conventions against
    reference-authored code."""
    n_fft, hop = 256, 64
    wav = rng.standard_normal((2, 2000)).astype(np.float32)

    cs = trt_math.ConvSTFT(win_len=n_fft, win_hop=hop, fft_len=n_fft)
    real, imag = cs.transform(torch.from_numpy(wav))
    mag_ref = torch.sqrt(real**2 + imag**2).numpy().transpose(0, 2, 1)

    mag = np.asarray(fmel.stft_magnitude(jnp.asarray(wav), n_fft, hop, n_fft,
                                         center=True, pad_mode="reflect"))
    assert mag.shape == mag_ref.shape
    np.testing.assert_allclose(mag, mag_ref, atol=1e-3, rtol=1e-4)


def test_istft_matches_conv_stft(rng):
    """Our ISTFT == conv_stft.inverse on arbitrary (inconsistent) spectra —
    the exact configuration the vocoder export uses (fft 1024, hop 256).
    conv_stft emits one extra hop of tail; compare the common prefix."""
    n_fft, hop, n_frames = 1024, 256, 24
    f = n_fft // 2 + 1
    real = rng.standard_normal((2, f, n_frames)).astype(np.float32)
    imag = rng.standard_normal((2, f, n_frames)).astype(np.float32)

    cs = trt_math.ConvSTFT(win_len=n_fft, win_hop=hop, fft_len=n_fft)
    wav_ref = cs.inverse(torch.from_numpy(real), torch.from_numpy(imag)).numpy()

    wav = np.asarray(fmel.istft(
        jnp.asarray(real.transpose(0, 2, 1)), jnp.asarray(imag.transpose(0, 2, 1)),
        n_fft, hop, n_fft, center=True))
    n = (n_frames - 1) * hop
    assert wav.shape[1] == n and wav_ref.shape[1] == n_frames * hop
    np.testing.assert_allclose(wav[:, :n], wav_ref[:, :n], atol=2e-4, rtol=1e-3)


def test_istft_roundtrip_conv_stft(rng):
    """transform -> inverse through BOTH implementations reconstructs the
    original signal (COLA perfect-reconstruction sanity on real audio-like
    input)."""
    n_fft, hop = 1024, 256
    t = np.arange(24000, dtype=np.float32)
    wav = (0.3 * np.sin(2 * np.pi * 220 * t / 24000)
           + 0.1 * rng.standard_normal(24000)).astype(np.float32)[None]

    cs = trt_math.ConvSTFT(win_len=n_fft, win_hop=hop, fft_len=n_fft)
    real, imag = cs.transform(torch.from_numpy(wav))
    rec_ref = cs.inverse(real, imag).numpy()

    rec = np.asarray(fmel.istft(
        jnp.asarray(real.numpy().transpose(0, 2, 1)),
        jnp.asarray(imag.numpy().transpose(0, 2, 1)), n_fft, hop, n_fft))
    n = min(rec.shape[1], rec_ref.shape[1], wav.shape[1])
    np.testing.assert_allclose(rec[:, :n], wav[:, :n], atol=1e-3)
    np.testing.assert_allclose(rec_ref[:, :n], wav[:, :n], atol=1e-3)


def test_vocos_istft_head_matches_reference_export(rng):
    """Our Vocos ISTFT head (exp-mag clip, cos/sin phase, centered ISTFT) ==
    the reference's own ONNX-export head built on conv_stft."""
    from f5e_tts_tpu.models.vocos import istft_head

    n_fft, hop, dim, n = 1024, 256, 64, 20
    h = rng.standard_normal((2, n, dim)).astype(np.float32)
    w = (rng.standard_normal((n_fft + 2, dim)) * 0.05).astype(np.float32)
    b = (rng.standard_normal(n_fft + 2) * 0.05).astype(np.float32)

    wav_ref = trt_math.istft_head(w, b, torch.from_numpy(h), n_fft, hop).numpy()
    wav = np.asarray(istft_head({"w": w.T, "b": b}, jnp.asarray(h), n_fft, hop))

    cut = (n - 1) * hop
    scale = max(np.abs(wav_ref[:, :cut]).max(), 1e-6)
    assert np.abs(wav[:, :cut] - wav_ref[:, :cut]).max() / scale < 1e-4
