"""Unit tests for NN primitives against torch oracles (layout conversions) and
for RoPE against a straight-line numpy reimplementation of the x_transformers
convention."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops import rope as frope
from f5e_tts_tpu.ops import convnext as fcnx
from f5e_tts_tpu.utils import masks as fmasks


def test_linear_matches_torch(rng):
    x = rng.standard_normal((2, 5, 8), dtype=np.float32)
    tl = torch.nn.Linear(8, 16)
    p = {"w": jnp.asarray(tl.weight.detach().numpy().T), "b": jnp.asarray(tl.bias.detach().numpy())}
    ours = np.asarray(fnn.linear(p, jnp.asarray(x)))
    theirs = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_conv1d_grouped_matches_torch(rng):
    x = rng.standard_normal((2, 32, 16), dtype=np.float32)
    tc = torch.nn.Conv1d(16, 16, kernel_size=31, groups=4, padding=15)
    p = {
        "w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0)),  # (out,in/g,k)->(k,in/g,out)
        "b": jnp.asarray(tc.bias.detach().numpy()),
    }
    ours = np.asarray(fnn.conv1d(p, jnp.asarray(x), groups=4, padding=15))
    theirs = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_matches_torch(rng):
    x = rng.standard_normal((1, 20, 12), dtype=np.float32)
    tc = torch.nn.Conv1d(12, 12, kernel_size=7, groups=12, padding=3)
    p = {
        "w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0)),
        "b": jnp.asarray(tc.bias.detach().numpy()),
    }
    ours = np.asarray(fnn.conv1d(p, jnp.asarray(x), groups=12, padding=3))
    theirs = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_layernorm_matches_torch(rng):
    x = rng.standard_normal((3, 7, 10), dtype=np.float32)
    tl = torch.nn.LayerNorm(10, eps=1e-6)
    with torch.no_grad():
        tl.weight.uniform_(0.5, 1.5)
        tl.bias.uniform_(-0.5, 0.5)
    p = {"g": jnp.asarray(tl.weight.detach().numpy()), "b": jnp.asarray(tl.bias.detach().numpy())}
    ours = np.asarray(fnn.layernorm(p, jnp.asarray(x), eps=1e-6))
    theirs = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_layernorm_no_affine(rng):
    x = rng.standard_normal((2, 4, 6), dtype=np.float32)
    tl = torch.nn.LayerNorm(6, eps=1e-6, elementwise_affine=False)
    ours = np.asarray(fnn.layernorm(None, jnp.asarray(x), eps=1e-6))
    theirs = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_rmsnorm_matches_torch(rng):
    x = rng.standard_normal((2, 3, 8), dtype=np.float32)
    w = rng.standard_normal(8, dtype=np.float32)
    ours = np.asarray(fnn.rmsnorm({"g": jnp.asarray(w)}, jnp.asarray(x), eps=1e-6))
    theirs = torch.nn.functional.rms_norm(
        torch.from_numpy(x), (8,), weight=torch.from_numpy(w), eps=1e-6
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_activations_match_torch(rng):
    x = rng.standard_normal((100,), dtype=np.float32) * 3
    np.testing.assert_allclose(
        np.asarray(fnn.mish(jnp.asarray(x))), torch.nn.functional.mish(torch.from_numpy(x)).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fnn.gelu(jnp.asarray(x), "none")), torch.nn.functional.gelu(torch.from_numpy(x)).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fnn.gelu(jnp.asarray(x), "tanh")),
        torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh").numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fnn.silu(jnp.asarray(x))), torch.nn.functional.silu(torch.from_numpy(x)).numpy(),
        rtol=1e-5, atol=1e-6)


def test_sinus_time_embedding():
    """reference: modules.py:149-161 — emb = [sin | cos](1000*t*exp(-ln1e4*i/(h-1)))."""
    t = np.array([0.0, 0.25, 1.0], dtype=np.float32)
    dim = 256
    ours = np.asarray(fnn.sinus_time_embedding(jnp.asarray(t), dim))
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    args = 1000.0 * t[:, None] * freqs[None, :]
    ref = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    # fp32 trig at args up to ~1000 carries ~1e-4 abs error
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_freqs_cis_table():
    tab = fnn.precompute_freqs_cis(512, 64)
    assert tab.shape == (64, 512)
    # position 0: cos=1, sin=0
    np.testing.assert_allclose(tab[0, :256], 1.0, atol=1e-7)
    np.testing.assert_allclose(tab[0, 256:], 0.0, atol=1e-7)


def test_rotary_convention():
    """x_transformers: pairwise-duplicated freqs, rotate_half on adjacent pairs."""
    dim_head, n = 8, 5
    cos, sin = frope.rotary_cos_sin(dim_head, n)
    x = np.random.default_rng(1).standard_normal((1, n, 1, dim_head)).astype(np.float32)
    ours = np.asarray(frope.apply_rotary(jnp.asarray(x), jnp.asarray(cos)[None, :, None, :],
                                         jnp.asarray(sin)[None, :, None, :]))
    # straight-line reimplementation
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2) / dim_head))
    freqs = np.outer(np.arange(n), inv_freq)
    freqs = np.repeat(freqs, 2, axis=-1)  # (n, dim_head) adjacent duplication
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = np.stack([-x2, x1], axis=-1).reshape(x.shape)
    ref = x * np.cos(freqs)[None, :, None, :] + rot * np.sin(freqs)[None, :, None, :]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_half_split_rope_attention_equivalence():
    """The TPU-fast path (weights permuted to half-split + apply_rotary_half)
    must produce EXACTLY the same attention output as the reference
    interleaved convention."""
    from f5e_tts_tpu.ops.attention import attention

    rng_ = np.random.default_rng(5)
    b, n, heads, dh = 2, 12, 2, 8
    dim = heads * dh
    x = rng_.standard_normal((b, n, dim)).astype(np.float32)
    p_ref = {
        name: {"w": rng_.standard_normal((dim, dim)).astype(np.float32) * 0.1,
               "b": rng_.standard_normal(dim).astype(np.float32) * 0.1}
        for name in ("to_q", "to_k", "to_v", "to_out")
    }

    # reference math: interleaved rope applied to q/k heads
    cos_i, sin_i = frope.rotary_cos_sin(dh, n)
    q = (x @ p_ref["to_q"]["w"] + p_ref["to_q"]["b"]).reshape(b, n, heads, dh)
    k = (x @ p_ref["to_k"]["w"] + p_ref["to_k"]["b"]).reshape(b, n, heads, dh)
    v = (x @ p_ref["to_v"]["w"] + p_ref["to_v"]["b"]).reshape(b, n, heads, dh)
    qr = np.asarray(frope.apply_rotary(jnp.asarray(q), jnp.asarray(cos_i)[None, :, None, :],
                                       jnp.asarray(sin_i)[None, :, None, :]))
    kr = np.asarray(frope.apply_rotary(jnp.asarray(k), jnp.asarray(cos_i)[None, :, None, :],
                                       jnp.asarray(sin_i)[None, :, None, :]))
    scores = np.einsum("bnhd,bmhd->bhnm", qr, kr) / np.sqrt(dh)
    attn_w = np.exp(scores - scores.max(-1, keepdims=True))
    attn_w /= attn_w.sum(-1, keepdims=True)
    o = np.einsum("bhnm,bmhd->bnhd", attn_w, v).reshape(b, n, dim)
    ref = o @ p_ref["to_out"]["w"] + p_ref["to_out"]["b"]

    # our path: permuted weights + half-split tables
    p_fast = {
        "to_q": {"w": jnp.asarray(frope.permute_qk_weight(p_ref["to_q"]["w"], heads)),
                 "b": jnp.asarray(frope.permute_qk_bias(p_ref["to_q"]["b"], heads))},
        "to_k": {"w": jnp.asarray(frope.permute_qk_weight(p_ref["to_k"]["w"], heads)),
                 "b": jnp.asarray(frope.permute_qk_bias(p_ref["to_k"]["b"], heads))},
        "to_v": {"w": jnp.asarray(p_ref["to_v"]["w"]), "b": jnp.asarray(p_ref["to_v"]["b"])},
        "to_out": {"w": jnp.asarray(p_ref["to_out"]["w"]), "b": jnp.asarray(p_ref["to_out"]["b"])},
    }
    cos_h, sin_h = frope.rotary_cos_sin_half(dh, n)
    ours = np.asarray(attention(p_fast, jnp.asarray(x), heads,
                                rope_cos=jnp.asarray(cos_h), rope_sin=jnp.asarray(sin_h),
                                compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_half_split_perm_roundtrip():
    w = np.random.default_rng(0).standard_normal((10, 32)).astype(np.float32)
    heads = 2
    np.testing.assert_array_equal(
        frope.unpermute_qk_weight(frope.permute_qk_weight(w, heads), heads), w)
    b = np.random.default_rng(1).standard_normal(32).astype(np.float32)
    np.testing.assert_array_equal(
        frope.unpermute_qk_bias(frope.permute_qk_bias(b, heads), heads), b)


def test_rotary_preserves_norm():
    dim_head, n = 64, 16
    cos, sin = frope.rotary_cos_sin(dim_head, n)
    x = np.random.default_rng(2).standard_normal((2, n, 4, dim_head)).astype(np.float32)
    y = np.asarray(frope.apply_rotary(jnp.asarray(x), jnp.asarray(cos)[None, :, None, :],
                                      jnp.asarray(sin)[None, :, None, :]))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4)


def test_convnext_v2_block(rng):
    key = jax.random.PRNGKey(0)
    p = fcnx.convnext_v2_init(key, 16, 32)
    x = jnp.asarray(rng.standard_normal((2, 12, 16), dtype=np.float32))
    y = fcnx.convnext_v2(p, x, compute_dtype=jnp.float32)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # GRN zero-init + residual: initial block output != input only via conv path
    # (gamma=0 -> grn(x) = beta + x = x), so block = x + pw2(gelu(pw1(ln(dw(x)))))


def test_grn_matches_reference_formula(rng):
    x = rng.standard_normal((2, 6, 8), dtype=np.float32)
    gamma = rng.standard_normal(8, dtype=np.float32)
    beta = rng.standard_normal(8, dtype=np.float32)
    ours = np.asarray(fcnx.grn({"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}, jnp.asarray(x)))
    gx = np.linalg.norm(x, axis=1, keepdims=True)
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    ref = gamma * (x * nx) + beta + x
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_masks():
    lens = jnp.asarray([2, 5, 0])
    m = np.asarray(fmasks.lens_to_mask(lens, 5))
    assert m.tolist() == [
        [True, True, False, False, False],
        [True, True, True, True, True],
        [False, False, False, False, False],
    ]
    span = np.asarray(fmasks.mask_from_start_end_indices(jnp.asarray([1]), jnp.asarray([3]), 5))
    assert span.tolist() == [[False, True, True, False, False]]


def test_mask_from_frac_lengths():
    key = jax.random.PRNGKey(0)
    seq_len = jnp.asarray([100, 50])
    frac = jnp.asarray([0.7, 1.0])
    m = np.asarray(fmasks.mask_from_frac_lengths(key, seq_len, frac, 100))
    assert m[0].sum() == 70
    assert m[1].sum() == 50
    # contiguous span
    idx = np.where(m[0])[0]
    assert (np.diff(idx) == 1).all()
