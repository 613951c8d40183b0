"""Pallas full-KV attention kernel: correctness in interpret mode on CPU."""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from f5e_tts_tpu.ops import pallas_attention as pa

pytestmark = pytest.mark.core  # kernel parity is load-bearing and fast (~22 s)


def _interpret_fullkv(q, k, v, kv_lens, block_q):
    """Run the kernel in interpreter mode (CPU)."""
    b, n, h, dh = q.shape
    sm_scale = 1.0 / math.sqrt(dh)
    to_bh = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)
    out = pl.pallas_call(
        functools.partial(pa._attn_kernel, sm_scale=sm_scale, heads=h,
                          block_q=block_q, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, kv_len_ref: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, kv_len_ref: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, kv_len_ref: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, kv_len_ref: (bh, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
        interpret=True,
    )(kv_lens.astype(jnp.int32), to_bh(q), to_bh(k), to_bh(v))
    return jnp.transpose(out.reshape(b, h, n, dh), (0, 2, 1, 3))


def test_fullkv_matches_reference(rng):
    b, n, h, dh = 2, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    kv_lens = jnp.asarray([n, 150], jnp.int32)
    ours = np.asarray(_interpret_fullkv(q, k, v, kv_lens, block_q=128))
    mask = jnp.arange(n)[None, :] < kv_lens[:, None]
    ref = np.asarray(jax.nn.dot_product_attention(q, k, v, mask=mask[:, None, None, :]))
    np.testing.assert_allclose(ours[0], ref[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours[1, :150], ref[1, :150], rtol=2e-3, atol=2e-3)
    assert not np.isnan(ours).any()


def test_fused_rope_matches_reference(rng):
    from f5e_tts_tpu.ops.rope import apply_rotary_half, rotary_cos_sin_half

    b, n, h, dh = 2, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    kv_lens = jnp.asarray([n, 200], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    for rope_heads in (h, 1):  # all heads, and pe_attn_head=1
        ours = np.asarray(pa.mha_fullkv_rope(q, k, v, kv_lens, cos, sin,
                                             rope_heads=rope_heads, block_q=128,
                                             interpret=True))
        qr = apply_rotary_half(q[:, :, :rope_heads], cos[None, :, None, :], sin[None, :, None, :])
        kr = apply_rotary_half(k[:, :, :rope_heads], cos[None, :, None, :], sin[None, :, None, :])
        qq = jnp.concatenate([qr, q[:, :, rope_heads:]], axis=2)
        kk = jnp.concatenate([kr, k[:, :, rope_heads:]], axis=2)
        mask = jnp.arange(n)[None, :] < kv_lens[:, None]
        ref = np.asarray(jax.nn.dot_product_attention(qq, kk, v, mask=mask[:, None, None, :]))
        np.testing.assert_allclose(ours[0], ref[0], rtol=2e-3, atol=2e-3,
                                   err_msg=f"rope_heads={rope_heads}")
        np.testing.assert_allclose(ours[1, :200], ref[1, :200], rtol=2e-3, atol=2e-3)


def test_block_q_fits_non_pow2_buckets(rng):
    """N=768 (the 768-frame serving bucket) is not divisible by 512; the
    kernel must shrink the block instead of falling back to XLA."""
    assert pa._fit_block_q(768, 512) == 384
    assert pa._fit_block_q(1280, 512) == 320
    assert pa._fit_block_q(1536, 512) == 512
    # non-power-of-two divisors: 1664 = 128*13 gets 416 (4 cells), not 128
    assert pa._fit_block_q(1664, 512) == 416
    assert pa._fit_block_q(1664, 128) == 128
    assert pa._fit_block_q(1664, 1000) == 832
    # tiny/odd n with no multiple-of-16 divisor: still returns a divisor
    assert pa._fit_block_q(40, 512) == 40
    assert pa._fit_block_q(40, 32) == 8  # halving fallback: 32 -> 16 -> 8
    assert pa._fit_block_q(8, 512) == 8
    q = jnp.zeros((1, 768, 4, 64), jnp.bfloat16)
    assert pa.supported(q, q)

    b, n, h, dh = 1, 384, 2, 64  # 384 % 512 != 0, fits block 128
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([300], jnp.int32)
    ours = np.asarray(pa.mha_fullkv_rope(
        q, k, v, kv_lens, jnp.ones((n, dh)), jnp.zeros((n, dh)),
        rope_heads=0, interpret=True))
    mask = jnp.arange(n)[None, :] < kv_lens[:, None]
    ref = np.asarray(jax.nn.dot_product_attention(q, k, v, mask=mask[:, None, None, :]))
    np.testing.assert_allclose(ours[0, :300], ref[0, :300], rtol=2e-3, atol=2e-3)


def test_supported_gate():
    q = jnp.zeros((1, 1536, 16, 64), jnp.bfloat16)
    assert pa.supported(q, q)
    q2 = jnp.zeros((1, 1000, 16, 64), jnp.bfloat16)  # not divisible
    assert not pa.supported(q2, q2)
    q3 = jnp.zeros((1, 1536, 16, 32), jnp.bfloat16)  # dh unsupported
    assert not pa.supported(q3, q3)
    q4 = jnp.zeros((1, 8192, 16, 64), jnp.bfloat16)  # scores too big for VMEM
    assert not pa.supported(q4, q4)


def test_sdpa_nonprefix_mask_skips_length_path(monkeypatch, rng):
    """joint attention's [audio-prefix | all-True text] mask is not a length
    prefix; sdpa must NOT route it to the kv_lens Pallas kernel (round-1
    advisor high). We force the TPU dispatch on and plant a sentinel kernel."""
    from f5e_tts_tpu.ops import attention as att

    called = {"n": 0}

    def sentinel(q, k, v, kv_lens):
        called["n"] += 1
        return jnp.zeros_like(q)

    monkeypatch.setattr(att, "_backend_is_tpu", lambda: True)
    monkeypatch.setattr(pa, "mha_fullkv_ad", sentinel)

    b, n, h, dh = 1, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    # non-prefix mask: padded audio in the middle, valid text at the end
    mask = np.ones((b, n), bool)
    mask[:, 40:80] = False
    mask = jnp.asarray(mask)

    out = att.sdpa(q, q, q, mask=mask, prefix_mask=False)
    assert called["n"] == 0  # fell through to flash/XLA
    ref = jax.nn.dot_product_attention(q, q, q, mask=mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    # prefix masks still take the kernel path
    att.sdpa(q, q, q, mask=jnp.asarray(np.ones((b, n), bool)))
    assert called["n"] == 1


def test_flash_bwd_matches_reference_vjp(rng):
    """The fused Pallas backward must produce the same (dq, dk, dv) as
    differentiating the XLA reference attention."""
    b, n, h, dh = 2, 256, 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v, g = mk(), mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 150], jnp.int32)

    dq, dk, dv = pa.mha_fullkv_bwd(q, k, v, kv_lens, g, block_q=128,
                                   interpret=True)
    _, vjp = jax.vjp(lambda q_, k_, v_: pa._reference_attn(q_, k_, v_, kv_lens),
                     q, k, v)
    rdq, rdk, rdv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), rtol=2e-3, atol=2e-3)


def test_flash_bwd_rope_matches_reference_vjp(rng):
    """Rope-fused backward: rotation adjoint + per-head gating must match the
    XLA reference's grads, for all-heads and partial (pe_attn_head) rope."""
    from f5e_tts_tpu.ops.rope import rotary_cos_sin_half

    b, n, h, dh = 2, 256, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v, g = mk(), mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 200], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    for rope_heads in (h, 1):
        dq, dk, dv = pa.mha_fullkv_rope_bwd(q, k, v, kv_lens, cos, sin, g,
                                            rope_heads, block_q=128,
                                            interpret=True)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: pa._reference_rope_attn(q_, k_, v_, kv_lens,
                                                       cos, sin, rope_heads),
            q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dq rope_heads={rope_heads}")
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dk rope_heads={rope_heads}")
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dv rope_heads={rope_heads}")


def test_joint_kernel_matches_reference(rng):
    """MMDiT joint mask: padded audio prefix + always-valid text tail —
    the non-prefix mask the plain kv_lens kernel cannot express."""
    b, n_audio, nt, h, dh = 2, 192, 64, 2, 64
    n = n_audio + nt
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    audio_lens = jnp.asarray([n_audio, 100], jnp.int32)

    ours = pa.mha_fullkv_joint(q, k, v, audio_lens, n_audio, block_q=128,
                               interpret=True)
    ref = pa._reference_joint_attn(q, k, v, audio_lens, n_audio)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    # padded-audio columns must NOT influence row outputs: perturb them
    k2 = k.at[1, 100:n_audio].set(99.0)
    v2 = v.at[1, 100:n_audio].set(-99.0)
    ours2 = pa.mha_fullkv_joint(q, k2, v2, audio_lens, n_audio, block_q=128,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ours),
                               rtol=1e-5, atol=1e-5)


def test_joint_ad_grads_match_reference(rng):
    b, n_audio, nt, h, dh = 1, 128, 128, 2, 64
    n = n_audio + nt
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    audio_lens = jnp.asarray([70], jnp.int32)

    def loss_ref(q, k, v):
        return jnp.sum(pa._reference_joint_attn(q, k, v, audio_lens, n_audio) ** 2)

    # custom-vjp bwd (chunked XLA over the joint reference) vs direct grad
    _, vjp = jax.vjp(lambda q_, k_, v_: pa._reference_joint_attn(
        q_, k_, v_, audio_lens, n_audio), q, k, v)
    g = 2.0 * pa._reference_joint_attn(q, k, v, audio_lens, n_audio)
    rdq, rdk, rdv = vjp(g)
    dq, dk, dv = pa._joint_bwd(n_audio, (q, k, v, audio_lens), g)[:3]
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), rtol=2e-4, atol=2e-4)


def test_joint_pallas_bwd_matches_reference_vjp(rng):
    """The fused Pallas joint-mask backward (audio prefix + text tail) must
    match differentiating the XLA joint reference."""
    b, n_audio, nt, h, dh = 2, 192, 64, 2, 64
    n = n_audio + nt
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v, g = mk(), mk(), mk(), mk()
    audio_lens = jnp.asarray([n_audio, 100], jnp.int32)

    dq, dk, dv = pa.mha_fullkv_joint_bwd(q, k, v, audio_lens, g, n_audio,
                                         block_q=128, interpret=True)
    _, vjp = jax.vjp(lambda q_, k_, v_: pa._reference_joint_attn(
        q_, k_, v_, audio_lens, n_audio), q, k, v)
    rdq, rdk, rdv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), rtol=2e-3, atol=2e-3)


def test_packed_rope_matches_reference(rng):
    """Packed-heads forward (all heads per cell, zero HBM transposes) must
    match the XLA rope-attention reference, incl. partial pe_attn_head."""
    from f5e_tts_tpu.ops.rope import rotary_cos_sin_half

    b, n, h, dh = 2, 256, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 200], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    for rope_heads in (h, 1):
        ours = np.asarray(pa.mha_packed_rope(q, k, v, kv_lens, cos, sin,
                                             rope_heads, block_q=128,
                                             interpret=True))
        ref = np.asarray(pa._reference_rope_attn(q, k, v, kv_lens, cos, sin,
                                                 rope_heads))
        np.testing.assert_allclose(ours[0], ref[0], rtol=2e-3, atol=2e-3,
                                   err_msg=f"rope_heads={rope_heads}")
        np.testing.assert_allclose(ours[1, :200], ref[1, :200], rtol=2e-3,
                                   atol=2e-3)


def test_packed_rope_bwd_matches_reference_vjp(rng):
    """Packed-heads backward (fp32 scratch accumulation, bf16 outputs) must
    match differentiating the XLA reference — all-heads and partial rope, and
    at a block_q that exercises multi-block accumulation."""
    from f5e_tts_tpu.ops.rope import rotary_cos_sin_half

    b, n, h, dh = 2, 256, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v, g = mk(), mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 200], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    for rope_heads in (h, 1):
        dq, dk, dv = pa.mha_packed_rope_bwd(q, k, v, kv_lens, cos, sin, g,
                                            rope_heads, block_q=128,
                                            interpret=True)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: pa._reference_rope_attn(q_, k_, v_, kv_lens,
                                                       cos, sin, rope_heads),
            q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dq rope_heads={rope_heads}")
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dk rope_heads={rope_heads}")
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dv rope_heads={rope_heads}")


def test_packed_supported_gate():
    qt = jnp.zeros((32, 1664, 16, 64), jnp.bfloat16)  # Base training bucket
    assert pa.packed_supported(qt, block_q=512)
    assert pa.packed_supported(qt, bwd=True, block_q=256)
    q2 = jnp.zeros((1, 8192, 16, 128), jnp.bfloat16)
    assert not pa.packed_supported(q2, bwd=True)
    q3 = jnp.zeros((1, 1000, 16, 64), jnp.bfloat16)   # n not 128-multiple
    assert not pa.packed_supported(q3)


def test_bwd_supported_gate():
    q = jnp.zeros((1, 1536, 16, 64), jnp.bfloat16)
    assert pa.bwd_supported(q, q)
    assert pa.bwd_supported(q, q, rope=True)
    # the training bucket must fit at the 512-request (-> 416 at n=1664)
    qt = jnp.zeros((32, 1664, 16, 64), jnp.bfloat16)
    assert pa.bwd_supported(qt, qt, block_q=512, rope=True)
    q2 = jnp.zeros((1, 8192, 16, 128), jnp.bfloat16)  # blows the VMEM budget
    assert not pa.bwd_supported(q2, q2, rope=True)
    q3 = jnp.zeros((1, 1000, 16, 64), jnp.bfloat16)
    assert not pa.bwd_supported(q3, q3)


def test_chunked_rope_matches_reference(rng):
    """Head-chunked forward (head_chunk heads per cell, zero HBM transposes,
    operands in the packed (B, N, H*dh) layout) must match the XLA reference
    for every legal chunk size."""
    from f5e_tts_tpu.ops.rope import rotary_cos_sin_half

    b, n, h, dh = 2, 256, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 200], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = np.asarray(pa._reference_rope_attn(q, k, v, kv_lens, cos, sin, h))
    for hc in (2, 4):
        ours = np.asarray(pa.mha_chunked_rope(q, k, v, kv_lens, cos, sin, h,
                                              head_chunk=hc, block_q=128,
                                              interpret=True))
        np.testing.assert_allclose(ours[0], ref[0], rtol=2e-3, atol=2e-3,
                                   err_msg=f"hc={hc}")
        np.testing.assert_allclose(ours[1, :200], ref[1, :200], rtol=2e-3,
                                   atol=2e-3, err_msg=f"hc={hc}")


def test_chunked_rope_bwd_matches_reference_vjp(rng):
    """Head-chunked backward must match differentiating the XLA reference,
    at a block_q that exercises multi-block dK/dV accumulation."""
    from f5e_tts_tpu.ops.rope import rotary_cos_sin_half

    b, n, h, dh = 2, 256, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v, g = mk(), mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 200], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    _, vjp = jax.vjp(
        lambda q_, k_, v_: pa._reference_rope_attn(q_, k_, v_, kv_lens,
                                                   cos, sin, h), q, k, v)
    rdq, rdk, rdv = vjp(g)
    for hc in (2, 4):
        dq, dk, dv = pa.mha_chunked_rope_bwd(q, k, v, kv_lens, cos, sin, g, h,
                                             head_chunk=hc, block_q=128,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dq hc={hc}")
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dk hc={hc}")
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), rtol=2e-3,
                                   atol=2e-3, err_msg=f"dv hc={hc}")


def test_chunked_supported_gate():
    qt = jnp.zeros((32, 1664, 16, 64), jnp.bfloat16)  # Base training bucket
    assert pa.chunked_supported(qt, 16, 4, block_q=512)
    assert pa.chunked_supported(qt, 16, 4, block_q=512, bwd=True)
    assert pa.chunked_supported(qt, 0, 2)             # rope-off also legal
    # partial rope can't chunk (the per-chunk rope gate must be static)
    assert not pa.chunked_supported(qt, 1, 2)
    # single-head dh=64 chunk -> 64-lane window, Mosaic-illegal
    assert not pa.chunked_supported(qt, 16, 1)
    # chunk must divide heads
    assert not pa.chunked_supported(qt, 16, 3)
    q3 = jnp.zeros((1, 1000, 16, 64), jnp.bfloat16)   # n not 128-multiple
    assert not pa.chunked_supported(q3, 16, 4)
