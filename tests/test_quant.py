"""Int8 W8A8 serving quantization (ops/quant.py): numeric bounds + wiring."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import CFMConfig, DiTConfig
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops.quant import (int8_linear, quantize_dit_params,
                                   quantize_linear_params)

ARCH = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                 text_dim=32, conv_layers=1, dropout=0.0)


def test_int8_linear_matches_manual_dequant():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(48).astype(np.float32))}
    q = quantize_linear_params(p)
    assert q["w_q"].dtype == jnp.int8 and q["w_scale"].shape == (48,)
    x = jnp.asarray(rng.standard_normal((3, 7, 32)).astype(np.float32))
    y = np.asarray(int8_linear(q, x))

    # manual: quantize activations the same way, integer matmul, rescale
    xf = np.asarray(x)
    s_x = np.maximum(np.abs(xf).max(-1, keepdims=True) / 127.0, 1e-12)
    x_q = np.clip(np.rint(xf / s_x), -127, 127).astype(np.int32)
    ref = (x_q @ np.asarray(q["w_q"], np.int32)) * s_x * np.asarray(q["w_scale"])
    ref = ref + np.asarray(p["b"])
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_int8_linear_error_bound():
    """W8A8 vs fp32 linear: relative error stays in the expected int8 regime."""
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32) * 0.05)}
    q = quantize_linear_params(p)
    x = jnp.asarray(rng.standard_normal((4, 16, 128)).astype(np.float32))
    y_fp = np.asarray(fnn.linear(p, x))
    y_q = np.asarray(fnn.linear(q, x))  # routes through the w_q branch
    rel = np.abs(y_q - y_fp).mean() / np.abs(y_fp).mean()
    assert rel < 0.02, rel


def test_quantized_sampler_close_to_fp32():
    """Full folded-CFG sampler with an int8 DiT trunk: output stays close to
    the fp32 path (random weights; bounds the quant noise through 8 ODE
    steps x 2 layers) and the prompt region is preserved exactly."""
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, 8)
    params["proj_out"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["proj_out"]["w"].shape)
    qparams = quantize_dit_params(params)
    # structure: fused qkv present, originals gone, int8 leaves
    assert "to_qkv" in qparams["blocks"]["attn"]
    assert "to_q" not in qparams["blocks"]["attn"]
    assert qparams["blocks"]["ff1"]["w_q"].dtype == jnp.int8

    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((1, 40, 20)).astype(np.float32) * 0.3)
    inputs = fcfm.prepare_inputs(cond, jnp.asarray([40]), jnp.asarray([100]), 128,
                                 text_ids=jnp.asarray([[1, 2, 3, 4, -1, -1]]))
    kw = dict(steps=8, cfg_strength=2.0, sway_coef=-1.0, use_mask=True,
              compute_dtype=jnp.float32)
    out_fp, _ = fcfm.sample(params, state, ARCH, CFMConfig(), inputs,
                            jax.random.PRNGKey(1), **kw)
    out_q, _ = fcfm.sample(qparams, state, ARCH, CFMConfig(), inputs,
                           jax.random.PRNGKey(1), **kw)
    out_fp, out_q = np.asarray(out_fp), np.asarray(out_q)
    assert np.isfinite(out_q).all()
    # prompt region: copied from cond in both paths, bitwise equal
    np.testing.assert_array_equal(out_q[0, :40], out_fp[0, :40])
    # generated region: close in a relative sense
    gen_fp, gen_q = out_fp[0, 40:100], out_q[0, 40:100]
    cos = (gen_fp * gen_q).sum() / (np.linalg.norm(gen_fp) * np.linalg.norm(gen_q))
    assert cos > 0.99, cos
    rel = np.abs(gen_q - gen_fp).mean() / (np.abs(gen_fp).mean() + 1e-9)
    assert rel < 0.2, rel


def test_quantize_rejects_non_dit():
    import pytest

    with pytest.raises(ValueError, match="DiT"):
        quantize_dit_params({"not_blocks": {}})


def test_api_quantize_flag():
    from f5e_tts_tpu.api import F5TTS
    import pytest

    with pytest.raises(ValueError, match="quantize"):
        F5TTS(model="F5TTS_Small", quantize="int4")


def test_quantize_mmdit_and_unett_forward_close():
    """int8 quantization of the non-flagship backbones: forward stays close
    to fp32 on random weights; dispatch routes by backbone name."""
    from f5e_tts_tpu.config import MMDiTConfig, UNetTConfig
    from f5e_tts_tpu.models import backbone as fbb
    from f5e_tts_tpu.ops.quant import quantize_backbone_params

    rng = np.random.default_rng(3)
    b, n, nt, vocab = 2, 16, 8, 20

    cases = [
        ("UNetT", UNetTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2,
                              mel_dim=10, text_dim=None, conv_layers=1,
                              pe_attn_head=1, text_mask_padding=False,
                              dropout=0.0)),
        ("MMDiT", MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2,
                              mel_dim=10, dropout=0.0)),
    ]
    for name, arch in cases:
        params, state = fbb.init_backbone(jax.random.PRNGKey(0), arch, vocab)
        if name == "MMDiT":  # AdaLN-zero: randomize gates + head so the
            # trunk is live (see test_gpipe for the DiT analogue)
            for blk in (params["blocks"], params["final_block"]):
                am = blk["attn_norm_x"]
                blk["attn_norm_x"] = {**am, "w": 0.1 * jax.random.normal(
                    jax.random.PRNGKey(7), am["w"].shape)}
            po = params["proj_out"]
            params["proj_out"] = {**po, "w": 0.05 * jax.random.normal(
                jax.random.PRNGKey(8), po["w"].shape)}
        qparams = quantize_backbone_params(params, name)
        x = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32))
        cond = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32))
        text = jnp.asarray(rng.integers(0, vocab, (b, nt)).astype(np.int32))
        time = jnp.asarray([0.3, 0.7], np.float32)
        f = jnp.zeros((b,), bool)
        kw = dict(x=x, cond=cond, text_ids=text, time=time, drop_audio_cond=f,
                  drop_text=f, drop_ppg=f, compute_dtype=jnp.float32)
        pred_fp, _ = fbb.forward_train(params, state, arch, **kw)
        pred_q, _ = fbb.forward_train(qparams, state, arch, **kw)
        pred_fp, pred_q = np.asarray(pred_fp), np.asarray(pred_q)
        assert np.isfinite(pred_q).all(), name
        cos = (pred_fp * pred_q).sum() / max(
            np.linalg.norm(pred_fp) * np.linalg.norm(pred_q), 1e-9)
        assert cos > 0.99, (name, cos)
        # int8 leaves actually present (not a silent no-op)
        if name == "UNetT":
            assert qparams["first_half"]["ff1"]["w_q"].dtype == jnp.int8
        else:
            assert qparams["blocks"]["ff1_x"]["w_q"].dtype == jnp.int8
            assert qparams["blocks"]["attn"]["to_q_c"]["w_q"].dtype == jnp.int8


def test_quantize_backbone_dispatch_rejects_unknown():
    import pytest

    from f5e_tts_tpu.ops.quant import quantize_backbone_params

    with pytest.raises(ValueError, match="backbone"):
        quantize_backbone_params({}, "Transformer")
