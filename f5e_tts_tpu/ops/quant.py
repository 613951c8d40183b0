"""Int8 (W8A8, dynamic per-token activation scales) serving quantization.

TPU rationale: the v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate
(394 vs 197 TOPS). The NFE-folded sampler is compute-bound at ~75% of bf16
peak (BENCHMARKS.md), so the only latency lever left below NFE reduction is
cheaper FLOPs. This quantizes the four large per-block matmuls of the DiT
trunk (fused qkv, attention out, ff1, ff2 — ~2/3 of sampler FLOPs);
attention scores/values, norms, modulation, and the vocoder stay bf16.

Scheme: weights per-output-channel symmetric int8 (scale = max|w|/127 over
the contraction axis, computed once at engine build); activations per-token
symmetric int8 computed on the fly (one VPU max-reduce + rescale per matmul).
EXPERIMENTAL and opt-in (`F5TTS(quantize="int8")`): quality impact on real
released weights is unmeasured in this offline environment — tests bound the
numeric deviation vs the bf16 path on random weights.

reference: no TRT int8 path exists for this model family
(runtime/triton_trtllm builds fp16 TRT-LLM engines) — this is a
TPU-native extension, not a parity feature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_linear_params(p: dict) -> dict:
    """{"w": (..., d_in, d_out), ["b"]} -> {"w_q" int8, "w_scale" f32, ["b"]}.

    Works on stacked (depth, d_in, d_out) scan weights too: the scale is
    per (layer, out-channel), max over the contraction axis (-2)."""
    w = np.asarray(p["w"], np.float32)
    scale = np.abs(w).max(axis=-2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = {"w_q": jnp.asarray(w_q), "w_scale": jnp.asarray(np.squeeze(scale, -2))}
    if "b" in p:
        out["b"] = jnp.asarray(np.asarray(p["b"], np.float32))
    return out


def int8_linear(p: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """W8A8 matmul: dynamic per-token activation quant, s32 accumulation.

    p["w_q"]: (d_in, d_out) int8 — or (L, d_in, d_out) under lax.scan, where
    the leading L axis is sliced away by scan before this runs."""
    out_dtype = x.dtype if compute_dtype is None else compute_dtype
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.clip(jnp.rint(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, p["w_q"],
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_x * p["w_scale"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_dit_params(params: dict) -> dict:
    """Quantize the DiT trunk's big matmuls for serving.

    Pre-fuses to_q/k/v into to_qkv (the forward's runtime fusion branch,
    models/dit.py:316-324, is skipped when 'to_qkv' is already present), then
    converts to_qkv / to_out / ff1 / ff2 to int8 params. Everything else
    (embeddings, AdaLN modulation, norms, proj_out) stays float — they are
    a few % of FLOPs and the most precision-sensitive."""
    if "blocks" not in params or "attn" not in params.get("blocks", {}):
        raise ValueError("int8 quantization currently supports the DiT backbone only")
    params = dict(params)
    blocks = dict(params["blocks"])
    attn = dict(blocks["attn"])

    if "to_qkv" not in attn:
        qkv = {"w": jnp.concatenate(
            [attn["to_q"]["w"], attn["to_k"]["w"], attn["to_v"]["w"]], axis=-1)}
        if "b" in attn["to_q"]:
            qkv["b"] = jnp.concatenate(
                [attn["to_q"]["b"], attn["to_k"]["b"], attn["to_v"]["b"]], axis=-1)
        attn["to_qkv"] = qkv
        for k in ("to_q", "to_k", "to_v"):
            attn.pop(k)
    attn["to_qkv"] = quantize_linear_params(attn["to_qkv"])
    attn["to_out"] = quantize_linear_params(attn["to_out"])
    blocks["attn"] = attn
    blocks["ff1"] = quantize_linear_params(blocks["ff1"])
    blocks["ff2"] = quantize_linear_params(blocks["ff2"])
    params["blocks"] = blocks
    return params


def quantize_mmdit_params(params: dict) -> dict:
    """Quantize MMDiT's big matmuls: joint-attention q/k/v for BOTH streams,
    out projections, and the per-stream FF pairs. Kept unfused (joint
    attention reads to_q/to_k/to_v + *_c separately, ops/attention.py:313-396).
    AdaLN modulation / embeddings / norms / proj_out stay float."""
    big = ("to_q", "to_k", "to_v", "to_q_c", "to_k_c", "to_v_c",
           "to_out", "to_out_c")

    def quant_block(blk: dict) -> dict:
        blk = dict(blk)
        attn = dict(blk["attn"])
        for k in big:
            if k in attn:
                attn[k] = quantize_linear_params(attn[k])
        blk["attn"] = attn
        for k in ("ff1_x", "ff2_x", "ff1_c", "ff2_c"):
            if k in blk:
                blk[k] = quantize_linear_params(blk[k])
        return blk

    params = dict(params)
    params["blocks"] = quant_block(params["blocks"])
    params["final_block"] = quant_block(params["final_block"])
    return params


def quantize_unett_params(params: dict) -> dict:
    """Quantize UNetT's big matmuls in both scan halves: attention q/k/v/out,
    the FF pair, and (second half) the skip concat projection."""
    def quant_half(half: dict) -> dict:
        half = dict(half)
        attn = dict(half["attn"])
        for k in ("to_q", "to_k", "to_v", "to_out"):
            attn[k] = quantize_linear_params(attn[k])
        half["attn"] = attn
        for k in ("ff1", "ff2", "skip_proj"):
            if k in half:
                half[k] = quantize_linear_params(half[k])
        return half

    params = dict(params)
    params["first_half"] = quant_half(params["first_half"])
    params["second_half"] = quant_half(params["second_half"])
    return params


def quantize_backbone_params(params: dict, backbone: str) -> dict:
    """Dispatch on the config's backbone name ("DiT" / "MMDiT" / "UNetT")."""
    if backbone == "DiT":
        return quantize_dit_params(params)
    if backbone == "MMDiT":
        return quantize_mmdit_params(params)
    if backbone == "UNetT":
        return quantize_unett_params(params)
    raise ValueError(f"int8 quantization: unknown backbone {backbone!r}")
