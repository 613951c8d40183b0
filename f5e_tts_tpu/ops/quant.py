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
