"""Core NN primitives: pure functions over parameter dicts.

Conventions:
- activations are feature-last: (B, N, D)
- Linear params: {"w": (in, out), "b": (out,)}  (torch stores (out, in); the
  checkpoint loader transposes)
- Conv1d params: {"w": (k, in/groups, out), "b": (out,)}  (torch stores
  (out, in/groups, k); loader transposes)
- norm weights fp32; matmuls run in the caller-chosen compute dtype with fp32
  accumulation (preferred_element_type).

Initializers mirror torch defaults (kaiming-uniform fan_in for linear/conv,
N(0,1) for embeddings) so from-scratch training matches the reference recipe.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": _uniform(kw, (d_in, d_out), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def linear_zero_init(d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    """Zero init (AdaLN-zero / proj_out, reference: src/f5_tts/model/backbones/dit.py:273-283)."""
    p = {"w": jnp.zeros((d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def embedding_init(key, num: int, dim: int, dtype=jnp.float32):
    """torch.nn.Embedding default init: N(0, 1)."""
    return {"w": jax.random.normal(key, (num, dim), dtype)}


def conv1d_init(key, d_in: int, d_out: int, kernel: int, groups: int = 1, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Conv1d default init: U(±1/sqrt(in/groups * k))."""
    kw, kb = jax.random.split(key)
    fan_in = (d_in // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (kernel, d_in // groups, d_out), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def rmsnorm_init(dim: int, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype)}


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------


def _mm_precision(dtype):
    """fp32 matmuls must request HIGHEST (XLA's default silently drops to
    ~bf16 passes); bf16 inputs use the native single MXU pass — HIGHEST there
    would force a slow multi-pass algorithm."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def linear(p, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    if "w_q" in p:  # int8-quantized weights (ops/quant.py, serving opt-in)
        from f5e_tts_tpu.ops.quant import int8_linear

        return int8_linear(p, x, compute_dtype)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32, precision=_mm_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype if compute_dtype is None else compute_dtype)


def embedding(p, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


def conv1d(
    p,
    x: jnp.ndarray,
    groups: int = 1,
    padding="SAME",
    dilation: int = 1,
    stride: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """1D conv over (B, N, D_in) -> (B, N_out, D_out).

    TPU note: XLA lowers 1-D convolutions extremely poorly on this target
    (measured ~100x slower than the equivalent matmuls), so the conv is
    expressed as a tap-unrolled sum of shifted slices:
      depthwise -> K shift-multiply-accumulates on the VPU,
      grouped   -> K batched (G, Cin, Cout/G) einsums on the MXU,
      dense     -> K (D_in, D_out) matmuls on the MXU.
    padding: int | (lo, hi); 'SAME' maps to k//2 for odd k.
    """
    w = p["w"]  # (K, D_in/groups, D_out)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    k, cin_g, d_out = w.shape
    b, n, d_in = x.shape

    if isinstance(padding, str):
        assert padding == "SAME" and k % 2 == 1
        pad_lo = pad_hi = dilation * (k - 1) // 2
    elif isinstance(padding, int):
        pad_lo = pad_hi = padding
    else:
        pad_lo, pad_hi = padding
    x_pad = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    n_out = (x_pad.shape[1] - dilation * (k - 1) - 1) // stride + 1

    def tap(i):
        # stride rides the slice step — taps stay matmuls on the MXU
        return x_pad[:, i * dilation : i * dilation + (n_out - 1) * stride + 1 : stride, :]

    acc = jnp.zeros((b, n_out, d_out), jnp.float32)
    if groups == d_in and cin_g == 1:
        # depthwise: pure VPU shift-MAC
        for i in range(k):
            acc = acc + tap(i).astype(jnp.float32) * w[i, 0, :].astype(jnp.float32)
    elif groups == 1:
        prec = _mm_precision(x.dtype)
        for i in range(k):
            acc = acc + jnp.matmul(
                tap(i), w[i],
                preferred_element_type=jnp.float32, precision=prec)
    else:
        g = groups
        cout_g = d_out // g
        xg = x_pad.reshape(b, x_pad.shape[1], g, cin_g)
        wg = w.reshape(k, cin_g, g, cout_g)
        prec = _mm_precision(x.dtype)
        for i in range(k):
            acc = acc + jnp.einsum(
                "bngc,cgj->bngj",
                xg[:, i * dilation : i * dilation + (n_out - 1) * stride + 1 : stride],
                wg[i],
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(b, n_out, d_out)

    if "b" in p:
        acc = acc + p["b"].astype(jnp.float32)
    return acc.astype(x.dtype)


def layernorm(p: Optional[dict], x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm in fp32; p=None means elementwise_affine=False."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm(p, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm (reference: src/f5_tts/model/modules.py:275-294), fp32 variance."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32)).astype(x.dtype)


def conv_transpose1d(p, x: jnp.ndarray, stride: int, padding: int = 0,
                     compute_dtype=None) -> jnp.ndarray:
    """1D transposed conv over (B, N, C_in) -> (B, (N-1)*stride - 2*padding + K, C_out).

    p["w"] is stored PRE-FLIPPED in (K, C_in, C_out) layout (the checkpoint
    loader flips torch's ConvTranspose1d (in, out, K) kernel), so the op is
    zero-stuffing + a regular tap-unrolled conv1d — both TPU-fast paths.
    """
    w = p["w"]
    k = w.shape[0]
    b, n, c = x.shape
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    # zero-stuff: (B, N, C) -> (B, (N-1)*stride + 1, C)
    if stride > 1:
        z = jnp.zeros((b, n, stride - 1, c), x.dtype)
        x = jnp.concatenate([x[:, :, None, :], z], axis=2).reshape(b, n * stride, c)
        x = x[:, : (n - 1) * stride + 1]
    pad = k - 1 - padding
    return conv1d({"w": w, **({"b": p["b"]} if "b" in p else {})}, x,
                  padding=(pad, pad), compute_dtype=compute_dtype)


def conv_transpose1d_init(key, d_in: int, d_out: int, kernel: int, dtype=jnp.float32):
    """torch ConvTranspose1d default init: U(±1/sqrt(out * k / groups))...
    actually fan_in = out_channels * k for transposed; keep torch's rule."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_out * kernel)
    return {
        "w": _uniform(kw, (kernel, d_in, d_out), bound, dtype),
        "b": _uniform(kb, (d_out,), bound, dtype),
    }


def batchnorm_init(dim: int):
    """BatchNorm1d params + running state (torch defaults: eps 1e-5, momentum 0.1)."""
    return (
        {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)},
        {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32),
         "count": jnp.zeros((), jnp.int32)},
    )


def batchnorm(p, state, x: jnp.ndarray, training: bool, momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over features of (B, N, D); stats pooled over (B, N).

    Returns (y, new_state). In eval mode state passes through unchanged.
    Matches torch.nn.BatchNorm1d applied to (B, D, N) channels.
    """
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.var(xf, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y.astype(x.dtype), new_state


def dropout(rng, x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    if not training or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def gelu(x: jnp.ndarray, approximate: str = "none") -> jnp.ndarray:
    """GELU. approximate='none' = exact erf (torch default); 'tanh' = tanh approx."""
    xf = x.astype(jnp.float32)
    if approximate == "tanh":
        y = jax.nn.gelu(xf, approximate=True)
    else:
        y = jax.nn.gelu(xf, approximate=False)
    return y.astype(x.dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


# ---------------------------------------------------------------------------
# positional tables (reference: src/f5_tts/model/modules.py:149-219)
# ---------------------------------------------------------------------------


def sinus_time_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (b,) -> (b, dim): [sin | cos] halves.

    reference: src/f5_tts/model/modules.py:149-161 (SinusPositionEmbedding).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0, theta_rescale_factor: float = 1.0) -> np.ndarray:
    """Absolute sinusoidal table (end, dim) = [cos(dim/2) | sin(dim/2)] concat.

    Used additively on text embeddings (reference: src/f5_tts/model/modules.py:196-207,
    consumed at src/f5_tts/model/backbones/dit.py:73-76). NTK-rescalable.
    """
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


def get_pos_embed_indices(start: jnp.ndarray, length: int, max_pos: int, scale=1.0) -> jnp.ndarray:
    """(b,) start + scaled arange, clipped to max_pos-1
    (reference: src/f5_tts/model/modules.py:210-219)."""
    scale = scale * jnp.ones_like(start, dtype=jnp.float32)
    pos = start[:, None] + (jnp.arange(length, dtype=jnp.float32)[None, :] * scale[:, None]).astype(start.dtype)
    return jnp.minimum(pos, max_pos - 1)
