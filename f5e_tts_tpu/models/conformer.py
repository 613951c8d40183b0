"""WeNet-style Conformer encoder + PPG extraction wrapper (frozen, inference).

reference: src/f5_tts/ppg/ — asr_model.py:222-244 (extract), wenet/transformer/
encoder.py:141-208 & 403-495 (ConformerEncoder), encoder_layer.py:130-268,
attention.py:134-222 (RelPositionMultiHeadedAttention, NO rel_shift),
convolution.py (GLU + depthwise + BN + swish), subsampling.py:68-120
(Conv2dSubsampling2), embedding.py:86-111 (RelPositionalEncoding),
cmvn.py (GlobalCMVN), ppg_model.py:58-169 (PPGModelWapper).

This is a frozen conditioning network: eval-mode only (dropout off, BN running
stats), pure function over ingested torch weights. The whole extraction is one
jitted graph: kaldi-fbank -> CMVN -> conv subsample -> N conformer layers ->
content linear -> (optional) phone-map projection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import nn as fnn
from f5e_tts_tpu.ops.kaldi import kaldi_fbank
from f5e_tts_tpu.utils.masks import lens_to_mask


@dataclass(frozen=True)
class ConformerConfig:
    input_dim: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    cnn_module_kernel: int = 15
    # wenet input_layer (encoder.py:103-114, fork naming): "linear" (1/1),
    # "conv2d" (1/2 in THIS fork — Conv2dSubsampling2), "conv2d4" (1/4),
    # "conv2d6" (1/6), "conv2d8" (1/8). "conv2d2" accepted as an alias of
    # "conv2d". Unknown names fail loudly at ingest/encode time.
    subsampling: str = "conv2d"
    max_pos: int = 5000


# (kernel, stride) per conv stage + which torch attr holds the output linear
# (subsampling.py: Conv2dSubsampling{2,4} use .out, {6,8} use .linear).
# rate/right_context drive the streaming chunk window
# (subsampling.py:16-254, encoder.py:328-332).
_SUBSAMPLING = {
    "linear": dict(convs=[], out_attr="out", rate=1, right_context=0),
    "conv2d": dict(convs=[(3, 2)], out_attr="out", rate=2, right_context=2),
    "conv2d2": dict(convs=[(3, 2)], out_attr="out", rate=2, right_context=2),
    "conv2d4": dict(convs=[(3, 2), (3, 2)], out_attr="out", rate=4, right_context=6),
    "conv2d6": dict(convs=[(3, 2), (5, 3)], out_attr="linear", rate=6, right_context=10),
    "conv2d8": dict(convs=[(3, 2), (3, 2), (3, 2)], out_attr="linear", rate=8,
                    right_context=14),
}


def subsampling_spec(name: str) -> dict:
    if name not in _SUBSAMPLING:
        raise ValueError(
            f"unsupported subsampling/input_layer {name!r}; supported: "
            f"{sorted(_SUBSAMPLING)} (reference subsampling.py:23-280)")
    return _SUBSAMPLING[name]


def subsampled_feat_dim(name: str, idim: int) -> int:
    """Frequency-axis size after the conv stack (the flatten Linear's fan-in
    is odim * this). Mirrors the reference's ((idim-1)//2 ...) chains."""
    f = idim
    for k, s in subsampling_spec(name)["convs"]:
        f = (f - (k - 1) - 1) // s + 1
    return f


def subsampled_time(name: str, t: int) -> int:
    """Time-axis length after the conv stack (the torch mask slice
    x_mask[:, :, :-(k-1):s] per stage)."""
    for k, s in subsampling_spec(name)["convs"]:
        t = (t - (k - 1) + s - 1) // s
    return t


def _sinus_table(d_model: int, max_len: int) -> np.ndarray:
    """Interleaved sin/cos abs table (embedding.py:36-44): pe[:,0::2]=sin."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """wenet forward_attention: fill -inf where masked, softmax, zero masked.

    mask: (B, S) key-padding mask, or (B, T, S) chunk mask
    (mask.py:116-186 add_optional_chunk_mask output)."""
    if mask is not None:
        m = mask[:, None, None, :] if mask.ndim == 2 else mask[:, None, :, :]
        scores = jnp.where(m, scores, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if mask is not None:
        attn = jnp.where(m, attn, 0.0)
    return attn


def _rel_attention(p, x, pos_emb, mask, heads: int, compute_dtype, x_q=None):
    """Transformer-XL style attention without rel_shift (attention.py:180-222).

    x_q: optional query slice (streaming forward_chunk queries only the new
    chunk while keys/values cover cache+chunk, encoder_layer.py:220-231)."""
    b, t, d = x.shape
    dk = d // heads

    def proj(pp, y):
        return fnn.linear(pp, y, compute_dtype).reshape(b, -1, heads, dk)

    q = proj(p["linear_q"], x if x_q is None else x_q)
    k = proj(p["linear_k"], x)
    v = proj(p["linear_v"], x)
    pos = fnn.linear(p["linear_pos"], pos_emb[None], compute_dtype).reshape(1, -1, heads, dk)

    qf = q.astype(jnp.float32)
    u = p["pos_bias_u"].astype(jnp.float32)  # (heads, dk)
    vb = p["pos_bias_v"].astype(jnp.float32)
    ac = jnp.einsum("bthd,bshd->bhts", qf + u[None, None], k.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    bd = jnp.einsum("bthd,zshd->bhts", qf + vb[None, None], pos.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    scores = (ac + bd) / math.sqrt(dk)
    attn = _masked_softmax(scores, mask)
    out = jnp.einsum("bhts,bshd->bthd", attn, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(b, -1, d).astype(compute_dtype)
    return fnn.linear(p["linear_out"], out, compute_dtype)


def _conv_module(p, x, mask, compute_dtype):
    """GLU pointwise -> depthwise k15 -> BN(eval) -> swish -> pointwise
    (convolution.py)."""
    if mask is not None:
        x = jnp.where(mask[:, :, None], x, 0.0).astype(x.dtype)
    h = fnn.linear(p["pw1"], x, compute_dtype)  # k=1 conv == linear
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g.astype(jnp.float32)).astype(a.dtype)
    dim = h.shape[-1]
    h = fnn.conv1d(p["dw"], h, groups=dim, padding=(p["dw"]["w"].shape[0] - 1) // 2,
                   compute_dtype=compute_dtype)
    # BatchNorm eval
    bn = p["bn"]
    hf = h.astype(jnp.float32)
    hf = (hf - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["g"] + bn["b"]
    h = hf * jax.nn.sigmoid(hf)  # swish
    h = fnn.linear(p["pw2"], h.astype(compute_dtype), compute_dtype)
    if mask is not None:
        h = jnp.where(mask[:, :, None], h, 0.0).astype(h.dtype)
    return h


def _ffn(p, x, compute_dtype):
    h = fnn.linear(p["w1"], x, compute_dtype)
    h = h.astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)  # swish activation (encoder config activation_type)
    return fnn.linear(p["w2"], h.astype(compute_dtype), compute_dtype)


def _conformer_layer(p, x, pos_emb, mask, heads, compute_dtype, mask_pad=None):
    """Macaron-FF -> MHA -> Conv -> FF -> final LN (encoder_layer.py:179-268).

    mask may be (B, S) padding or (B, T, S) chunk mask; the conv module always
    uses the plain padding mask (mask_pad, defaulting to mask when 2D)."""
    if mask_pad is None:
        mask_pad = mask if (mask is None or mask.ndim == 2) else None
    # macaron ff (scale 0.5)
    h = fnn.layernorm(p["norm_ff_macaron"], x, eps=1e-5)
    x = x + 0.5 * _ffn(p["ff_macaron"], h, compute_dtype)
    # attention
    h = fnn.layernorm(p["norm_mha"], x, eps=1e-5)
    x = x + _rel_attention(p["attn"], h, pos_emb, mask, heads, compute_dtype)
    # conv
    h = fnn.layernorm(p["norm_conv"], x, eps=1e-5)
    x = x + _conv_module(p["conv"], h, mask_pad, compute_dtype)
    # ff
    h = fnn.layernorm(p["norm_ff"], x, eps=1e-5)
    x = x + 0.5 * _ffn(p["ff"], h, compute_dtype)
    return fnn.layernorm(p["norm_final"], x, eps=1e-5)


def _subsample(params: dict, cfg: ConformerConfig, x: jnp.ndarray,
               mask: Optional[jnp.ndarray], compute_dtype):
    """CMVN'd feats -> embed output scaled by sqrt(d) (subsampling.py:23-280
    + the RelPositionalEncoding xscale). Returns (x, mask)."""
    b = x.shape[0]
    spec = subsampling_spec(cfg.subsampling)
    if spec["convs"]:
        # Conv2dSubsampling{2,4,6,8}: stacked VALID conv2d+ReLU stages then a
        # channel-major flatten linear (subsampling.py:68-280)
        x = x[:, :, :, None]  # NHWC: (B, T, F, 1)
        for i, (kk, ss) in enumerate(spec["convs"]):
            w = params["embed_convs"][i]["w"]  # (k, k, in, odim) HWIO
            x = jax.lax.conv_general_dilated(
                x.astype(compute_dtype), w.astype(compute_dtype),
                window_strides=(ss, ss), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = jnp.maximum(x + params["embed_convs"][i]["b"], 0.0)
            # torch mask slice x_mask[:, :, :-(k-1):s] per stage
            if mask is not None:
                mask = mask[:, : -(kk - 1) : ss]
        bt, tt, ff_, c = x.shape
        # torch flattens channel-major: transpose(1,2).view -> (c outer, f inner)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, tt, c * ff_)
        x = fnn.linear(params["embed_out"], x.astype(compute_dtype), compute_dtype)
    else:
        # LinearNoSubsampling: Linear + LayerNorm (subsampling.py:23-66)
        x = fnn.linear(params["embed_out"], x.astype(compute_dtype), compute_dtype)
        x = fnn.layernorm(params["embed_ln"], x, eps=1e-5).astype(compute_dtype)
    x = x.astype(jnp.float32) * math.sqrt(cfg.output_size)
    return x, mask


def subsequent_chunk_mask_np(size: int, chunk_size: int,
                             num_left_chunks: int = -1) -> np.ndarray:
    """(size, size) bool chunk-visibility mask (mask.py:78-113): row i sees
    columns [chunk_start - left, (i//chunk+1)*chunk)."""
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    ending = np.minimum((i // chunk_size + 1) * chunk_size, size)
    if num_left_chunks < 0:
        start = np.zeros_like(i)
    else:
        start = np.maximum((i // chunk_size - num_left_chunks) * chunk_size, 0)
    return (j >= start) & (j < ending)


def make_chunk_mask(pad_mask: jnp.ndarray, chunk_size: int,
                    num_left_chunks: int = -1) -> jnp.ndarray:
    """(B, T, T) = padding mask AND chunk mask, the add_optional_chunk_mask
    product (mask.py:116-186). chunk_size <= 0 means full context."""
    t = pad_mask.shape[1]
    if chunk_size <= 0:
        chunk_size = t
    cm = jnp.asarray(subsequent_chunk_mask_np(t, chunk_size, num_left_chunks))
    return pad_mask[:, None, :] & cm[None]


def dynamic_chunk_size(max_len: int, rng: np.random.Generator) -> int:
    """Sample a training chunk size the way the fork does: full context half
    the time, else [5, 11] for the 2x-subsampled encoder
    (mask.py:157-170, this fork's `chunk_size % 7 + 1 + 4` line)."""
    c = int(rng.integers(1, max_len))
    if c > max_len // 2:
        return max_len
    return c % 7 + 1 + 4


def sample_train_chunk_mask(cfg: ConformerConfig, t_frames: int,
                            rng: np.random.Generator) -> np.ndarray:
    """Host-side dynamic-chunk mask for one training batch (use_dynamic_chunk
    semantics): a (T', T') bool array fed to conformer_encode(chunk_mask=).
    Always returns a full-size array (all-True for full context) so the
    jitted train step keeps one signature."""
    tt = subsampled_time(cfg.subsampling, t_frames)
    c = dynamic_chunk_size(tt, rng)
    if c >= tt:
        return np.ones((tt, tt), bool)
    return subsequent_chunk_mask_np(tt, c)


def conformer_encode(
    params: dict,
    cfg: ConformerConfig,
    feats: jnp.ndarray,  # (B, T, 80) kaldi fbank
    feat_lens: jnp.ndarray,  # (B,)
    compute_dtype=jnp.float32,
    chunk_size: int = 0,  # >0: chunked attention (static/decoding chunk)
    num_left_chunks: int = -1,
    chunk_mask: Optional[jnp.ndarray] = None,  # (T', T') precomputed
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full encoder forward (encoder.py:141-208). Returns (out, out_lens).

    chunk_size > 0 applies the streaming chunk attention mask over the full
    utterance (static_chunk_size / decoding_chunk_size semantics of
    add_optional_chunk_mask, mask.py:116-186). chunk_mask passes a
    precomputed (T', T') visibility mask instead (dynamic-chunk training:
    sampling the size host-side keeps the jitted step to one compilation)."""
    b, t, f = feats.shape
    mask = lens_to_mask(feat_lens, t)

    x = (feats.astype(jnp.float32) - params["cmvn_mean"]) * params["cmvn_istd"]
    x, mask = _subsample(params, cfg, x, mask, compute_dtype)
    tt = x.shape[1]
    pos_emb = jnp.asarray(_sinus_table(cfg.output_size, cfg.max_pos))[:tt]

    if chunk_mask is not None:
        attn_mask = mask[:, None, :] & chunk_mask[None]
    elif chunk_size > 0:
        attn_mask = make_chunk_mask(mask, chunk_size, num_left_chunks)
    else:
        attn_mask = mask

    x = x.astype(compute_dtype)
    for layer_p in params["layers"]:
        x = _conformer_layer(layer_p, x, pos_emb, attn_mask, cfg.attention_heads,
                             compute_dtype, mask_pad=mask)
    x = fnn.layernorm(params["after_norm"], x, eps=1e-5)

    out_lens = jnp.sum(mask.astype(jnp.int32), axis=1)
    return x, out_lens


def conformer_forward_chunk(
    params: dict,
    cfg: ConformerConfig,
    feats: jnp.ndarray,  # (1, w, feat_dim) raw fbank chunk (w = decoding window)
    offset: int,
    required_cache_size: int,
    caches: Optional[dict] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, dict]:
    """One streaming chunk (encoder.py:210-291).

    caches: {"sub": (1, c, d) embed-output cache, "layers": [(1, c, d)] per
    layer}. Subsampling left context comes from overlapping input frames, not
    a cache (reference choice, encoder.py:308-320); the conv module runs on
    the chunk alone (non-causal convs zero-pad at chunk edges — the exact
    reference behavior for this fork's causal=False convs).
    Returns (encoder output for the new chunk, updated caches).
    """
    assert feats.shape[0] == 1, "streaming decode is single-utterance"
    x = (feats.astype(jnp.float32) - params["cmvn_mean"]) * params["cmvn_istd"]
    x, _ = _subsample(params, cfg, x, None, compute_dtype)

    sub_cache = caches["sub"] if caches else None
    if sub_cache is not None:
        cache_size = sub_cache.shape[1]
        x = jnp.concatenate([sub_cache, x], axis=1)
    else:
        cache_size = 0
    t_full = x.shape[1]

    # pos table indexed from the absolute start of the cached span
    # (encoder.py:257: position_encoding(offset - cache_size, xs.size(1)))
    start = offset - cache_size
    pos_emb = jnp.asarray(_sinus_table(cfg.output_size, cfg.max_pos))[
        start : start + t_full]

    if required_cache_size < 0:
        next_cache_start = 0
    elif required_cache_size == 0:
        next_cache_start = t_full
    else:
        next_cache_start = max(t_full - required_cache_size, 0)

    new_caches = {"sub": x[:, next_cache_start:], "layers": []}
    x = x.astype(compute_dtype)
    layer_caches = caches["layers"] if caches else [None] * len(params["layers"])
    for layer_p, att_cache in zip(params["layers"], layer_caches):
        x = _conformer_layer_chunk(layer_p, x, pos_emb, cfg.attention_heads,
                                   compute_dtype, att_cache)
        new_caches["layers"].append(x[:, next_cache_start:])
    y = fnn.layernorm(params["after_norm"], x, eps=1e-5)
    return y[:, cache_size:], new_caches


def _conformer_layer_chunk(p, x, pos_emb, heads, compute_dtype, output_cache):
    """Streaming variant of _conformer_layer (encoder_layer.py:179-268):
    queries only the new chunk; the cached span of the output is reused
    verbatim from the previous call's cache."""
    h = fnn.layernorm(p["norm_ff_macaron"], x, eps=1e-5)
    x1 = x + 0.5 * _ffn(p["ff_macaron"], h, compute_dtype)
    h = fnn.layernorm(p["norm_mha"], x1, eps=1e-5)
    if output_cache is None:
        x_q, res = None, x1
    else:
        chunk = x.shape[1] - output_cache.shape[1]
        x_q, res = h[:, -chunk:], x1[:, -chunk:]
    att = _rel_attention(p["attn"], h, pos_emb, None, heads, compute_dtype,
                         x_q=x_q)
    x2 = res + att
    h = fnn.layernorm(p["norm_conv"], x2, eps=1e-5)
    x2 = x2 + _conv_module(p["conv"], h, None, compute_dtype)
    h = fnn.layernorm(p["norm_ff"], x2, eps=1e-5)
    x2 = x2 + 0.5 * _ffn(p["ff"], h, compute_dtype)
    x2 = fnn.layernorm(p["norm_final"], x2, eps=1e-5)
    if output_cache is not None:
        x2 = jnp.concatenate([output_cache, x2], axis=1)
    return x2


def conformer_encode_chunk_by_chunk(
    params: dict,
    cfg: ConformerConfig,
    feats: jnp.ndarray,  # (1, T, feat_dim)
    decoding_chunk_size: int,
    num_decoding_left_chunks: int = -1,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Streaming-style full decode (encoder.py:293-355): feed overlapping
    windows chunk by chunk, carrying the attention caches."""
    assert decoding_chunk_size > 0
    spec = subsampling_spec(cfg.subsampling)
    context = spec["right_context"] + 1
    stride = spec["rate"] * decoding_chunk_size
    window = (decoding_chunk_size - 1) * spec["rate"] + context
    required = decoding_chunk_size * num_decoding_left_chunks

    caches, offset, outs = None, 0, []
    for cur in range(0, feats.shape[1] - context + 1, stride):
        end = min(cur + window, feats.shape[1])
        y, caches = conformer_forward_chunk(params, cfg, feats[:, cur:end],
                                            offset, required, caches,
                                            compute_dtype)
        outs.append(y)
        offset += y.shape[1]
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# PPG wrapper (ppg_model.py:58-169)
# ---------------------------------------------------------------------------


@dataclass
class PPGExtractor:
    """Frozen PPG extractor: 16 kHz audio or kaldi fbank -> 256-d PPG @ 20 ms."""

    params: dict
    cfg: ConformerConfig
    output_type: str = "ppg"  # "ppg" | "map"
    map_mix_ratio: float = 1.0
    phn_center: Optional[np.ndarray] = None  # (601, 256)
    ce_w: Optional[np.ndarray] = None  # (601, 256)
    ce_b: Optional[np.ndarray] = None  # (601,)
    frame_length: int = 20
    mel_frame_shift: int = 10
    compute_dtype: object = jnp.float32

    def mel_to_ppg(self, feats: jnp.ndarray, feat_lens: jnp.ndarray):
        """(B, T, 80) 10ms fbank -> ((B, T', 256) PPG, (B,) true lens).

        reference: ppg_model.py:132-141 — true_len = mel_len / (20/10),
        clamped to the encoder output length; padding zeroed.
        """
        enc, _ = conformer_encode(self.params, self.cfg, feats, feat_lens,
                                  self.compute_dtype)
        ppg = fnn.linear(self.params["content_linear"], enc, self.compute_dtype)
        ppg = ppg.astype(jnp.float32)
        ratio = self.frame_length // self.mel_frame_shift
        true_len = jnp.minimum((feat_lens // ratio).astype(jnp.int32), ppg.shape[1])
        ppg = self._to_target(ppg, true_len)
        return ppg, true_len

    def _to_target(self, ppg, true_len):
        """Optional phone-center mapping (ppg_model.py:112-131)."""
        if self.output_type == "map":
            logit = ppg @ jnp.asarray(self.ce_w).T + jnp.asarray(self.ce_b)
            probs = jax.nn.softmax(logit, axis=-1)
            mapped = probs @ jnp.asarray(self.phn_center)
            if self.map_mix_ratio == 1.0:
                ppg = mapped
            else:
                ppg = ppg * (1 - self.map_mix_ratio) + mapped * self.map_mix_ratio
        keep = lens_to_mask(true_len, ppg.shape[1])
        return jnp.where(keep[:, :, None], ppg, 0.0)

    def audio_to_ppg(self, wav: jnp.ndarray, wav_lens: Optional[jnp.ndarray] = None):
        """16 kHz waveform (B, T) -> PPG (ppg_model.py:162-169)."""
        feats = kaldi_fbank(wav)
        if wav_lens is None:
            feat_lens = jnp.full((feats.shape[0],), feats.shape[1], jnp.int32)
        else:
            win, hop = 400, 160
            feat_lens = jnp.maximum((wav_lens - win) // hop + 1, 0).astype(jnp.int32)
        return self.mel_to_ppg(feats, feat_lens)


# ---------------------------------------------------------------------------
# weight ingestion (wenet torch checkpoint -> pytree)
# ---------------------------------------------------------------------------


def load_cmvn_file(path: str):
    """Parse a wenet/kaldi global_cmvn stats file (JSON or kaldi text).

    JSON: {"mean_stat": [...], "var_stat": [...], "frame_num": N}
    Returns (mean, istd) float32 arrays.
    """
    import json

    with open(path, "r", encoding="utf-8") as f:
        txt = f.read()
    try:
        d = json.loads(txt)
        mean_stat = np.asarray(d["mean_stat"], np.float64)
        var_stat = np.asarray(d["var_stat"], np.float64)
        n = float(d["frame_num"])
    except json.JSONDecodeError:
        # kaldi text matrix: two rows [mean_stat... count] [var_stat... 0]
        rows = [r for r in txt.replace("[", " ").replace("]", " ").split("\n") if r.strip()]
        r1 = np.asarray([float(x) for x in rows[-2].split()], np.float64)
        r2 = np.asarray([float(x) for x in rows[-1].split()], np.float64)
        mean_stat, n = r1[:-1], r1[-1]
        var_stat = r2[:-1]
    mean = mean_stat / n
    var = np.maximum(var_stat / n - mean**2, 1e-20)
    return mean.astype(np.float32), (1.0 / np.sqrt(var)).astype(np.float32)


def conformer_from_torch(sd: Dict[str, np.ndarray], cfg: ConformerConfig,
                         cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None) -> dict:
    """Map a wenet ASR checkpoint's encoder (+content linear) to our pytree."""

    def lin(k):
        p = {"w": np.ascontiguousarray(sd[f"{k}.weight"].T)}
        if f"{k}.bias" in sd:
            p["b"] = sd[f"{k}.bias"]
        return p

    def ln(k):
        return {"g": sd[f"{k}.weight"], "b": sd[f"{k}.bias"]}

    params: dict = {}
    if cmvn is not None:
        params["cmvn_mean"], params["cmvn_istd"] = cmvn
    elif "encoder.global_cmvn.mean" in sd:
        params["cmvn_mean"] = sd["encoder.global_cmvn.mean"]
        params["cmvn_istd"] = sd["encoder.global_cmvn.istd"]
    else:
        params["cmvn_mean"] = np.zeros((cfg.input_dim,), np.float32)
        params["cmvn_istd"] = np.ones((cfg.input_dim,), np.float32)

    spec = subsampling_spec(cfg.subsampling)
    if spec["convs"]:
        # torch Sequential(conv, relu, conv, relu, ...) -> indices 0, 2, 4;
        # Conv2d (odim, in, k, k) -> HWIO (k, k, in, odim)
        convs = []
        for i, (kk, _ss) in enumerate(spec["convs"]):
            wk = f"encoder.embed.conv.{2 * i}.weight"
            if wk not in sd:
                raise KeyError(
                    f"checkpoint has no {wk}: its conv stack does not match "
                    f"input_layer={cfg.subsampling!r} "
                    f"({len(spec['convs'])} conv stages expected)")
            w = sd[wk]
            assert w.shape[-1] == kk, (
                f"conv stage {i} kernel {w.shape[-1]} != {kk} expected for "
                f"input_layer={cfg.subsampling!r}")
            convs.append({"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                          "b": sd[f"encoder.embed.conv.{2 * i}.bias"]})
        if f"encoder.embed.conv.{2 * len(spec['convs'])}.weight" in sd:
            raise KeyError(
                f"checkpoint has MORE conv stages than input_layer="
                f"{cfg.subsampling!r} expects ({len(spec['convs'])})")
        params["embed_convs"] = convs
        out_key = ("encoder.embed.out.0" if spec["out_attr"] == "out"
                   else "encoder.embed.linear")
        params["embed_out"] = lin(out_key)
        want = cfg.output_size * subsampled_feat_dim(cfg.subsampling, cfg.input_dim)
        got = params["embed_out"]["w"].shape[0]
        assert got == want, (
            f"subsampling flatten linear fan-in {got} != {want} expected for "
            f"input_layer={cfg.subsampling!r} idim={cfg.input_dim}")
    else:
        params["embed_out"] = lin("encoder.embed.out.0")
        params["embed_ln"] = ln("encoder.embed.out.1")

    layers = []
    for i in range(cfg.num_blocks):
        k = f"encoder.encoders.{i}"
        layers.append({
            "norm_ff_macaron": ln(f"{k}.norm_ff_macaron"),
            "ff_macaron": {"w1": lin(f"{k}.feed_forward_macaron.w_1"),
                           "w2": lin(f"{k}.feed_forward_macaron.w_2")},
            "norm_mha": ln(f"{k}.norm_mha"),
            "attn": {
                "linear_q": lin(f"{k}.self_attn.linear_q"),
                "linear_k": lin(f"{k}.self_attn.linear_k"),
                "linear_v": lin(f"{k}.self_attn.linear_v"),
                "linear_out": lin(f"{k}.self_attn.linear_out"),
                "linear_pos": {"w": np.ascontiguousarray(sd[f"{k}.self_attn.linear_pos.weight"].T)},
                "pos_bias_u": sd[f"{k}.self_attn.pos_bias_u"],
                "pos_bias_v": sd[f"{k}.self_attn.pos_bias_v"],
            },
            "norm_conv": ln(f"{k}.norm_conv"),
            "conv": {
                # pointwise convs are k=1: (out, in, 1) -> linear (in, out)
                "pw1": {"w": np.ascontiguousarray(sd[f"{k}.conv_module.pointwise_conv1.weight"][:, :, 0].T),
                        "b": sd[f"{k}.conv_module.pointwise_conv1.bias"]},
                "dw": {"w": np.ascontiguousarray(sd[f"{k}.conv_module.depthwise_conv.weight"].transpose(2, 1, 0)),
                       "b": sd[f"{k}.conv_module.depthwise_conv.bias"]},
                "bn": {"g": sd[f"{k}.conv_module.norm.weight"],
                       "b": sd[f"{k}.conv_module.norm.bias"],
                       "mean": sd[f"{k}.conv_module.norm.running_mean"],
                       "var": sd[f"{k}.conv_module.norm.running_var"]},
                "pw2": {"w": np.ascontiguousarray(sd[f"{k}.conv_module.pointwise_conv2.weight"][:, :, 0].T),
                        "b": sd[f"{k}.conv_module.pointwise_conv2.bias"]},
            },
            "norm_ff": ln(f"{k}.norm_ff"),
            "ff": {"w1": lin(f"{k}.feed_forward.w_1"), "w2": lin(f"{k}.feed_forward.w_2")},
            "norm_final": ln(f"{k}.norm_final"),
        })
    params["layers"] = layers
    params["after_norm"] = ln("encoder.after_norm")
    params["content_linear"] = lin("linear")  # asr_model.py:77-78
    return params


def load_ppg_extractor(ckpt_path: str, config_path: str, *, output_type: str = "ppg",
                       map_mix_ratio: float = 1.0, phn_center_path: Optional[str] = None,
                       ce_layer_path: Optional[str] = None) -> PPGExtractor:
    """Build a frozen extractor from the reference artifacts (33.pt + train.yaml
    + global_cmvn [+ phn_center.npy + ce_layer.pkl]). ppg_model.py:11-28."""
    import os

    import torch
    import yaml

    with open(config_path, "r", encoding="utf-8") as f:
        conf = yaml.safe_load(f)
    enc = conf.get("encoder_conf", {})
    cfg = ConformerConfig(
        input_dim=conf.get("input_dim", 80),
        output_size=enc.get("output_size", 256),
        attention_heads=enc.get("attention_heads", 4),
        linear_units=enc.get("linear_units", 2048),
        num_blocks=enc.get("num_blocks", 12),
        cnn_module_kernel=enc.get("cnn_module_kernel", 15),
        subsampling=enc.get("input_layer", "conv2d2"),
    )
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy().astype(np.float32) for k, v in sd.items() if hasattr(v, "numpy")}

    cmvn = None
    cmvn_file = conf.get("cmvn_file")
    if cmvn_file and not os.path.exists(cmvn_file):
        cmvn_file = os.path.join(os.path.dirname(ckpt_path), "global_cmvn")
    if cmvn_file and os.path.exists(cmvn_file):
        cmvn = load_cmvn_file(cmvn_file)

    params = conformer_from_torch(sd, cfg, cmvn)
    params = jax.tree.map(jnp.asarray, params)

    phn_center = ce_w = ce_b = None
    if output_type == "map":
        import pickle

        phn_center = np.load(phn_center_path).astype(np.float32)
        with open(ce_layer_path, "rb") as f:
            ce = pickle.load(f)
        ce_w, ce_b = np.asarray(ce["w"], np.float32), np.asarray(ce["b"], np.float32)

    return PPGExtractor(params=params, cfg=cfg, output_type=output_type,
                        map_mix_ratio=map_mix_ratio, phn_center=phn_center,
                        ce_w=ce_w, ce_b=ce_b)


def init_conformer(key, cfg: ConformerConfig) -> dict:
    """Random init (tests / from-scratch PPG training)."""
    keys = iter(jax.random.split(key, 12 + cfg.num_blocks * 12))
    d, lu = cfg.output_size, cfg.linear_units

    def lin(k, i, o, bias=True):
        return fnn.linear_init(k, i, o, bias=bias)

    params = {
        "cmvn_mean": jnp.zeros((cfg.input_dim,), jnp.float32),
        "cmvn_istd": jnp.ones((cfg.input_dim,), jnp.float32),
        "after_norm": fnn.layernorm_init(d),
        "content_linear": lin(next(keys), d, d),
    }
    spec = subsampling_spec(cfg.subsampling)
    if spec["convs"]:
        convs = []
        for i, (kk, _ss) in enumerate(spec["convs"]):
            cin = 1 if i == 0 else d
            convs.append({
                "w": jax.random.normal(next(keys), (kk, kk, cin, d), jnp.float32) * 0.1,
                "b": jnp.zeros((d,), jnp.float32),
            })
        params["embed_convs"] = convs
        params["embed_out"] = lin(
            next(keys), d * subsampled_feat_dim(cfg.subsampling, cfg.input_dim), d)
    else:
        params["embed_out"] = lin(next(keys), cfg.input_dim, d)
        params["embed_ln"] = fnn.layernorm_init(d)
    layers = []
    for _ in range(cfg.num_blocks):
        layers.append({
            "norm_ff_macaron": fnn.layernorm_init(d),
            "ff_macaron": {"w1": lin(next(keys), d, lu), "w2": lin(next(keys), lu, d)},
            "norm_mha": fnn.layernorm_init(d),
            "attn": {
                "linear_q": lin(next(keys), d, d),
                "linear_k": lin(next(keys), d, d),
                "linear_v": lin(next(keys), d, d),
                "linear_out": lin(next(keys), d, d),
                "linear_pos": lin(next(keys), d, d, bias=False),
                "pos_bias_u": jax.random.normal(next(keys), (cfg.attention_heads, d // cfg.attention_heads)) * 0.02,
                "pos_bias_v": jax.random.normal(next(keys), (cfg.attention_heads, d // cfg.attention_heads)) * 0.02,
            },
            "norm_conv": fnn.layernorm_init(d),
            "conv": {
                "pw1": lin(next(keys), d, 2 * d),
                "dw": fnn.conv1d_init(next(keys), d, d, kernel=cfg.cnn_module_kernel, groups=d),
                "bn": {"g": jnp.ones((d,)), "b": jnp.zeros((d,)),
                       "mean": jnp.zeros((d,)), "var": jnp.ones((d,))},
                "pw2": lin(next(keys), d, d),
            },
            "norm_ff": fnn.layernorm_init(d),
            "ff": {"w1": lin(next(keys), d, lu), "w2": lin(next(keys), lu, d)},
            "norm_final": fnn.layernorm_init(d),
        })
    params["layers"] = layers
    return params
