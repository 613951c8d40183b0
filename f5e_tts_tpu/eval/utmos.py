"""Native UTMOS (UTokyo-SaruLab MOS predictor) — strong-learner inference.

reference: src/f5_tts/eval/eval_utmos.py:18-20 loads
`tarepan/SpeechMOS:v1.2.0 utmos22_strong` via torch.hub and scores each wav;
the underlying architecture (UTMOS paper, SpeechMOS reimplementation) is
  wav resampled to 16 kHz
  -> wav2vec2-base SSL encoder (7-layer strided conv feature extractor,
     feature projection, conv positional embedding, 12 post-norm
     transformer layers)
  -> concat(SSL features, broadcast domain embedding, broadcast judge
     embedding) over the feature dim
  -> 1-layer BiLSTM
  -> Linear -> ReLU -> Linear frame scores, time-mean, x2 + 3.

TPU redesign: pure-functional pytree params, strided convs as tap-unrolled
matmuls (ops/nn.conv1d — XLA lowers 1-D convs poorly on TPU), BiLSTM as two
`lax.scan`s. Every stage is oracle-tested offline against randomly
initialized torch twins (`transformers.Wav2Vec2Model`, `torch.nn.LSTM`) in
tests/test_utmos.py; real released weights remain gated on artifact presence
(they cannot ship with this repo).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import nn as fnn


@dataclass(frozen=True)
class W2V2Config:
    """wav2vec2-base shape (transformers Wav2Vec2Config defaults)."""

    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 3, 2)
    conv_bias: bool = False
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ff: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    eps: float = 1e-5


@dataclass(frozen=True)
class UTMOSConfig:
    ssl: W2V2Config = field(default_factory=W2V2Config)
    domain_dim: int = 128
    judge_dim: int = 128
    blstm_hidden: int = 512
    proj_hidden: int = 2048
    # inference-time fixed ids (SpeechMOS strong: main domain, mean listener)
    domain_id: int = 0
    judge_id: int = 288
    score_scale: float = 2.0
    score_shift: float = 3.0


# ---------------------------------------------------------------------------
# wav2vec2 encoder
# ---------------------------------------------------------------------------


def _group_norm_per_channel(p: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """GroupNorm(groups == channels): per-channel normalization over time.
    x: (B, N, C)."""
    mu = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + eps)
    return xn * p["scale"] + p["bias"]


def w2v2_feature_extractor(params: dict, cfg: W2V2Config, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, S) raw 16 kHz samples -> (B, T, conv_dim[-1]) latent frames."""
    x = wav[:, :, None]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        x = fnn.conv1d(params["conv"][i], x, padding=0, stride=s)
        if i == 0:
            x = _group_norm_per_channel(params["gn"], x, cfg.eps)
        x = fnn.gelu(x)
    return x


def _mha(p: dict, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, d = x.shape
    dh = d // heads
    q = fnn.linear(p["q"], x).reshape(b, n, heads, dh)
    k = fnn.linear(p["k"], x).reshape(b, n, heads, dh)
    v = fnn.linear(p["v"], x).reshape(b, n, heads, dh)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(dh).astype(x.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
    return fnn.linear(p["out"], out)


def w2v2_encode(params: dict, cfg: W2V2Config, wav: jnp.ndarray) -> jnp.ndarray:
    """Full wav2vec2 forward: (B, S) -> (B, T, hidden).

    Matches transformers.Wav2Vec2Model(config).eval() (post-norm / base
    variant, no masking) — parity locked in tests/test_utmos.py.
    """
    x = w2v2_feature_extractor(params["fe"], cfg, wav)
    x = fnn.layernorm(params["fp_norm"], x, eps=cfg.eps)
    x = fnn.linear(params["fp"], x)

    # conv positional embedding: grouped conv k=pos_conv_kernel, SAME-ish
    # padding k//2 each side; even kernel -> drop the trailing frame
    pos = fnn.conv1d(params["pos_conv"], x, groups=cfg.pos_conv_groups,
                     padding=cfg.pos_conv_kernel // 2)
    if cfg.pos_conv_kernel % 2 == 0:
        pos = pos[:, :-1]
    x = x + fnn.gelu(pos)
    x = fnn.layernorm(params["enc_norm"], x, eps=cfg.eps)

    for lp in params["layers"]:
        x = x + _mha(lp["attn"], x, cfg.heads)
        x = fnn.layernorm(lp["norm1"], x, eps=cfg.eps)
        h = fnn.gelu(fnn.linear(lp["ff1"], x))
        x = x + fnn.linear(lp["ff2"], h)
        x = fnn.layernorm(lp["norm2"], x, eps=cfg.eps)
    return x


# ---------------------------------------------------------------------------
# BiLSTM (torch.nn.LSTM semantics, batch_first, bidirectional)
# ---------------------------------------------------------------------------


def _lstm_scan(w_ih: jnp.ndarray, w_hh: jnp.ndarray, b: jnp.ndarray,
               x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """One direction. x: (B, N, In) -> (B, N, H). Gate order i,f,g,o (torch)."""
    hdim = w_hh.shape[1]

    def cell(carry, xt):
        h, c = carry
        gates = xt @ w_ih.T + h @ w_hh.T + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    bsz = x.shape[0]
    init = (jnp.zeros((bsz, hdim), x.dtype), jnp.zeros((bsz, hdim), x.dtype))
    xs = jnp.swapaxes(x, 0, 1)  # (N, B, In)
    _, hs = jax.lax.scan(cell, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def blstm(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, In) -> (B, N, 2H), forward ++ backward (torch bidirectional)."""
    fwd = _lstm_scan(p["w_ih"], p["w_hh"], p["b_ih"] + p["b_hh"], x, reverse=False)
    bwd = _lstm_scan(p["w_ih_r"], p["w_hh_r"], p["b_ih_r"] + p["b_hh_r"], x, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


# ---------------------------------------------------------------------------
# UTMOS head + full scorer
# ---------------------------------------------------------------------------


def utmos_forward(params: dict, cfg: UTMOSConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, S) 16 kHz wav -> (B,) MOS scores."""
    feat = w2v2_encode(params["ssl"], cfg.ssl, wav)
    b, n, _ = feat.shape
    dom = params["domain_emb"][cfg.domain_id]
    jud = params["judge_emb"][cfg.judge_id]
    x = jnp.concatenate(
        [feat,
         jnp.broadcast_to(dom, (b, n, dom.shape[-1])),
         jnp.broadcast_to(jud, (b, n, jud.shape[-1]))], axis=-1)
    x = blstm(params["blstm"], x)
    h = jax.nn.relu(fnn.linear(params["proj1"], x))
    frame = fnn.linear(params["proj2"], h)[..., 0]  # (B, N)
    return frame.mean(axis=1) * cfg.score_scale + cfg.score_shift


# ---------------------------------------------------------------------------
# init (tests / smoke) and torch converters
# ---------------------------------------------------------------------------


def init_w2v2(key, cfg: W2V2Config) -> dict:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    conv = []
    d_in = 1
    for d_out, k in zip(cfg.conv_dim, cfg.conv_kernel):
        p = fnn.conv1d_init(next(ki), d_in, d_out, k, bias=cfg.conv_bias)
        conv.append(p)
        d_in = d_out
    layers = []
    for _ in range(cfg.layers):
        layers.append({
            "attn": {n: fnn.linear_init(next(ki), cfg.hidden, cfg.hidden)
                     for n in ("q", "k", "v", "out")},
            "norm1": fnn.layernorm_init(cfg.hidden),
            "ff1": fnn.linear_init(next(ki), cfg.hidden, cfg.ff),
            "ff2": fnn.linear_init(next(ki), cfg.ff, cfg.hidden),
            "norm2": fnn.layernorm_init(cfg.hidden),
        })
    return {
        "fe": {"conv": conv,
               "gn": {"scale": jnp.ones((cfg.conv_dim[0],)),
                      "bias": jnp.zeros((cfg.conv_dim[0],))}},
        "fp_norm": fnn.layernorm_init(cfg.conv_dim[-1]),
        "fp": fnn.linear_init(next(ki), cfg.conv_dim[-1], cfg.hidden),
        "pos_conv": fnn.conv1d_init(next(ki), cfg.hidden, cfg.hidden,
                                    cfg.pos_conv_kernel, groups=cfg.pos_conv_groups),
        "enc_norm": fnn.layernorm_init(cfg.hidden),
        "layers": layers,
    }


def init_utmos(key, cfg: UTMOSConfig, num_domains: int = 3,
               num_judges: int = 3000) -> dict:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    in_dim = cfg.ssl.hidden + cfg.domain_dim + cfg.judge_dim
    h = cfg.blstm_hidden

    def lstm_dir(key, reverse):
        a, b, c, d = jax.random.split(key, 4)
        bound = 1.0 / np.sqrt(h)
        u = lambda kk, shape: jax.random.uniform(kk, shape, minval=-bound, maxval=bound)
        sfx = "_r" if reverse else ""
        return {f"w_ih{sfx}": u(a, (4 * h, in_dim)), f"w_hh{sfx}": u(b, (4 * h, h)),
                f"b_ih{sfx}": u(c, (4 * h,)), f"b_hh{sfx}": u(d, (4 * h,))}

    return {
        "ssl": init_w2v2(k1, cfg.ssl),
        "domain_emb": 0.02 * jax.random.normal(k2, (num_domains, cfg.domain_dim)),
        "judge_emb": 0.02 * jax.random.normal(k3, (num_judges, cfg.judge_dim)),
        "blstm": {**lstm_dir(k4, False), **lstm_dir(k4, True)},
        "proj1": fnn.linear_init(k5, 2 * h, cfg.proj_hidden),
        "proj2": fnn.linear_init(k6, cfg.proj_hidden, 1),
    }


def _t(a) -> np.ndarray:
    return np.asarray(a.detach().cpu().numpy() if hasattr(a, "detach") else a,
                      np.float32)


def w2v2_from_hf(sd: Dict[str, np.ndarray], cfg: W2V2Config) -> dict:
    """Convert a transformers Wav2Vec2Model state dict (base / post-norm
    variant). Handles both old (weight_g/weight_v) and new
    (parametrizations.weight.original0/1) weight-norm layouts of the
    positional conv."""
    sd = {k: _t(v) for k, v in sd.items()}

    def lin(prefix):
        p = {"w": sd[f"{prefix}.weight"].T}
        if f"{prefix}.bias" in sd:
            p["b"] = sd[f"{prefix}.bias"]
        return p

    def ln(prefix):
        return {"g": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}

    conv = []
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]  # (out, in, k)
        p = {"w": np.ascontiguousarray(w.transpose(2, 1, 0))}  # (k, in, out)
        if f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            p["b"] = sd[f"feature_extractor.conv_layers.{i}.conv.bias"]
        conv.append(p)
    gn = {"scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
          "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"]}

    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
    else:
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    # torch weight-norm over dims (0,1) of (out, in/groups, k): per-k norm
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (out, in/groups, k)
    # grouped-conv layout: ops/nn expects (k, cin_g, out) with out grouped
    # contiguously; torch groups slice the OUT dim the same way, so a plain
    # transpose lines the groups up.
    pos = {"w": np.ascontiguousarray(w.transpose(2, 1, 0)),
           "b": sd["encoder.pos_conv_embed.conv.bias"]}

    layers = []
    for i in range(cfg.layers):
        pre = f"encoder.layers.{i}"
        layers.append({
            "attn": {"q": lin(f"{pre}.attention.q_proj"),
                     "k": lin(f"{pre}.attention.k_proj"),
                     "v": lin(f"{pre}.attention.v_proj"),
                     "out": lin(f"{pre}.attention.out_proj")},
            "norm1": ln(f"{pre}.layer_norm"),
            "ff1": lin(f"{pre}.feed_forward.intermediate_dense"),
            "ff2": lin(f"{pre}.feed_forward.output_dense"),
            "norm2": ln(f"{pre}.final_layer_norm"),
        })
    return {
        "fe": {"conv": conv, "gn": gn},
        "fp_norm": ln("feature_projection.layer_norm"),
        "fp": lin("feature_projection.projection"),
        "pos_conv": pos,
        "enc_norm": ln("encoder.layer_norm"),
        "layers": layers,
    }


def utmos_from_torch(sd: Dict[str, np.ndarray], cfg: UTMOSConfig,
                     ssl_prefix: str = "wav2vec2.",
                     strict: bool = True) -> dict:
    """Convert a SpeechMOS-style UTMOS22 strong checkpoint.

    Expects the SSL subtree under `ssl_prefix` with transformers naming, plus
    domain/judge embeddings, a bidirectional LSTM (torch naming
    weight_ih_l0[_reverse] etc.) and the two projection linears. Raises
    KeyError on naming mismatch when strict (caller may fall back to the
    torchscript path, eval/scorers.load_utmos)."""
    sd = {k: _t(v) for k, v in sd.items()}
    ssl_sd = {k[len(ssl_prefix):]: v for k, v in sd.items()
              if k.startswith(ssl_prefix)}

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
        if strict:
            raise KeyError(f"none of {cands} in checkpoint")
        return None

    lstm = {
        "w_ih": find("blstm.weight_ih_l0", "lstm.weight_ih_l0"),
        "w_hh": find("blstm.weight_hh_l0", "lstm.weight_hh_l0"),
        "b_ih": find("blstm.bias_ih_l0", "lstm.bias_ih_l0"),
        "b_hh": find("blstm.bias_hh_l0", "lstm.bias_hh_l0"),
        "w_ih_r": find("blstm.weight_ih_l0_reverse", "lstm.weight_ih_l0_reverse"),
        "w_hh_r": find("blstm.weight_hh_l0_reverse", "lstm.weight_hh_l0_reverse"),
        "b_ih_r": find("blstm.bias_ih_l0_reverse", "lstm.bias_ih_l0_reverse"),
        "b_hh_r": find("blstm.bias_hh_l0_reverse", "lstm.bias_hh_l0_reverse"),
    }
    return {
        "ssl": w2v2_from_hf(ssl_sd, cfg.ssl),
        "domain_emb": find("domain_emb.weight", "domain_embedding.weight"),
        "judge_emb": find("judge_emb.weight", "judge_embedding.weight"),
        "blstm": lstm,
        "proj1": {"w": find("projection.0.weight", "proj1.weight").T,
                  "b": find("projection.0.bias", "proj1.bias")},
        "proj2": {"w": find("projection.2.weight", "projection.3.weight",
                            "proj2.weight").T,
                  "b": find("projection.2.bias", "projection.3.bias",
                            "proj2.bias")},
    }


def make_native_utmos_scorer(params: dict, cfg: UTMOSConfig):
    """Returns score(path)->float: the eval_utmos.py per-file loop (exact
    audio length — the frame mean is length-sensitive, so no padding)."""
    fwd = jax.jit(lambda p, w: utmos_forward(p, cfg, w))

    def score(path: str) -> float:
        from f5e_tts_tpu.infer.audio import read_wav, resample

        wav, sr = read_wav(path)
        wav = resample(wav.astype(np.float32), sr, 16_000)
        return float(fwd(params, jnp.asarray(wav[None]))[0])

    return score
