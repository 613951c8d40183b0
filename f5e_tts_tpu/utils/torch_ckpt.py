"""Torch checkpoint ingestion: reference .safetensors/.pt -> our param pytrees.

Mirrors the reference loading semantics (reference: src/f5_tts/infer/
utils_infer.py:185-227): safetensors hold EMA-only weights; .pt training dicts
hold {model_state_dict, ema_model_state_dict, ...}; EMA keys carry an
"ema_model." prefix plus non-tensor "initted"/"step" entries; legacy
mel-frontend buffer keys are dropped.

Layout conversions:
- torch Linear weight (out, in)        -> ours (in, out)       [transpose]
- torch Conv1d weight (out, in/g, k)   -> ours (k, in/g, out)  [transpose(2,1,0)]
- GRN gamma/beta (1, 1, D)             -> (D,)
- per-block tensors are stacked along a leading depth axis (lax.scan layout)
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from f5e_tts_tpu.config import DiTConfig
from f5e_tts_tpu.ops.rope import (half_split_perm, permute_qk_bias, permute_qk_weight,
                                  unpermute_qk_bias, unpermute_qk_weight)


_DROP_KEYS = (
    "initted",
    "step",
    "mel_spec.mel_stft.mel_scale.fb",
    "mel_spec.mel_stft.spectrogram.window",
)


def load_torch_state_dict(path: str, use_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint into a flat {key: numpy array} dict.

    Handles .safetensors (EMA-only export) and .pt training checkpoints.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
        if use_ema:
            sd = {k.replace("ema_model.", ""): v for k, v in sd.items()}
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        if use_ema and "ema_model_state_dict" in ckpt:
            sd = {
                k.replace("ema_model.", ""): v
                for k, v in ckpt["ema_model_state_dict"].items()
                if k not in ("initted", "step")
            }
        else:
            sd = ckpt.get("model_state_dict", ckpt)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()
            if k.split(".")[-1] not in ("num_batches_tracked",) and k not in _DROP_KEYS}


def _lin(sd, key):
    p = {"w": sd[f"{key}.weight"].T}
    if f"{key}.bias" in sd:
        p["b"] = sd[f"{key}.bias"]
    return p


def _conv(sd, key):
    p = {"w": sd[f"{key}.weight"].transpose(2, 1, 0)}
    if f"{key}.bias" in sd:
        p["b"] = sd[f"{key}.bias"]
    return p


def _ln(sd, key):
    return {"g": sd[f"{key}.weight"], "b": sd[f"{key}.bias"]}


def _convnext_v2(sd, key):
    return {
        "dwconv": _conv(sd, f"{key}.dwconv"),
        "norm": _ln(sd, f"{key}.norm"),
        "pwconv1": _lin(sd, f"{key}.pwconv1"),
        "grn": {"gamma": sd[f"{key}.grn.gamma"].reshape(-1), "beta": sd[f"{key}.grn.beta"].reshape(-1)},
        "pwconv2": _lin(sd, f"{key}.pwconv2"),
    }


def dit_from_torch(sd: Dict[str, np.ndarray], cfg: DiTConfig, prefix: str = "transformer."):
    """Map a reference DiT state dict to our (params, state) pytrees.

    Key names follow the torch module tree (reference: dit.py:183-271,
    modules.py:610-641). Returns numpy pytrees; cast/shard at call site.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    params: dict = {}
    state: dict = {}

    params["time_embed"] = {
        "mlp1": _lin(sd, "time_embed.time_mlp.0"),
        "mlp2": _lin(sd, "time_embed.time_mlp.2"),
    }

    n_text_blocks = len({m.group(1) for k in sd if (m := re.match(r"text_embed\.text_blocks\.(\d+)\.", k))})
    params["text_embed"] = {
        "embed": {"w": sd["text_embed.text_embed.weight"]},
        "blocks": [_convnext_v2(sd, f"text_embed.text_blocks.{i}") for i in range(n_text_blocks)],
    }

    if cfg.ppg.use_ppg and "ppg_embed.ppg_proj.0.weight" in sd:
        # Sequential indices (reference dit.py:121-138): 0 Linear, 2/6/10 Conv1d,
        # 3/7/11 BatchNorm1d, 15 Linear
        bn_params, bn_states = [], []
        for idx in (3, 7, 11):
            bn_params.append({"g": sd[f"ppg_embed.ppg_proj.{idx}.weight"],
                              "b": sd[f"ppg_embed.ppg_proj.{idx}.bias"]})
            bn_states.append({"mean": sd[f"ppg_embed.ppg_proj.{idx}.running_mean"],
                              "var": sd[f"ppg_embed.ppg_proj.{idx}.running_var"],
                              "count": np.zeros((), np.int32)})
        params["ppg_embed"] = {
            "pre": _lin(sd, "ppg_embed.ppg_proj.0"),
            "convs": [_conv(sd, f"ppg_embed.ppg_proj.{i}") for i in (2, 6, 10)],
            "bns": bn_params,
            "post": _lin(sd, "ppg_embed.ppg_proj.15"),
        }
        state["ppg_bn"] = bn_states

    params["input_embed"] = {
        "proj": _lin(sd, "input_embed.proj"),
        "conv1": _conv(sd, "input_embed.conv_pos_embed.conv1d.0"),
        "conv2": _conv(sd, "input_embed.conv_pos_embed.conv1d.2"),
    }

    depth = len({m.group(1) for k in sd if (m := re.match(r"transformer_blocks\.(\d+)\.", k))})
    assert depth == cfg.depth, f"checkpoint depth {depth} != config depth {cfg.depth}"

    def _qk_lin(key):
        """q/k projections are stored in half-split rope layout (see
        ops/rope.py): per-head output features permuted so the TPU-fast
        rotation applies. Attention outputs are bit-identical to the
        interleaved reference convention."""
        p = {"w": permute_qk_weight(sd[f"{key}.weight"].T, cfg.heads)}
        if f"{key}.bias" in sd:
            p["b"] = permute_qk_bias(sd[f"{key}.bias"], cfg.heads)
        return p

    blocks = []
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        blk = {
            "attn_norm": _lin(sd, f"{b}.attn_norm.linear"),
            "attn": {
                "to_q": _qk_lin(f"{b}.attn.to_q"),
                "to_k": _qk_lin(f"{b}.attn.to_k"),
                "to_v": _lin(sd, f"{b}.attn.to_v"),
                "to_out": _lin(sd, f"{b}.attn.to_out.0"),
            },
            # FeedForward: Sequential(Sequential(Linear, GELU), Dropout, Linear)
            # -> keys ff.ff.0.0 and ff.ff.2 (reference modules.py:342-353)
            "ff1": _lin(sd, f"{b}.ff.ff.0.0"),
            "ff2": _lin(sd, f"{b}.ff.ff.2"),
        }
        if cfg.qk_norm == "rms_norm":
            perm = half_split_perm(cfg.dim_head)
            blk["attn"]["q_norm"] = {"g": np.ascontiguousarray(sd[f"{b}.attn.q_norm.weight"][perm])}
            blk["attn"]["k_norm"] = {"g": np.ascontiguousarray(sd[f"{b}.attn.k_norm.weight"][perm])}
        blocks.append(blk)
    import jax

    params["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *blocks)

    if cfg.long_skip_connection:
        params["long_skip"] = {"w": sd["long_skip_connection.weight"].T}

    params["norm_out"] = _lin(sd, "norm_out.linear")
    params["proj_out"] = _lin(sd, "proj_out")

    if cfg.codebook.use_codebook and "quantizer.vars" in sd:
        q = {"vars": sd["quantizer.vars"]}
        if "quantizer.weight_proj.weight" in sd:
            q["weight_proj"] = {"layer_0": _lin(sd, "quantizer.weight_proj")}
        else:
            layers = sorted({int(m.group(1)) for k in sd
                             if (m := re.match(r"quantizer\.weight_proj\.(\d+)\.", k))})
            q["weight_proj"] = {}
            for j, idx in enumerate(layers):
                q["weight_proj"][f"layer_{j}"] = _lin(sd, f"quantizer.weight_proj.{idx}")
        params["quantizer"] = q

    return params, state


def unett_from_torch(sd: Dict[str, np.ndarray], cfg, prefix: str = "transformer."):
    """Map a reference UNetT (E2-TTS) state dict to our (params, state).

    Torch module tree (reference: unett.py:106-250): layers.{i} is a
    ModuleList [skip_proj, attn_norm(RMSNorm.g), attn, ff_norm(RMSNorm.g), ff];
    skip_proj exists only in the later half. q/k projections are permuted to
    the half-split rope layout like the DiT loader.
    """
    import jax

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def qk_lin(key):
        p = {"w": permute_qk_weight(sd[f"{key}.weight"].T, cfg.heads)}
        if f"{key}.bias" in sd:
            p["b"] = permute_qk_bias(sd[f"{key}.bias"], cfg.heads)
        return p

    params: dict = {
        "time_embed": {"mlp1": _lin(sd, "time_embed.time_mlp.0"),
                       "mlp2": _lin(sd, "time_embed.time_mlp.2")},
        "input_embed": {
            "proj": _lin(sd, "input_embed.proj"),
            "conv1": _conv(sd, "input_embed.conv_pos_embed.conv1d.0"),
            "conv2": _conv(sd, "input_embed.conv_pos_embed.conv1d.2"),
        },
    }
    n_text_blocks = len({m.group(1) for k in sd
                         if (m := re.match(r"text_embed\.text_blocks\.(\d+)\.", k))})
    params["text_embed"] = {
        "embed": {"w": sd["text_embed.text_embed.weight"]},
        "blocks": [_convnext_v2(sd, f"text_embed.text_blocks.{i}") for i in range(n_text_blocks)],
    }

    def one_layer(i, later_half):
        base = f"layers.{i}"
        layer = {
            "attn_norm": {"g": sd[f"{base}.1.g"]},
            "attn": {
                "to_q": qk_lin(f"{base}.2.to_q"),
                "to_k": qk_lin(f"{base}.2.to_k"),
                "to_v": _lin(sd, f"{base}.2.to_v"),
                "to_out": _lin(sd, f"{base}.2.to_out.0"),
            },
            "ff_norm": {"g": sd[f"{base}.3.g"]},
            "ff1": _lin(sd, f"{base}.4.ff.0.0"),
            "ff2": _lin(sd, f"{base}.4.ff.2"),
        }
        if later_half and f"{base}.0.weight" in sd:
            layer["skip_proj"] = {"w": sd[f"{base}.0.weight"].T}
        return layer

    half = cfg.depth // 2
    first = [one_layer(i, False) for i in range(half)]
    second = [one_layer(i + half, True) for i in range(half)]
    params["first_half"] = jax.tree.map(lambda *xs: np.stack(xs), *first)
    params["second_half"] = jax.tree.map(lambda *xs: np.stack(xs), *second)
    params["norm_out"] = {"g": sd["norm_out.g"]}
    params["proj_out"] = _lin(sd, "proj_out")
    return params, {}


def unett_to_torch(params, state, cfg, prefix: str = "transformer.") -> Dict[str, np.ndarray]:
    """Export UNetT params back to reference torch layout (inverse of
    unett_from_torch)."""
    import jax

    out: Dict[str, np.ndarray] = {}

    def put_lin(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(p["b"]))

    def put_conv(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).transpose(2, 1, 0))
        if "b" in p:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(p["b"]))

    def put_qk(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(
            unpermute_qk_weight(np.asarray(p["w"]), cfg.heads).T)
        if "b" in p:
            out[f"{key}.bias"] = unpermute_qk_bias(np.asarray(p["b"]), cfg.heads)

    put_lin("time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    put_lin("time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    out["text_embed.text_embed.weight"] = np.ascontiguousarray(
        np.asarray(params["text_embed"]["embed"]["w"]))
    for i, blk in enumerate(params["text_embed"]["blocks"]):
        k = f"text_embed.text_blocks.{i}"
        put_conv(f"{k}.dwconv", blk["dwconv"])
        out[f"{k}.norm.weight"] = np.asarray(blk["norm"]["g"])
        out[f"{k}.norm.bias"] = np.asarray(blk["norm"]["b"])
        put_lin(f"{k}.pwconv1", blk["pwconv1"])
        out[f"{k}.grn.gamma"] = np.ascontiguousarray(np.asarray(blk["grn"]["gamma"]).reshape(1, 1, -1))
        out[f"{k}.grn.beta"] = np.ascontiguousarray(np.asarray(blk["grn"]["beta"]).reshape(1, 1, -1))
        put_lin(f"{k}.pwconv2", blk["pwconv2"])
    put_lin("input_embed.proj", params["input_embed"]["proj"])
    put_conv("input_embed.conv_pos_embed.conv1d.0", params["input_embed"]["conv1"])
    put_conv("input_embed.conv_pos_embed.conv1d.2", params["input_embed"]["conv2"])

    half = cfg.depth // 2
    for part, offset in (("first_half", 0), ("second_half", half)):
        stacked = params[part]
        for j in range(half):
            layer = jax.tree.map(lambda a, j=j: np.asarray(a[j]), stacked)
            base = f"layers.{offset + j}"
            out[f"{base}.1.g"] = layer["attn_norm"]["g"]
            put_qk(f"{base}.2.to_q", layer["attn"]["to_q"])
            put_qk(f"{base}.2.to_k", layer["attn"]["to_k"])
            put_lin(f"{base}.2.to_v", layer["attn"]["to_v"])
            put_lin(f"{base}.2.to_out.0", layer["attn"]["to_out"])
            out[f"{base}.3.g"] = layer["ff_norm"]["g"]
            put_lin(f"{base}.4.ff.0.0", layer["ff1"])
            put_lin(f"{base}.4.ff.2", layer["ff2"])
            if "skip_proj" in layer:
                out[f"{base}.0.weight"] = np.ascontiguousarray(np.asarray(layer["skip_proj"]["w"]).T)
    out["norm_out.g"] = np.asarray(params["norm_out"]["g"])
    put_lin("proj_out", params["proj_out"])
    return {prefix + k: np.ascontiguousarray(v) for k, v in out.items()}


def mmdit_from_torch(sd: Dict[str, np.ndarray], cfg, prefix: str = "transformer."):
    """Map a reference MMDiT state dict to our (params, state).

    Torch tree (reference mmdit.py:84-126 + modules.py:647-685):
    transformer_blocks.{i}.{attn_norm_x,attn_norm_c}.linear, .attn.to_*_c,
    .ff_x/.ff_c FeedForwards; the last block is context_pre_only (2-chunk
    attn_norm_c, no ff_c / to_out_c). q/k (both streams) permuted half-split.
    """
    import jax

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def qk_lin(key):
        p = {"w": permute_qk_weight(sd[f"{key}.weight"].T, cfg.heads)}
        if f"{key}.bias" in sd:
            p["b"] = permute_qk_bias(sd[f"{key}.bias"], cfg.heads)
        return p

    params: dict = {
        "time_embed": {"mlp1": _lin(sd, "time_embed.time_mlp.0"),
                       "mlp2": _lin(sd, "time_embed.time_mlp.2")},
        "text_embed": {"embed": {"w": sd["text_embed.text_embed.weight"]}},
        "audio_embed": {
            "proj": _lin(sd, "audio_embed.linear"),
            "conv1": _conv(sd, "audio_embed.conv_pos_embed.conv1d.0"),
            "conv2": _conv(sd, "audio_embed.conv_pos_embed.conv1d.2"),
        },
    }

    def one_block(i, pre_only):
        b = f"transformer_blocks.{i}"
        blk = {
            "attn_norm_x": _lin(sd, f"{b}.attn_norm_x.linear"),
            "attn_norm_c": _lin(sd, f"{b}.attn_norm_c.linear"),
            "attn": {
                "to_q": qk_lin(f"{b}.attn.to_q"),
                "to_k": qk_lin(f"{b}.attn.to_k"),
                "to_v": _lin(sd, f"{b}.attn.to_v"),
                "to_q_c": qk_lin(f"{b}.attn.to_q_c"),
                "to_k_c": qk_lin(f"{b}.attn.to_k_c"),
                "to_v_c": _lin(sd, f"{b}.attn.to_v_c"),
                "to_out": _lin(sd, f"{b}.attn.to_out.0"),
            },
            "ff1_x": _lin(sd, f"{b}.ff_x.ff.0.0"),
            "ff2_x": _lin(sd, f"{b}.ff_x.ff.2"),
        }
        if not pre_only:
            blk["attn"]["to_out_c"] = _lin(sd, f"{b}.attn.to_out_c")
            blk["ff1_c"] = _lin(sd, f"{b}.ff_c.ff.0.0")
            blk["ff2_c"] = _lin(sd, f"{b}.ff_c.ff.2")
        if cfg.qk_norm == "rms_norm":
            perm = half_split_perm(cfg.dim_head)
            for ours, theirs in (("q_norm", "q_norm"), ("k_norm", "k_norm"),
                                 ("c_q_norm", "c_q_norm"), ("c_k_norm", "c_k_norm")):
                blk["attn"][ours] = {
                    "g": np.ascontiguousarray(sd[f"{b}.attn.{theirs}.weight"][perm])}
        return blk

    mids = [one_block(i, False) for i in range(cfg.depth - 1)]
    params["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *mids)
    params["final_block"] = one_block(cfg.depth - 1, True)
    params["norm_out"] = _lin(sd, "norm_out.linear")
    params["proj_out"] = _lin(sd, "proj_out")
    return params, {}


def mmdit_to_torch(params, state, cfg, prefix: str = "transformer.") -> Dict[str, np.ndarray]:
    """Export MMDiT params to reference torch layout (inverse of ingest)."""
    import jax

    out: Dict[str, np.ndarray] = {}

    def put_lin(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(p["b"]))

    def put_conv(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).transpose(2, 1, 0))
        if "b" in p:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(p["b"]))

    def put_qk(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(
            unpermute_qk_weight(np.asarray(p["w"]), cfg.heads).T)
        if "b" in p:
            out[f"{key}.bias"] = unpermute_qk_bias(np.asarray(p["b"]), cfg.heads)

    put_lin("time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    put_lin("time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    out["text_embed.text_embed.weight"] = np.ascontiguousarray(
        np.asarray(params["text_embed"]["embed"]["w"]))
    put_lin("audio_embed.linear", params["audio_embed"]["proj"])
    put_conv("audio_embed.conv_pos_embed.conv1d.0", params["audio_embed"]["conv1"])
    put_conv("audio_embed.conv_pos_embed.conv1d.2", params["audio_embed"]["conv2"])

    def put_block(i, blk, pre_only):
        b = f"transformer_blocks.{i}"
        put_lin(f"{b}.attn_norm_x.linear", blk["attn_norm_x"])
        put_lin(f"{b}.attn_norm_c.linear", blk["attn_norm_c"])
        put_qk(f"{b}.attn.to_q", blk["attn"]["to_q"])
        put_qk(f"{b}.attn.to_k", blk["attn"]["to_k"])
        put_lin(f"{b}.attn.to_v", blk["attn"]["to_v"])
        put_qk(f"{b}.attn.to_q_c", blk["attn"]["to_q_c"])
        put_qk(f"{b}.attn.to_k_c", blk["attn"]["to_k_c"])
        put_lin(f"{b}.attn.to_v_c", blk["attn"]["to_v_c"])
        put_lin(f"{b}.attn.to_out.0", blk["attn"]["to_out"])
        put_lin(f"{b}.ff_x.ff.0.0", blk["ff1_x"])
        put_lin(f"{b}.ff_x.ff.2", blk["ff2_x"])
        if not pre_only:
            put_lin(f"{b}.attn.to_out_c", blk["attn"]["to_out_c"])
            put_lin(f"{b}.ff_c.ff.0.0", blk["ff1_c"])
            put_lin(f"{b}.ff_c.ff.2", blk["ff2_c"])
        if cfg.qk_norm == "rms_norm":
            inv_perm = np.argsort(half_split_perm(cfg.dim_head))
            for nm in ("q_norm", "k_norm", "c_q_norm", "c_k_norm"):
                out[f"{b}.attn.{nm}.weight"] = np.ascontiguousarray(
                    np.asarray(blk["attn"][nm]["g"])[inv_perm])

    for i in range(cfg.depth - 1):
        put_block(i, jax.tree.map(lambda a, i=i: np.asarray(a[i]), params["blocks"]), False)
    put_block(cfg.depth - 1, params["final_block"], True)
    put_lin("norm_out.linear", params["norm_out"])
    put_lin("proj_out", params["proj_out"])
    return {prefix + k: np.ascontiguousarray(v) for k, v in out.items()}


def backbone_from_torch(sd: Dict[str, np.ndarray], arch, prefix: str = "transformer."):
    """Dispatch checkpoint ingestion by backbone config type."""
    from f5e_tts_tpu.config import DiTConfig as _D, MMDiTConfig as _M, UNetTConfig as _U

    if isinstance(arch, _U):
        return unett_from_torch(sd, arch, prefix)
    if isinstance(arch, _M):
        return mmdit_from_torch(sd, arch, prefix)
    if isinstance(arch, _D):
        return dit_from_torch(sd, arch, prefix)
    raise NotImplementedError(f"no torch ingestion for {type(arch).__name__}")


def dit_to_torch(params, state, cfg: DiTConfig, prefix: str = "transformer.") -> Dict[str, np.ndarray]:
    """Export our pytree back to reference-layout torch keys (for interop/tests)."""
    import jax

    out: Dict[str, np.ndarray] = {}

    # NOTE: outputs must be C-contiguous — safetensors.numpy.save_file writes
    # the raw buffer of transposed views with the new shape (silent corruption)
    def put_lin(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(p["b"]))

    def put_conv(key, p):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).transpose(2, 1, 0))
        if "b" in p:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(p["b"]))

    def put_ln(key, p):
        out[f"{key}.weight"] = np.asarray(p["g"])
        out[f"{key}.bias"] = np.asarray(p["b"])

    put_lin("time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    put_lin("time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    out["text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["w"])
    for i, blk in enumerate(params["text_embed"]["blocks"]):
        k = f"text_embed.text_blocks.{i}"
        put_conv(f"{k}.dwconv", blk["dwconv"])
        put_ln(f"{k}.norm", blk["norm"])
        put_lin(f"{k}.pwconv1", blk["pwconv1"])
        out[f"{k}.grn.gamma"] = np.asarray(blk["grn"]["gamma"]).reshape(1, 1, -1)
        out[f"{k}.grn.beta"] = np.asarray(blk["grn"]["beta"]).reshape(1, 1, -1)
        put_lin(f"{k}.pwconv2", blk["pwconv2"])

    put_lin("input_embed.proj", params["input_embed"]["proj"])
    put_conv("input_embed.conv_pos_embed.conv1d.0", params["input_embed"]["conv1"])
    put_conv("input_embed.conv_pos_embed.conv1d.2", params["input_embed"]["conv2"])

    # unstack blocks
    depth = cfg.depth
    blocks = [jax.tree.map(lambda a, i=i: np.asarray(a[i]), params["blocks"]) for i in range(depth)]
    def put_qk_lin(key, p):
        """Reverse the half-split rope permutation back to the reference's
        interleaved layout (ops/rope.py)."""
        out[f"{key}.weight"] = np.ascontiguousarray(
            unpermute_qk_weight(np.asarray(p["w"]), cfg.heads).T)
        if "b" in p:
            out[f"{key}.bias"] = unpermute_qk_bias(np.asarray(p["b"]), cfg.heads)

    inv_perm = np.argsort(half_split_perm(cfg.dim_head))
    for i, blk in enumerate(blocks):
        b = f"transformer_blocks.{i}"
        put_lin(f"{b}.attn_norm.linear", blk["attn_norm"])
        put_qk_lin(f"{b}.attn.to_q", blk["attn"]["to_q"])
        put_qk_lin(f"{b}.attn.to_k", blk["attn"]["to_k"])
        put_lin(f"{b}.attn.to_v", blk["attn"]["to_v"])
        put_lin(f"{b}.attn.to_out.0", blk["attn"]["to_out"])
        put_lin(f"{b}.ff.ff.0.0", blk["ff1"])
        put_lin(f"{b}.ff.ff.2", blk["ff2"])
        if "q_norm" in blk["attn"]:
            out[f"{b}.attn.q_norm.weight"] = np.ascontiguousarray(
                np.asarray(blk["attn"]["q_norm"]["g"])[inv_perm])
            out[f"{b}.attn.k_norm.weight"] = np.ascontiguousarray(
                np.asarray(blk["attn"]["k_norm"]["g"])[inv_perm])

    if cfg.long_skip_connection:
        out["long_skip_connection.weight"] = np.ascontiguousarray(np.asarray(params["long_skip"]["w"]).T)

    put_lin("norm_out.linear", params["norm_out"])
    put_lin("proj_out", params["proj_out"])

    if "quantizer" in params:
        out["quantizer.vars"] = np.asarray(params["quantizer"]["vars"])
        wp = params["quantizer"]["weight_proj"]
        if list(wp.keys()) == ["layer_0"]:
            put_lin("quantizer.weight_proj", wp["layer_0"])

    if "ppg_embed" in params:
        pe = params["ppg_embed"]
        put_lin("ppg_embed.ppg_proj.0", pe["pre"])
        for j, idx in enumerate((2, 6, 10)):
            put_conv(f"ppg_embed.ppg_proj.{idx}", pe["convs"][j])
        for j, idx in enumerate((3, 7, 11)):
            out[f"ppg_embed.ppg_proj.{idx}.weight"] = np.asarray(pe["bns"][j]["g"])
            out[f"ppg_embed.ppg_proj.{idx}.bias"] = np.asarray(pe["bns"][j]["b"])
            out[f"ppg_embed.ppg_proj.{idx}.running_mean"] = np.asarray(state["ppg_bn"][j]["mean"])
            out[f"ppg_embed.ppg_proj.{idx}.running_var"] = np.asarray(state["ppg_bn"][j]["var"])
        put_lin("ppg_embed.ppg_proj.15", pe["post"])

    return {prefix + k: np.ascontiguousarray(v) for k, v in out.items()}
