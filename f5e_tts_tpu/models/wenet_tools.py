"""WeNet ASR tooling: checkpoint averaging + recognition CLI.

reference: src/f5_tts/ppg/wenet/bin/average_model.py (average the N
best/last checkpoints value-wise) and bin/recognize.py (decode a test set
with --mode attention / ctc_greedy_search).

The recognize path runs the frozen Conformer encoder (models/conformer.py)
plus the CTC head and/or the attention decoder (models/wenet_decoder.py) as
jitted TPU graphs; file IO and search bookkeeping stay host-side.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional

import numpy as np


def average_checkpoints(paths: List[str]) -> Dict[str, np.ndarray]:
    """Value-wise mean of N torch checkpoints (average_model.py:67-84)."""
    import torch

    avg: Dict[str, np.ndarray] = {}
    for path in paths:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            if not hasattr(v, "numpy"):
                continue
            arr = v.numpy()
            if k in avg:
                avg[k] = avg[k] + arr
            else:
                avg[k] = arr.astype(np.float64)
    n = float(len(paths))
    return {k: (v / n).astype(np.float32) for k, v in avg.items()}


def average_model_main(argv=None):
    import torch

    p = argparse.ArgumentParser(description="average the last/selected ckpts")
    p.add_argument("--dst_model", required=True)
    p.add_argument("--src_paths", nargs="+", required=True,
                   help="explicit checkpoint list (reference also supports "
                        "val-loss selection via yamls; pass the chosen files)")
    args = p.parse_args(argv)
    avg = average_checkpoints(args.src_paths)
    torch.save({k: torch.from_numpy(v) for k, v in avg.items()}, args.dst_model)
    print(f"averaged {len(args.src_paths)} ckpts -> {args.dst_model}")


def recognize(
    extractor,  # models.conformer.PPGExtractor (frozen encoder + heads)
    feats: np.ndarray,  # (B, T, 80) kaldi fbank
    feat_lens: np.ndarray,
    *,
    mode: str = "ctc_greedy_search",  # | "attention"
    ctc_params: Optional[dict] = None,  # {"w","b"} vocab projection
    decoder_params: Optional[dict] = None,
    decoder_cfg=None,
    sos: int = 1,
    eos: int = 2,
    blank: int = 0,
    max_len: int = 100,
) -> List[List[int]]:
    """Decode a batch of fbank features to token-id hypotheses.

    reference: bin/recognize.py:198-230 — mode 'attention' (greedy here,
    beam_size 1) and 'ctc_greedy_search'."""
    import jax.numpy as jnp

    from f5e_tts_tpu.models.conformer import conformer_encode
    from f5e_tts_tpu.models import wenet_decoder as wd
    from f5e_tts_tpu.ops import nn as fnn

    enc, enc_lens = conformer_encode(extractor.params, extractor.cfg,
                                     jnp.asarray(feats), jnp.asarray(feat_lens))
    if mode == "ctc_greedy_search":
        assert ctc_params is not None, "ctc_greedy_search needs the ctc head"
        logits = fnn.linear(ctc_params, enc)
        return wd.ctc_greedy_search(np.asarray(logits), np.asarray(enc_lens),
                                    blank=blank)
    if mode == "attention":
        assert decoder_params is not None and decoder_cfg is not None
        return wd.attention_greedy_decode(decoder_params, decoder_cfg, enc,
                                          enc_lens, sos, eos, max_len=max_len)
    raise ValueError(f"unknown decode mode {mode!r} (attention | "
                     "ctc_greedy_search)")


def recognize_main(argv=None):
    """Recognize a list of fbank .npy files with a wenet checkpoint.

    Minimal offline-capable variant of bin/recognize.py: inputs are
    precomputed (B, T, 80) fbank features (the wav->fbank frontend is
    ops/kaldi.py, exercised by the PPG extractor path)."""
    import jax.numpy as jnp
    import torch
    import yaml

    from f5e_tts_tpu.models.conformer import load_ppg_extractor
    from f5e_tts_tpu.models import wenet_decoder as wd
    from f5e_tts_tpu.models.wenet_decoder import DecoderConfig

    p = argparse.ArgumentParser(description="wenet-style recognition")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", required=True, help="train.yaml")
    p.add_argument("--feats", nargs="+", required=True, help="fbank .npy files")
    p.add_argument("--mode", default="ctc_greedy_search",
                   choices=["ctc_greedy_search", "attention"])
    p.add_argument("--dict", default=None, help="vocab file: 'token id' lines")
    p.add_argument("--result_file", default=None)
    args = p.parse_args(argv)

    extractor = load_ppg_extractor(args.checkpoint, args.config)
    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    sd = {k: v.numpy().astype(np.float32) for k, v in sd.items()
          if hasattr(v, "numpy")}

    ctc_params = None
    decoder_params = None
    decoder_cfg = None
    if args.mode == "ctc_greedy_search":
        ctc_params = {"w": np.ascontiguousarray(sd["ctc.ctc_lo.weight"].T),
                      "b": sd["ctc.ctc_lo.bias"]}
    else:
        with open(args.config, "r", encoding="utf-8") as f:
            conf = yaml.safe_load(f)
        dcfg = conf.get("decoder_conf", {})
        vocab = sd["decoder.output_layer.weight"].shape[0] \
            if "decoder.output_layer.weight" in sd \
            else sd["decoder.left_decoder.output_layer.weight"].shape[0]
        decoder_cfg = DecoderConfig(
            vocab_size=vocab,
            dim=extractor.cfg.output_size,
            attention_heads=dcfg.get("attention_heads", 4),
            linear_units=dcfg.get("linear_units", 2048),
            num_blocks=dcfg.get("num_blocks", 6),
            r_num_blocks=dcfg.get("r_num_blocks", 0))
        decoder_params = wd.decoder_from_torch(sd, decoder_cfg)

    id2tok = None
    if args.dict:
        id2tok = {}
        with open(args.dict, "r", encoding="utf-8") as f:
            for line in f:
                tok, idx = line.strip().split()
                id2tok[int(idx)] = tok

    results = []
    for path in args.feats:
        feats = np.load(path).astype(np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        lens = np.asarray([feats.shape[1]])
        hyps = recognize(extractor, feats, lens, mode=args.mode,
                         ctc_params=ctc_params, decoder_params=decoder_params,
                         decoder_cfg=decoder_cfg)
        text = ("".join(id2tok.get(t, f"<{t}>") for t in hyps[0])
                if id2tok else " ".join(map(str, hyps[0])))
        results.append({"feats": path, "ids": hyps[0], "text": text})
        print(f"{path}\t{text}")

    if args.result_file:
        with open(args.result_file, "w", encoding="utf-8") as f:
            for r in results:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return results


if __name__ == "__main__":
    recognize_main()
