#!/usr/bin/env python
"""Quality-proxy runner: train a tiny-but-real CFM on toyspeech, score levers.

VERDICT r4 #2 — the lever table that stops int8/EPSS/NFE16/cfg-distill from
being quality-blind. Quality numbers are hardware-independent, so this runs
CPU-forced by default (pass --platform tpu on a chip for speed).

Usage:
    python scripts/quality_proxy.py train   --dir /tmp/qp [--steps 4000]
    python scripts/quality_proxy.py distill --dir /tmp/qp [--steps 1500]
    python scripts/quality_proxy.py eval    --dir /tmp/qp [--report qp.json]
    python scripts/quality_proxy.py all     --dir /tmp/qp

The eval emits one row per serving lever, all with IDENTICAL per-utterance
noise seeds (differences isolate the lever):

    teacher   f32 NFE32 cfg2.0 sway -1      <- the reference configuration
    nfe16     NFE16
    epss16/8  EPSS pruned grids (arXiv 2505.19931) keeping 16/8 of 32 steps
    int8      W8A8 trunk quantization
    cfg0_base cfg=0 on the base model       <- no-guidance ablation (bad)
    cfg0_distill cfg=0 on the distilled student (only after `distill`)

Columns: TER (token error rate via the language's own decoder — the WER
proxy), mel MSE / MCD dB / LSD vs ground-truth mel, and MCD vs the teacher's
own output (drift).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _setup_jax(platform: str):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    return jax


def _configs(args):
    from f5e_tts_tpu.config import (CFMConfig, DiTConfig, MeshConfig, ModelConfig,
                                    TrainConfig)
    from f5e_tts_tpu.eval import proxy_quality as pq

    arch = DiTConfig(dim=args.dim, depth=args.depth, heads=4, dim_head=args.dim // 4,
                     ff_mult=2, mel_dim=pq.MEL.n_mel_channels, text_dim=64,
                     conv_layers=2, dropout=0.0)
    model_cfg = ModelConfig(name="toyspeech", backbone="DiT", arch=arch, mel=pq.MEL,
                            cfm=CFMConfig())
    train_cfg = TrainConfig(
        learning_rate=2e-4, num_warmup_updates=200,
        save_per_updates=10 ** 9, last_per_updates=500,
        save_dir=os.path.join(args.dir, "teacher"),
        compute_dtype="float32", seed=0,
        mesh=MeshConfig(data=1, model=1, seq=1))
    return model_cfg, train_cfg


def _loader(args, n_utts: int, seed: int):
    from f5e_tts_tpu.data import dataset as fdata
    from f5e_tts_tpu.eval import proxy_quality as pq

    rows = pq.make_dataset(n_utts, seed=seed)
    ds = fdata.ArrowSpeechDataset(rows, durations=[r["duration"] for r in rows],
                                  mel=pq.MEL)
    # fixed-count batches + one length bucket (14 tokens = 168 frames) so the
    # train step compiles EXACTLY once — every batch is (batch_utts, 168, 24)
    return fdata.build_loader(ds, pq.tokenize, frames_threshold=10 ** 9,
                              max_samples=args.batch_utts,
                              len_multiple=14 * pq.FRAMES_PER_TOKEN, seed=666,
                              batch_size_type="sample")


def cmd_train(args):
    jax = _setup_jax(args.platform)
    from f5e_tts_tpu.eval import proxy_quality as pq
    from f5e_tts_tpu.train.trainer import Trainer

    model_cfg, train_cfg = _configs(args)
    losses = []

    def log_fn(m, u):
        losses.append(m["loss"])
        if u % 200 == 0 or u <= 3:
            recent = sum(losses[-100:]) / len(losses[-100:])
            print(f"update {u}: loss {m['loss']:.4f} (avg100 {recent:.4f}) "
                  f"{m['step_seconds']:.2f}s/step", flush=True)

    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(pq.VOCAB),
                      tokenize=pq.tokenize, log_fn=log_fn)
    loader = _loader(args, args.train_utts, seed=1)
    ts, info = trainer.train(loader, epochs=10 ** 6, resume=args.resume,
                             max_updates=args.steps)
    print(json.dumps({"phase": "train", "updates": info["updates"],
                      "seconds": round(info["seconds"], 1),
                      "final_loss_avg100": round(sum(losses[-100:]) / max(len(losses[-100:]), 1), 4)}))


def cmd_distill(args):
    """CFG-distill a cfg0 student from the trained teacher's EMA weights."""
    jax = _setup_jax(args.platform)
    from f5e_tts_tpu.eval import proxy_quality as pq
    from f5e_tts_tpu.train.trainer import Trainer

    model_cfg, train_cfg = _configs(args)
    teacher_ema = _load_ema(args, os.path.join(args.dir, "teacher"))
    train_cfg = dataclasses.replace(
        train_cfg, save_dir=os.path.join(args.dir, "student"),
        learning_rate=1e-4, num_warmup_updates=100)
    losses = []

    def log_fn(m, u):
        losses.append(m["loss"])
        if u % 200 == 0 or u <= 3:
            print(f"distill update {u}: loss {m['loss']:.5f}", flush=True)

    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(pq.VOCAB),
                      tokenize=pq.tokenize, log_fn=log_fn)
    trainer.set_teacher(teacher_ema, cfg_strength=args.distill_cfg)
    # student starts FROM the teacher weights (standard guidance distillation)
    ts = trainer.init_state(args.steps, rng_seed=0)
    tfp32 = jax.tree.map(lambda a: a.astype(jax.numpy.float32), trainer.teacher_params)
    ts = ts._replace(params=tfp32, ema_params=tfp32)
    trainer._init_ts = ts
    loader = _loader(args, args.train_utts, seed=1)
    _, info = trainer.train(loader, epochs=10 ** 6, resume=args.resume,
                            max_updates=args.steps)
    print(json.dumps({"phase": "distill", "updates": info["updates"],
                      "seconds": round(info["seconds"], 1)}))


def _load_ema(args, save_dir: str):
    """EMA params from a trainer checkpoint dir (orbax model_last)."""
    import jax

    from f5e_tts_tpu.eval import proxy_quality as pq
    from f5e_tts_tpu.train.trainer import Trainer

    model_cfg, train_cfg = _configs(args)
    train_cfg = dataclasses.replace(train_cfg, save_dir=save_dir)
    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(pq.VOCAB),
                      tokenize=pq.tokenize)
    ts = trainer.init_state(total_updates=1, rng_seed=0)
    ts = trainer.load_checkpoint(ts)
    assert int(ts.update) > 0, f"no trained checkpoint under {save_dir}"
    return jax.device_get(ts.ema_params)


def cmd_eval(args):
    jax = _setup_jax(args.platform)
    import jax.numpy as jnp
    import numpy as np

    from f5e_tts_tpu.eval import proxy_quality as pq
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.ops.mel import mel_spectrogram

    model_cfg, _ = _configs(args)
    arch, cfm = model_cfg.arch, model_cfg.cfm
    params = jax.tree.map(jnp.asarray, _load_ema(args, os.path.join(args.dir, "teacher")))
    student = None
    sdir = os.path.join(args.dir, "student")
    if os.path.exists(os.path.join(sdir, "model_last.orbax")):
        student = jax.tree.map(jnp.asarray, _load_ema(args, sdir))

    # held-out utterances (disjoint seed from training)
    rng = np.random.default_rng(12345)
    utts = [pq.make_utterance(rng) for _ in range(args.eval_utts)]
    P = args.prompt_tokens
    bucket = 16 * pq.FRAMES_PER_TOKEN  # max 14 tokens -> 168 frames, pad to 192

    gt_mels, texts, n_toks = [], [], []
    for text, spk, wav in utts:
        m = np.asarray(mel_spectrogram(jnp.asarray(wav[None]), pq.MEL))[0]
        gt_mels.append(m[: len(text) * pq.FRAMES_PER_TOKEN])
        texts.append(text)
        n_toks.append(len(text))

    b = len(utts)
    cond = np.zeros((b, bucket, pq.MEL.n_mel_channels), np.float32)
    for i, m in enumerate(gt_mels):
        cond[i, : P * pq.FRAMES_PER_TOKEN] = m[: P * pq.FRAMES_PER_TOKEN]
    lens = np.full((b,), P * pq.FRAMES_PER_TOKEN, np.int32)
    duration = np.asarray([n * pq.FRAMES_PER_TOKEN for n in n_toks], np.int32)
    text_ids = pq.tokenize(texts)
    nt = text_ids.shape[1]
    text_pad = np.full((b, 16), -1, np.int32)
    text_pad[:, :nt] = text_ids
    inputs = fcfm.prepare_inputs(jnp.asarray(cond), jnp.asarray(lens),
                                 jnp.asarray(duration), bucket,
                                 text_ids=jnp.asarray(text_pad))
    seeds = jnp.arange(7000, 7000 + b, dtype=jnp.uint32)
    key = jax.random.PRNGKey(99)

    from f5e_tts_tpu.models.cfm import pruned_sway_timesteps

    levers = {
        "teacher_nfe32_cfg2": dict(p=params, steps=32, cfg=2.0, ts=None),
        "nfe16": dict(p=params, steps=16, cfg=2.0, ts=None),
        "epss16of32": dict(p=params, steps=32, cfg=2.0,
                           ts=pruned_sway_timesteps(tuple(range(0, 33, 2)))),
        "epss8of32": dict(p=params, steps=32, cfg=2.0,
                          ts=pruned_sway_timesteps((0, 1, 2, 3, 4, 6, 10, 18, 32))),
        "cfg0_base": dict(p=params, steps=32, cfg=0.0, ts=None),
    }
    if not args.no_int8:
        from f5e_tts_tpu.ops.quant import quantize_backbone_params

        levers["int8_w8a8"] = dict(p=quantize_backbone_params(params, "dit"),
                                   steps=32, cfg=2.0, ts=None)
    if student is not None:
        levers["cfg0_distill"] = dict(p=student, steps=32, cfg=0.0, ts=None)
        levers["cfg0_distill_nfe16"] = dict(p=student, steps=16, cfg=0.0, ts=None)

    results = {}
    teacher_out = None
    for name, lv in levers.items():
        out, _ = fcfm.sample(lv["p"], {}, arch, cfm, inputs, key,
                             steps=lv["steps"], cfg_strength=lv["cfg"],
                             sway_coef=-1.0, use_mask=True, seeds=seeds,
                             timesteps=lv["ts"], compute_dtype=jnp.float32)
        out = np.asarray(out)
        if teacher_out is None:
            teacher_out = out
        ters, metrics, drift = [], [], []
        for i in range(b):
            n = n_toks[i]
            gen_sl = slice(P * pq.FRAMES_PER_TOKEN, n * pq.FRAMES_PER_TOKEN)
            hyp = pq.decode_mel(out[i, : n * pq.FRAMES_PER_TOKEN], n, start_token=P)
            ters.append(pq.token_error_rate(hyp, texts[i][P:]))
            metrics.append(pq.mel_metrics(out[i, gen_sl], gt_mels[i][gen_sl]))
            drift.append(pq.mel_metrics(out[i, gen_sl], teacher_out[i, gen_sl])["mcd_db"])
        row = {
            "ter_pct": round(100 * float(np.mean(ters)), 2),
            "mel_mse": round(float(np.mean([m["mel_mse"] for m in metrics])), 4),
            "mcd_db": round(float(np.mean([m["mcd_db"] for m in metrics])), 3),
            "lsd": round(float(np.mean([m["lsd"] for m in metrics])), 4),
            "mcd_vs_teacher_db": round(float(np.mean(drift)), 3),
        }
        results[name] = row
        print(f"[{name:22s}] TER {row['ter_pct']:6.2f}%  MCD {row['mcd_db']:6.3f} dB  "
              f"LSD {row['lsd']:.4f}  drift-MCD {row['mcd_vs_teacher_db']:6.3f} dB",
              flush=True)

    # ground-truth decoder sanity: TER on the REAL mel must be ~0
    gt_ter = float(np.mean([
        pq.token_error_rate(pq.decode_mel(gt_mels[i], n_toks[i], start_token=P),
                            texts[i][P:]) for i in range(b)]))
    results["_gt_decoder_ter_pct"] = round(100 * gt_ter, 3)
    print(f"[gt decoder sanity    ] TER {100 * gt_ter:.3f}% (must be ~0)")

    report = {"arch": {"dim": args.dim, "depth": args.depth},
              "eval_utts": b, "prompt_tokens": P, "levers": results}
    path = args.report or os.path.join(args.dir, "quality_proxy.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"phase": "eval", "report": path}))

    # markdown table for BENCHMARKS.md
    print("\n| lever | TER % | mel MSE | MCD dB | LSD | MCD vs teacher dB |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        if name.startswith("_"):
            continue
        print(f"| {name} | {r['ter_pct']} | {r['mel_mse']} | {r['mcd_db']} | "
              f"{r['lsd']} | {r['mcd_vs_teacher_db']} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["train", "distill", "eval", "all"])
    ap.add_argument("--dir", default="/tmp/quality_proxy")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="cpu = forced CPU (default; quality is hw-independent)")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--distill-steps", type=int, default=1500)
    ap.add_argument("--distill-cfg", type=float, default=2.0)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--train-utts", type=int, default=2048)
    ap.add_argument("--eval-utts", type=int, default=64)
    ap.add_argument("--prompt-tokens", type=int, default=3)
    ap.add_argument("--batch-utts", type=int, default=16)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)

    if args.cmd in ("train", "all"):
        cmd_train(args)
    if args.cmd in ("distill", "all"):
        a = argparse.Namespace(**vars(args))
        a.steps = args.distill_steps
        cmd_distill(a)
    if args.cmd in ("eval", "all"):
        cmd_eval(args)


if __name__ == "__main__":
    main()
