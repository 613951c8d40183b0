"""Per-op trace breakdown of ONE training step (VERDICT r3 'what's weak' #2).

Base b32 trains at 20.7% model-MFU vs a ~56% remat-adjusted ceiling; this
tool answers "where do the other ~60% of step-time go?" with a trace instead
of a shrug. Traces one steady-state Trainer step (the exact jitted
full_step: CFM loss, remat bwd, clip, AdamW, EMA), then aggregates device
op spans into categories and prints seconds / % of device-busy per category
plus the top-N individual ops.

Run on the real chip:
  python scripts/profile_train.py --batch 32 --len 1664 --remat_policy save_attn

reference context: the trainer hot loop this step replaces is
model/trainer.py:356-432 (the reference publishes no training MFU at all).
"""

import argparse
import dataclasses
import json
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

from profile_duty import device_busy, load_trace

# op-name substrings -> category, first match wins (perfetto names are XLA
# HLO instruction names: fusion.N, dot.N, custom-call.N, copy.N, ...)
CATEGORIES = (
    ("attention_kernel", ("flash", "attn", "pallas", "custom-call", "mha")),
    ("loop/ctrl", ("while", "conditional", "call")),
    ("matmul", ("dot", "convolution", "einsum")),
    ("collective", ("all-reduce", "all-gather", "reduce-scatter",
                    "collective", "ppermute", "all-to-all")),
    ("copy/layout", ("copy", "transpose", "bitcast", "reshape",
                     "dynamic-slice", "dynamic-update-slice", "slice",
                     "concatenate", "pad", "gather", "scatter")),
    ("rng", ("rng", "threefry", "random")),
    ("reduce/norm", ("reduce", "sort", "cumsum")),
    ("fusion/elementwise", ("fusion", "loop", "input", "output", "wide",
                            "select", "compare", "broadcast")),
)


def categorize(per_op: dict) -> dict:
    cat = {}
    for name, secs in per_op.items():
        low = name.lower()
        for cname, subs in CATEGORIES:
            if any(s in low for s in subs):
                cat[cname] = cat.get(cname, 0.0) + secs
                break
        else:
            cat.setdefault("other", 0.0)
            cat["other"] += secs
    return cat


def main():
    from bench_train import analytic_fwd_flops

    from f5e_tts_tpu.config import MeshConfig, TrainConfig, preset
    from f5e_tts_tpu.train.trainer import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--len", type=int, dest="length", default=1664)
    p.add_argument("--text_len", type=int, default=256)
    p.add_argument("--remat_policy", default="save_attn",
                   choices=["block", "save_attn", "save_attn_ff"])
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--rbg", action="store_true",
                   help="TPU hardware RBG for dropout rngs (TrainConfig "
                        "prng_impl='rbg') instead of threefry")
    p.add_argument("--trace_dir", default="/tmp/train_trace")
    p.add_argument("--top", type=int, default=20)
    args = p.parse_args()

    model_cfg = preset(args.model)
    if not args.no_remat:
        model_cfg = dataclasses.replace(
            model_cfg, arch=dataclasses.replace(model_cfg.arch,
                                                checkpoint_activations=True,
                                                remat_policy=args.remat_policy))
    train_cfg = TrainConfig(
        learning_rate=7.5e-5, num_warmup_updates=10,
        batch_size_per_device=args.batch * args.length,
        save_per_updates=10**9, last_per_updates=10**9,
        keep_last_n_checkpoints=1, save_dir="/tmp/bench_train_ckpts", seed=0,
        compute_dtype="bfloat16", mesh=MeshConfig(data=1, model=1, seq=1),
        prng_impl=("rbg" if args.rbg else "default"))
    trainer = Trainer(model_cfg, train_cfg, vocab_size=model_cfg.vocab_size,
                      tokenize=lambda ts: [[0] for _ in ts])
    ts = trainer.init_state(total_updates=1000)
    step = trainer.make_step()

    b, n = args.batch, args.length
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (b, n, model_cfg.mel.n_mel_channels)).astype(np.float32)),
        "mel_lens": jnp.full((b,), n, jnp.int32),
        "text_ids": jnp.asarray(rng.integers(
            0, model_cfg.vocab_size, (b, args.text_len)).astype(np.int32)),
        "text_lens": jnp.full((b,), args.text_len, jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    ts, metrics = step(ts, batch, key)          # compile
    jax.block_until_ready(metrics.loss)
    ts, metrics = step(ts, batch, key)          # steady-state executable
    jax.block_until_ready(metrics.loss)

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    ts, metrics = step(ts, batch, jax.random.fold_in(key, 1))
    jax.block_until_ready(metrics.loss)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    busy, per_op, pnames = device_busy(load_trace(args.trace_dir))
    cats = categorize(per_op)
    frames = b * n
    model_flops = 3.0 * analytic_fwd_flops(model_cfg.arch, b, n, args.text_len)
    peak = 197e12

    print(f"\n=== train step trace: {args.model} b{b} x {n} "
          f"(remat={'off' if args.no_remat else args.remat_policy}) ===")
    print(f"wall {wall:.3f}s  device-busy {busy:.3f}s  "
          f"duty {100 * busy / max(wall, 1e-9):.1f}%  "
          f"model-MFU {100 * model_flops / (wall * peak):.1f}%  "
          f"frames/s {frames / wall:.0f}")
    print("\ncategory breakdown (of device-busy):")
    for cname, secs in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cname:<22} {secs:8.4f}s  {100 * secs / max(busy, 1e-9):5.1f}%")
    print(f"\ntop {args.top} ops:")
    for name, secs in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {secs:8.4f}s  {100 * secs / max(busy, 1e-9):5.1f}%  {name}")
    print()
    print(json.dumps({"wall_s": round(wall, 4), "busy_s": round(busy, 4),
                      "mfu_model_pct": round(100 * model_flops / (wall * peak), 2),
                      "categories": {k: round(v, 4) for k, v in cats.items()}}))


if __name__ == "__main__":
    main()
