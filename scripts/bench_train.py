"""Training-throughput benchmark at F5TTS_v1_Base scale (VERDICT r2 #5).

The reference's actual training recipe (model/trainer.py:265-432, paper §4.1)
trains Base (~335 M) with a 153,600-frame global batch. This benchmarks ONE
chip at the largest frame batch that fits (bf16 compute, remat, Pallas
attention fwd+bwd, AdamW+EMA — the exact Trainer step), reporting s/update,
frames/s, training MFU%, and the chip count needed to realize the reference's
global batch at this per-chip throughput.

MFU convention: model FLOPs = 3x analytic forward matmul FLOPs (fwd + 2x bwd;
remat recompute NOT counted — that's hardware overhead, not model work),
peak = 197 bf16 TFLOP/s per v5e chip. Hardware FLOPs from XLA cost analysis
are reported alongside when available.

Run on the real chip:
  python scripts/bench_train.py --batch 12 --len 1600 [--iters 5]
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def analytic_fwd_flops(arch, b: int, n: int, nt: int) -> float:
    """Forward matmul FLOPs for one DiT pass (folded text+audio seq len n)."""
    d, depth, mult = arch.dim, arch.depth, arch.ff_mult
    per_layer = (
        2 * b * n * d * 3 * d      # qkv projection
        + 4 * b * n * n * d        # scores + attention-weighted values
        + 2 * b * n * d * d        # out projection
        + 2 * 2 * b * n * d * (mult * d)  # ff in + out
        + 2 * b * d * 6 * d        # AdaLN modulation (per-step, seq-free)
    )
    embed = 2 * b * n * (d + arch.mel_dim * 2 + arch.text_dim) * d  # input proj approx
    proj_out = 2 * b * n * d * arch.mel_dim
    return depth * per_layer + embed + proj_out


def main():
    from f5e_tts_tpu.config import MeshConfig, TrainConfig, preset
    from f5e_tts_tpu.train.trainer import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--len", type=int, dest="length", default=1600)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--text_len", type=int, default=256)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--rbg", action="store_true",
                   help="TPU hardware RBG for dropout rngs (TrainConfig "
                        "prng_impl='rbg') instead of threefry")
    p.add_argument("--remat_policy", default="block",
                   choices=["block", "save_attn", "save_attn_ff"])
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="depth-scan unroll (DiTConfig.scan_unroll)")
    p.add_argument("--bnb", action="store_true",
                   help="int8 Adam moments (train.adamw8bit) — halves "
                        "optimizer-state HBM, fits larger frame batches")
    args = p.parse_args()

    import dataclasses

    model_cfg = preset(args.model)
    arch_over = dict(scan_unroll=args.scan_unroll)
    if not args.no_remat:
        arch_over.update(checkpoint_activations=True,
                         remat_policy=args.remat_policy)
    model_cfg = dataclasses.replace(
        model_cfg, arch=dataclasses.replace(model_cfg.arch, **arch_over))
    train_cfg = TrainConfig(
        learning_rate=7.5e-5, num_warmup_updates=10,
        batch_size_per_device=args.batch * args.length,
        save_per_updates=10**9, last_per_updates=10**9,
        keep_last_n_checkpoints=1, save_dir="/tmp/bench_train_ckpts", seed=0,
        compute_dtype="bfloat16", mesh=MeshConfig(data=1, model=1, seq=1),
        bnb_optimizer=args.bnb,
        prng_impl=('rbg' if args.rbg else 'default'),
    )
    trainer = Trainer(model_cfg, train_cfg, vocab_size=model_cfg.vocab_size,
                      tokenize=lambda ts: [[0] for _ in ts])
    ts = trainer.init_state(total_updates=1000)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(ts.params))
    step = trainer.make_step()

    b, n = args.batch, args.length
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((b, n, model_cfg.mel.n_mel_channels))
                           .astype(np.float32)),
        "mel_lens": jnp.full((b,), n, jnp.int32),
        "text_ids": jnp.asarray(
            rng.integers(0, model_cfg.vocab_size, (b, args.text_len)).astype(np.int32)),
        "text_lens": jnp.full((b,), args.text_len, jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    ts, metrics = step(ts, batch, key)
    jax.block_until_ready(metrics.loss)
    compile_s = time.perf_counter() - t0
    assert np.isfinite(float(metrics.loss)), float(metrics.loss)

    # warm to steady state: the first 2-4 post-compile executions through
    # the tunnel run slower (executable upload / device ramp); see bench.py
    for i in range(3):
        ts, metrics = step(ts, batch, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(metrics.loss)

    samples = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        ts, metrics = step(ts, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(metrics.loss)
        samples.append(time.perf_counter() - t0)
    dt = statistics.median(samples)

    frames = b * n
    fwd = analytic_fwd_flops(model_cfg.arch, b, n, args.text_len)
    model_flops = 3.0 * fwd
    peak = 197e12  # v5e bf16 peak FLOP/s
    # NOTE: XLA cost_analysis() flops are not meaningful through the axon
    # tunnel (measured far below the analytic model flops), so no hw-MFU
    # figure is reported — mfu_model_pct (3x analytic fwd) is the number.

    sr, hop = model_cfg.mel.target_sample_rate, model_cfg.mel.hop_length
    out = {
        "model": args.model, "params_m": round(n_params / 1e6, 1),
        "batch": b, "len": n, "frames_per_update": frames,
        "sec_per_update": round(dt, 4),
        "sec_all": [round(s, 4) for s in samples],
        "frames_per_sec": round(frames / dt, 1),
        "audio_x_realtime": round(frames * hop / sr / dt, 1),
        "mfu_model_pct": round(100 * model_flops / (dt * peak), 2),
        "compile_s": round(compile_s, 1),
        "chips_for_ref_global_batch": -(-153_600 // frames),
        "loss": round(float(metrics.loss), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
