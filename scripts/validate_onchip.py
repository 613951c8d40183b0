"""On-chip validation drivers (run on a real TPU; compiles take minutes).

    python scripts/validate_onchip.py {bwd|overfit|train|all}

bwd     — Pallas flash-style attention backward vs the chunked-XLA backward:
          numerics (plain + rope) and fwd+bwd timing.
overfit — end-to-end gradient correctness: tiny-but-kernel-eligible DiT
          (dh=64, N%128==0 so the Pallas fwd+bwd and fused AdaLN engage),
          300 in-graph Adam steps on one fixed batch; loss must collapse.
train   — real Trainer smoke at F5TTS_Small shapes: 4 updates over a toy
          loader, finite losses, bf16 + remat + EMA + on-device mel.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def check_bwd():
    from f5e_tts_tpu.ops import pallas_attention as pa
    from f5e_tts_tpu.ops.rope import rotary_cos_sin_half

    b, n, h, dh = 2, 1536, 16, 64
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v, g = mk(), mk(), mk(), mk()
    kv_lens = jnp.asarray([n, n - 300], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    assert pa.bwd_supported(q, k) and pa.bwd_supported(q, k, rope=True)

    pairs = [
        ("plain", pa.mha_fullkv_bwd(q, k, v, kv_lens, g),
         pa._chunked_attn_bwd(lambda a, b_, c: pa._reference_attn(a, b_, c, kv_lens), q, k, v, g)),
        ("rope", pa.mha_fullkv_rope_bwd(q, k, v, kv_lens, cos, sin, g, h),
         pa._chunked_attn_bwd(lambda a, b_, c: pa._reference_rope_attn(
             a, b_, c, kv_lens, cos, sin, h), q, k, v, g)),
    ]
    for name, ours, ref in pairs:
        for o, r, which in zip(ours, ref, ("dq", "dk", "dv")):
            d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(r.astype(jnp.float32))))
            print(f"{name} {which}: max abs diff {d:.5f} (scale {scale:.2f})")
            assert d < 0.15 * max(scale, 1.0), (name, which, d, scale)

    def loss_pallas(q, k, v):
        return jnp.sum(pa.mha_fullkv_rope_ad(q, k, v, kv_lens, cos, sin, h) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(pa._reference_rope_attn(q, k, v, kv_lens, cos, sin, h) ** 2)

    for name, f in (("pallas", jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))),
                    ("xla", jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2))))):
        r = f(q, k, v); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(q, k, v)
        jax.block_until_ready(r)
        print(f"{name} fwd+bwd: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")
    print("BWD OK")


def check_overfit():
    import optax

    from f5e_tts_tpu.config import CFMConfig, DiTConfig
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.models import dit as fdit

    arch = DiTConfig(dim=128, depth=2, heads=2, dim_head=64, ff_mult=2,
                     mel_dim=16, text_dim=64, conv_layers=1, dropout=0.0)
    vocab = 32
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, vocab)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)

    b, n, nt = 2, 256, 16
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32))
    lens = jnp.asarray([n, n - 37], jnp.int32)
    text = jnp.asarray(rng.integers(1, vocab, (b, nt)).astype(np.int32))
    cfm = CFMConfig()
    opt = optax.adam(2e-3)

    def loss_fn(p, key):
        out = fcfm.cfm_loss(p, state, arch, cfm, mel=mel, mel_lens=lens,
                            text_ids=text, rng=key, compute_dtype=jnp.bfloat16)
        return jnp.asarray(out.loss, jnp.float32)

    @jax.jit
    def run(params, key):
        opt_state = opt.init(params)
        l0 = loss_fn(params, key)

        def step(i, carry):
            params, opt_state = carry
            # fixed 4-draw rng cycle -> a learnable target
            g = jax.grad(loss_fn)(params, jax.random.fold_in(key, i % 4))
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, opt_state = jax.lax.fori_loop(0, 300, step, (params, opt_state))
        lf = sum(loss_fn(params, jax.random.fold_in(key, i)) for i in range(4)) / 4
        return l0, lf

    l0, lf = run(params, jax.random.PRNGKey(7))
    l0, lf = float(l0), float(lf)
    print(f"overfit: initial loss {l0:.4f} -> final {lf:.4f}")
    assert lf < l0 / 5, (l0, lf)
    print("OVERFIT OK")


def check_train():
    from f5e_tts_tpu.config import MeshConfig, TrainConfig, preset
    from f5e_tts_tpu.data import dataset as fdata
    from f5e_tts_tpu.train.trainer import Trainer
    from f5e_tts_tpu.utils.text import list_str_to_bytes

    model_cfg = preset("F5TTS_Small")
    mel_cfg = model_cfg.mel
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        dur = 8.0 + 0.5 * (i % 4)
        t = int(dur * mel_cfg.target_sample_rate)
        rows.append({
            "audio": {"array": (0.1 * rng.standard_normal(t)).astype(np.float32),
                      "sampling_rate": mel_cfg.target_sample_rate},
            "text": "the quick brown fox jumps over the lazy dog " * 2,
            "duration": dur,
        })
    ds = fdata.ArrowSpeechDataset(rows, durations=[r["duration"] for r in rows],
                                  mel=mel_cfg)
    tokenize = lambda texts: list_str_to_bytes(list(texts))
    loader = fdata.build_loader(ds, tokenize, frames_threshold=3200,
                                max_samples=4, len_multiple=128)
    train_cfg = TrainConfig(
        learning_rate=7.5e-5, num_warmup_updates=2, batch_size_per_device=3200,
        save_per_updates=10_000, last_per_updates=10_000,
        keep_last_n_checkpoints=1, save_dir="/tmp/validate_ckpts", seed=0,
        compute_dtype="bfloat16", mesh=MeshConfig(data=1, model=1, seq=1))
    logs = []
    trainer = Trainer(model_cfg, train_cfg, vocab_size=256, tokenize=tokenize,
                      log_fn=lambda m, u: logs.append((u, dict(m))))
    ts, _ = trainer.train(loader, epochs=2, resume=False, max_updates=4)
    assert int(ts.update) == 4
    for u, m in logs:
        print(u, round(float(m["loss"]), 4))
        assert np.isfinite(float(m["loss"])), (u, m)
    print("TRAIN OK")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("bwd", "all"):
        check_bwd()
    if which in ("overfit", "all"):
        check_overfit()
    if which in ("train", "all"):
        check_train()


if __name__ == "__main__":
    main()
