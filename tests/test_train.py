"""Trainer loop tests: dataset packing, collation, full loop with ckpt/resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import (CFMConfig, DiTConfig, MelConfig, MeshConfig, ModelConfig,
                                TrainConfig)
from f5e_tts_tpu.data import dataset as fdata
from f5e_tts_tpu.train.trainer import Trainer
from f5e_tts_tpu.utils.text import list_str_to_idx

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefgh")}


def _tokenize(texts):
    return list_str_to_idx([list(t) for t in texts], VOCAB)


def _toy_dataset(n=12, rng=None):
    rng = rng or np.random.default_rng(0)
    rows = []
    for i in range(n):
        dur = 0.5 + 0.1 * (i % 5)
        t = int(dur * MEL.target_sample_rate)
        rows.append({
            "audio": {"array": (0.1 * rng.standard_normal(t)).astype(np.float32),
                      "sampling_rate": MEL.target_sample_rate},
            "text": "abc def gh"[: 4 + i % 6],
            "duration": dur,
        })
    return fdata.ArrowSpeechDataset(rows, durations=[r["duration"] for r in rows], mel=MEL)


def test_pack_batches():
    lens = [100, 200, 50, 400, 300, 120]
    batches = fdata.pack_batches(lens, frames_threshold=500, max_samples=3)
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(6))
    for b in batches:
        assert sum(lens[i] for i in b) <= 500
        assert len(b) <= 3
    # over-threshold item dropped
    batches = fdata.pack_batches([600, 100], frames_threshold=500)
    assert sorted(i for b in batches for i in b) == [1]


def test_sampler_epoch_shuffle():
    s = fdata.FramePackedSampler([[0], [1], [2], [3], [4]], seed=1)
    a = list(iter(s))
    s.set_epoch(1)
    b = list(iter(s))
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert a != b  # different epoch order


def test_collate_static_shapes(rng):
    ds = _toy_dataset()
    items = [ds[0], ds[3], ds[7]]
    batch = fdata.collate(items, _tokenize, MEL, len_multiple=32, text_multiple=8)
    assert batch["audio"].shape[1] % (32 * MEL.hop_length) == 0
    assert batch["text_ids"].shape[1] % 8 == 0
    assert batch["mel_lens"].max() <= batch["audio"].shape[1] // MEL.hop_length
    assert (batch["text_lens"] > 0).all()


def test_build_loader():
    ds = _toy_dataset()
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=400, max_samples=4,
                                len_multiple=32)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert "audio" in b and "mel_lens" in b and "text_ids" in b


def test_trainer_loop_and_resume(tmp_path):
    ds = _toy_dataset()
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=300, max_samples=2,
                                len_multiple=32)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=ARCH, mel=MEL, cfm=CFMConfig())
    train_cfg = TrainConfig(
        learning_rate=1e-3, num_warmup_updates=2, batch_size_per_device=300,
        save_per_updates=1000, last_per_updates=4, keep_last_n_checkpoints=2,
        save_dir=str(tmp_path / "ckpts"), seed=0, compute_dtype="float32",
        mesh=MeshConfig(data=1, model=1, seq=1),
    )
    logs = []
    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB), tokenize=_tokenize,
                      log_fn=lambda m, u: logs.append((u, m)))
    ts, info = trainer.train(loader, epochs=1, resume=False, max_updates=5)
    assert int(ts.update) == 5
    assert len(logs) == 5
    assert all(np.isfinite(m["loss"]) for _, m in logs)
    # last checkpoint written
    assert os.path.exists(tmp_path / "ckpts" / "model_last.orbax")
    assert os.path.exists(tmp_path / "ckpts" / "model_last.safetensors")

    # resume continues from update 5 (epoch/batch fast-forward skips the
    # first 5 scheduled batches, reference trainer.py:347-352)
    trainer2 = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB), tokenize=_tokenize)
    ts2, _ = trainer2.train(loader, epochs=10, resume=True, max_updates=7)
    assert int(ts2.update) == 7


def test_ckpt_rotation(tmp_path):
    ds = _toy_dataset(6)
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=300, max_samples=2,
                                len_multiple=32)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=ARCH, mel=MEL)
    train_cfg = TrainConfig(
        learning_rate=1e-3, num_warmup_updates=1, save_per_updates=1, last_per_updates=100,
        keep_last_n_checkpoints=2, save_dir=str(tmp_path / "ck"), seed=0,
        compute_dtype="float32", mesh=MeshConfig(data=1, model=1, seq=1))
    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB), tokenize=_tokenize)
    trainer.train(loader, epochs=2, resume=False, max_updates=4)
    import re

    kept = [n for n in os.listdir(tmp_path / "ck") if re.match(r"model_\d+\.orbax$", n)]
    assert len(kept) <= 2


def test_loaded_ema_export_matches(tmp_path):
    """The torch-layout safetensors written by save_checkpoint re-ingests."""
    from f5e_tts_tpu.utils.torch_ckpt import dit_from_torch, load_torch_state_dict

    ds = _toy_dataset(4)
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=300, max_samples=2,
                                len_multiple=32)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=ARCH, mel=MEL)
    train_cfg = TrainConfig(learning_rate=1e-3, num_warmup_updates=1, last_per_updates=100,
                            save_per_updates=100, save_dir=str(tmp_path / "ck2"), seed=0,
                            compute_dtype="float32", mesh=MeshConfig(data=1, model=1, seq=1))
    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB), tokenize=_tokenize)
    ts, _ = trainer.train(loader, epochs=1, resume=False, max_updates=2)

    sd = load_torch_state_dict(str(tmp_path / "ck2" / "model_last.safetensors"), use_ema=True)
    params, _ = dit_from_torch(sd, ARCH)
    np.testing.assert_allclose(
        np.asarray(params["time_embed"]["mlp1"]["w"]),
        np.asarray(jax.device_get(ts.ema_params["time_embed"]["mlp1"]["w"])), rtol=1e-6)


def _ema_pytorch_oracle(n_updates, p_stream, beta=0.9999, update_after_step=100,
                        update_every=10, inv_gamma=1.0, power=2.0 / 3.0, min_value=0.0):
    """Handwritten ema_pytorch semantics: EMA.update() called once per
    optimizer update with an internal call counter starting at 0."""
    ema = None
    step = 0
    initted = False
    for u in range(n_updates):
        p = p_stream[u]
        s = step
        step += 1
        if (s % update_every) != 0:
            continue
        if s <= update_after_step:
            ema = p.copy()
            continue
        if not initted:
            ema = p.copy()
            initted = True
        epoch = max(step - update_after_step - 1, 0.0)
        value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
        decay = 0.0 if epoch <= 0 else min(max(value, min_value), beta)
        ema = ema * decay + p * (1.0 - decay)
    return ema


def test_ema_matches_ema_pytorch_oracle():
    """Our in-graph EMA vs a handwritten ema_pytorch oracle over 300 updates:
    exact semantics match (ramped decay, warm copies, update_every gating)."""
    from f5e_tts_tpu.train import step as fstep

    ema_cfg = fstep.EMASettings(beta=0.9999, update_after_step=100, update_every=10,
                                inv_gamma=1.0, power=2.0 / 3.0, min_value=0.0)
    rng = np.random.default_rng(3)
    n = 300
    p_stream = rng.standard_normal((n, 5)).astype(np.float64)

    # replay our step-side EMA recurrence directly
    ema = np.zeros(5)
    for u in range(1, n + 1):  # u = new_update after the u-th optimizer update
        pre = u - 1
        if pre % ema_cfg.update_every != 0:
            continue
        hard_copy = pre <= ema_cfg.update_after_step + ema_cfg.update_every
        decay = float(fstep.ema_decay_at(jnp.asarray(u), ema_cfg))
        p = p_stream[u - 1]
        ema = p.copy() if hard_copy else ema * decay + p * (1 - decay)

    oracle = _ema_pytorch_oracle(n, p_stream)
    # exact recurrence; decay scalar evaluated in f32 on-device -> ~1e-7
    np.testing.assert_allclose(ema, oracle, rtol=1e-5, atol=1e-6)


def test_ema_in_graph_matches_oracle():
    """End-to-end: apply_gradients' EMA over many updates == oracle."""
    import optax

    from f5e_tts_tpu.train import step as fstep
    from f5e_tts_tpu.models.cfm import CFMLossOut

    ema_cfg = fstep.EMASettings(beta=0.99, update_after_step=3, update_every=2,
                                inv_gamma=1.0, power=2.0 / 3.0, min_value=0.0)
    opt = optax.sgd(0.1)
    params = {"w": jnp.asarray(np.ones(4, np.float32))}
    ts = fstep.init_train_state(params, {}, opt)
    rng = np.random.default_rng(5)
    grads_seq = rng.standard_normal((40, 4)).astype(np.float32)

    out = CFMLossOut(loss=jnp.float32(0.1), flow_loss=jnp.float32(0.1),
                     extra_loss=jnp.float32(0.0), new_state={}, cond=jnp.zeros(()),
                     pred=jnp.zeros(()))
    p_stream = []
    for g in grads_seq:
        ts, _ = fstep.apply_gradients(ts, jnp.float32(0.1), out, {"w": jnp.asarray(g)},
                                      optimizer=opt, ema=ema_cfg, grad_accum=1)
        p_stream.append(np.asarray(ts.params["w"], np.float64))

    oracle = _ema_pytorch_oracle(len(p_stream), np.stack(p_stream),
                                 beta=0.99, update_after_step=3, update_every=2)
    np.testing.assert_allclose(np.asarray(ts.ema_params["w"]), oracle, rtol=1e-5)
    assert int(ts.update) == 40 and int(ts.micro) == 40


def test_update_counts_optimizer_updates_under_accumulation():
    """With grad_accumulation_steps=k, `update` advances once per k successful
    micro-steps and the LR schedule advances in update units."""
    import optax

    from f5e_tts_tpu.train import step as fstep
    from f5e_tts_tpu.models.cfm import CFMLossOut

    tc = TrainConfig(learning_rate=1.0, num_warmup_updates=4, grad_accumulation_steps=2)
    opt = fstep.make_optimizer(tc, total_updates=8)
    params = {"w": jnp.ones(3)}
    ts = fstep.init_train_state(params, {}, opt)
    out = CFMLossOut(loss=jnp.float32(0.1), flow_loss=jnp.float32(0.1),
                     extra_loss=jnp.float32(0.0), new_state={}, cond=jnp.zeros(()),
                     pred=jnp.zeros(()))
    g = {"w": jnp.ones(3)}
    for i in range(6):
        ts, _ = fstep.apply_gradients(ts, jnp.float32(0.1), out, g, optimizer=opt,
                                      ema=fstep.EMASettings(), grad_accum=2)
    assert int(ts.micro) == 6
    assert int(ts.update) == 3  # 6 micro-steps / k=2

    # NaN micro-step: nothing advances
    ts, m = fstep.apply_gradients(ts, jnp.float32(np.nan), out, g, optimizer=opt,
                                  ema=fstep.EMASettings(), grad_accum=2)
    assert int(ts.micro) == 6 and int(ts.update) == 3 and int(ts.skipped) == 1

    # the inner schedule saw 3 updates: warmup step 3/4 of the ramp to lr=1.0
    sched = fstep.make_schedule(tc, total_updates=8)
    lr_now = float(sched(3))
    assert 0.5 < lr_now < 1.0


def test_trainer_rbg_prng(tmp_path):
    """prng_impl='rbg': the trainer swaps threefry for the TPU hardware RBG
    (dropout mask bits are VPU work under threefry). One step runs, loss is
    finite, and the config is restored afterwards."""
    import jax

    before = jax.config.jax_default_prng_impl
    ds = _toy_dataset()
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=300,
                                max_samples=2, len_multiple=32)
    import dataclasses

    arch = dataclasses.replace(ARCH, dropout=0.1)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=arch, mel=MEL,
                            cfm=CFMConfig())
    train_cfg = TrainConfig(
        learning_rate=1e-3, num_warmup_updates=2, batch_size_per_device=300,
        save_per_updates=1000, last_per_updates=1000, keep_last_n_checkpoints=1,
        save_dir=str(tmp_path / "ckpts"), seed=0, compute_dtype="float32",
        mesh=MeshConfig(data=1, model=1, seq=1), prng_impl="rbg",
    )
    try:
        trainer = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB),
                          tokenize=_tokenize)
        assert jax.config.jax_default_prng_impl == "rbg"
        ts = trainer.init_state(total_updates=4)
        step = trainer.make_step()
        batch = next(iter(loader))
        batch = trainer.device_batch(batch) if hasattr(trainer, "device_batch") else batch
        ts, metrics = step(ts, trainer.prepare_batch(batch)
                           if hasattr(trainer, "prepare_batch") else batch,
                           jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics.loss))
    finally:
        jax.config.update("jax_default_prng_impl", before)


def test_pretrained_weights_reach_train(tmp_path):
    """init_state(pretrained_path=...) then train() must TRAIN FROM those
    weights — the finetune/distill CLI contract. (Regression: train() used to
    re-init from scratch, silently discarding the pretrained load.)"""
    from f5e_tts_tpu.utils.torch_ckpt import dit_from_torch, load_torch_state_dict

    ds = _toy_dataset(4)
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=300, max_samples=2,
                                len_multiple=32)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=ARCH, mel=MEL)
    cfg1 = TrainConfig(learning_rate=1e-3, num_warmup_updates=1, last_per_updates=100,
                       save_per_updates=100, save_dir=str(tmp_path / "a"), seed=0,
                       compute_dtype="float32", mesh=MeshConfig(data=1, model=1, seq=1))
    Trainer(model_cfg, cfg1, vocab_size=len(VOCAB), tokenize=_tokenize).train(
        loader, epochs=1, resume=False, max_updates=2)
    ckpt = str(tmp_path / "a" / "model_last.safetensors")

    # lr=0: one update leaves params exactly at the pretrained values
    cfg2 = TrainConfig(learning_rate=0.0, num_warmup_updates=1, last_per_updates=100,
                       save_per_updates=100, save_dir=str(tmp_path / "b"), seed=7,
                       compute_dtype="float32", mesh=MeshConfig(data=1, model=1, seq=1))
    tr = Trainer(model_cfg, cfg2, vocab_size=len(VOCAB), tokenize=_tokenize)
    tr.init_state(total_updates=4, pretrained_path=ckpt)
    ts, _ = tr.train(loader, epochs=1, resume=False, max_updates=1)

    want, _ = dit_from_torch(load_torch_state_dict(ckpt, use_ema=True), ARCH)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(ts.params["time_embed"]["mlp1"]["w"])),
        np.asarray(want["time_embed"]["mlp1"]["w"]), atol=1e-6)
