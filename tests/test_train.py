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
