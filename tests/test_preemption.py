"""Preemption: SIGTERM during training checkpoints and exits cleanly."""

import os
import signal
import threading

import numpy as np
import pytest

from f5e_tts_tpu.config import DiTConfig, MelConfig, MeshConfig, ModelConfig, TrainConfig
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


def test_sigterm_checkpoints_and_stops(tmp_path):
    rng = np.random.default_rng(0)
    rows = [{"audio": {"array": (0.1 * rng.standard_normal(6000)).astype(np.float32),
                       "sampling_rate": 8000},
             "text": "abc de", "duration": 0.75} for _ in range(8)]
    ds = fdata.ArrowSpeechDataset(rows, durations=[r["duration"] for r in rows], mel=MEL)
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=200, max_samples=1,
                                len_multiple=32)

    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=ARCH, mel=MEL)
    train_cfg = TrainConfig(learning_rate=1e-3, num_warmup_updates=1,
                            save_per_updates=10**9, last_per_updates=10**9,
                            save_dir=str(tmp_path / "ck"), compute_dtype="float32",
                            mesh=MeshConfig(data=1, model=1, seq=1))

    fired = {"at": None}

    def log_fn(metrics, update):
        if update == 2 and fired["at"] is None:
            fired["at"] = update
            os.kill(os.getpid(), signal.SIGTERM)

    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB), tokenize=_tokenize,
                      log_fn=log_fn)
    ts, info = trainer.train(loader, epochs=5, resume=False)
    assert info["preempted"] is True
    assert int(ts.update) == 2  # stopped right after the signal
    assert os.path.exists(tmp_path / "ck" / "model_last.orbax")
