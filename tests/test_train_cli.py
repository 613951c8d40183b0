"""CLI-level train/distill entry tests: yaml + dataset dir -> main().

These drive the ACTUAL command-line mains (train.main, distill_cli.main) over
a real on-disk arrow dataset + vocab + yaml — the layer where wiring bugs
live (the round-4 `--pretrained`-discarded bug was invisible to all
Trainer-level tests). reference flow: src/f5_tts/train/train.py:18-105.
"""

import json
import os

import numpy as np
import jax
import pytest


def _make_dataset_dir(root, name="Toy", tokenizer="char", n=6, sr=8000):
    """data/{name}_{tokenizer}/ with raw/ (arrow rows), duration.json, vocab.txt."""
    from datasets import Dataset as ArrowDataset

    ds_dir = os.path.join(root, f"{name}_{tokenizer}")
    os.makedirs(ds_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows, durations = [], []
    for i in range(n):
        dur = 0.5 + 0.1 * (i % 3)
        t = int(dur * sr)
        rows.append({
            "audio": {"array": (0.1 * rng.standard_normal(t)).astype(np.float32),
                      "sampling_rate": sr},
            "text": "abc def gh"[: 4 + i % 5],
            "duration": dur,
        })
        durations.append(dur)
    ArrowDataset.from_list(rows).save_to_disk(os.path.join(ds_dir, "raw"))
    with open(os.path.join(ds_dir, "duration.json"), "w") as f:
        json.dump({"duration": durations}, f)
    with open(os.path.join(ds_dir, "vocab.txt"), "w") as f:
        f.write(" \n" + "\n".join("abcdefgh") + "\n")
    return ds_dir


def _write_yaml(path, save_dir, name="Toy"):
    path.write_text(f"""
datasets:
  name: {name}
  batch_size_per_gpu: 300
  batch_size_type: frame
  max_samples: 2

optim:
  epochs: 1
  learning_rate: 1.0e-3
  num_warmup_updates: 2
  grad_accumulation_steps: 1
  max_grad_norm: 1.0

model:
  name: tiny
  tokenizer: char
  backbone: DiT
  arch:
    dim: 32
    depth: 1
    heads: 1
    dim_head: 32
    ff_mult: 2
    mel_dim: 8
    text_dim: 16
    conv_layers: 0
    dropout: 0.0
  mel_spec:
    target_sample_rate: 8000
    n_mel_channels: 8
    hop_length: 64
    win_length: 256
    n_fft: 256
    mel_spec_type: vocos

ckpts:
  save_per_updates: 100
  last_per_updates: 2
  keep_last_n_checkpoints: 2
  save_dir: {save_dir}

mesh:
  data: 1
""")


def test_train_cli_end_to_end(tmp_path):
    """python -m f5e_tts_tpu.train.train equivalent: 3 updates over the toy
    arrow dataset, checkpoint written, then a --pretrained restart actually
    trains FROM the exported weights (CLI-level regression for the
    init_state-discard bug)."""
    from f5e_tts_tpu.train.train import main as train_main
    from f5e_tts_tpu.utils.torch_ckpt import dit_from_torch, load_torch_state_dict
    from f5e_tts_tpu.config import load_yaml

    data_dir = str(tmp_path / "data")
    _make_dataset_dir(data_dir)
    cfg = tmp_path / "toy.yaml"
    save1 = str(tmp_path / "run1")
    _write_yaml(cfg, save1)

    train_main(["--config", str(cfg), "--data_dir", data_dir,
                "--max_updates", "3", "--no_resume"])
    ckpt = os.path.join(save1, "model_last.safetensors")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(save1, "model_last.orbax"))

    # restart pretrained with lr=0 -> params stay at the exported values
    cfg2 = tmp_path / "toy2.yaml"
    save2 = str(tmp_path / "run2")
    _write_yaml(cfg2, save2)
    t = cfg2.read_text().replace("learning_rate: 1.0e-3", "learning_rate: 0.0")
    cfg2.write_text(t)
    ts = train_main(["--config", str(cfg2), "--data_dir", data_dir,
                     "--max_updates", "1", "--no_resume", "--pretrained", ckpt])
    arch = load_yaml(str(cfg2)).arch
    want, _ = dit_from_torch(load_torch_state_dict(ckpt, use_ema=True), arch)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(ts.params["time_embed"]["mlp1"]["w"])),
        np.asarray(want["time_embed"]["mlp1"]["w"]), atol=1e-6)


def test_distill_cli_end_to_end(tmp_path):
    """distill_cli over a teacher checkpoint: student initializes FROM the
    teacher, distills for 2 updates with finite losses, and exports a
    student checkpoint that re-ingests."""
    from f5e_tts_tpu.train.distill_cli import main as distill_main
    from f5e_tts_tpu.train.train import main as train_main
    from f5e_tts_tpu.utils.torch_ckpt import load_torch_state_dict

    data_dir = str(tmp_path / "data")
    _make_dataset_dir(data_dir)
    cfg = tmp_path / "toy.yaml"
    save1 = str(tmp_path / "teacher")
    _write_yaml(cfg, save1)
    train_main(["--config", str(cfg), "--data_dir", data_dir,
                "--max_updates", "2", "--no_resume"])
    teacher = os.path.join(save1, "model_last.safetensors")

    cfg2 = tmp_path / "distill.yaml"
    save2 = str(tmp_path / "student")
    _write_yaml(cfg2, save2)
    ts = distill_main(["--config", str(cfg2), "--data_dir", data_dir,
                       "--teacher", teacher, "--max_updates", "2",
                       "--no_resume", "--cfg_strength", "2.0"])
    assert int(ts.update) == 2
    student = os.path.join(save2, "model_last.safetensors")
    assert os.path.exists(student)
    sd = load_torch_state_dict(student, use_ema=True)
    assert all(np.isfinite(v).all() for v in sd.values())
