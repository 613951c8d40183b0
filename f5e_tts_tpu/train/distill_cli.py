"""CFG-distillation entry point: teacher checkpoint -> cfg-free student.

Wraps the full Trainer (mesh sharding, EMA, checkpoint rotation, preemption,
resume) around the distillation loss (train/distill.py, arXiv 2504.20334):
the student's single forward learns the teacher's guidance-combined flow
(reference combines two passes per ODE step, cfm.py:439-448), so the
exported student checkpoint serves with ``cfg_strength=0`` at half the
sampler FLOPs per step.

Usage:
  python -m f5e_tts_tpu.train.distill_cli --config configs/example.yaml \
      --teacher ckpts/model_last.safetensors [--cfg_strength 2.0] \
      [--data_dir data] [--max_updates N]

The student initializes FROM the teacher (standard guidance distillation —
it only has to learn the guidance offset), unless --student points at a
different starting checkpoint.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from f5e_tts_tpu.config import load_train_yaml, load_yaml
    from f5e_tts_tpu.data.dataset import ArrowSpeechDataset, build_loader
    from f5e_tts_tpu.train.train import make_tokenize
    from f5e_tts_tpu.train.trainer import Trainer
    from f5e_tts_tpu.utils import text as ftext

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="training yaml (example.yaml layout)")
    p.add_argument("--teacher", required=True, help="teacher torch ckpt (.safetensors/.pt)")
    p.add_argument("--student", default=None,
                   help="student init ckpt; default: the teacher itself")
    p.add_argument("--cfg_strength", type=float, default=2.0,
                   help="guidance strength the student distills (the value "
                        "the teacher would have served with)")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--max_updates", type=int, default=None)
    p.add_argument("--no_resume", action="store_true")
    args = p.parse_args(argv)

    model_cfg = load_yaml(args.config)
    train_cfg = load_train_yaml(args.config)

    import yaml

    with open(args.config, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    dataset_name = args.dataset_name or raw.get("datasets", {}).get("name", "Emilia_ZH_EN")

    vocab, vocab_size = ftext.get_tokenizer(
        model_cfg.tokenizer_path or dataset_name, model_cfg.tokenizer,
        data_dir=args.data_dir)
    tokenize = make_tokenize(model_cfg, vocab)

    dataset_type = raw.get("datasets", {}).get("dataset_type", "CustomDataset")
    if dataset_type == "CustomDataset":
        ds_dir = os.path.join(args.data_dir, f"{dataset_name}_{model_cfg.tokenizer}")
        dataset = ArrowSpeechDataset.from_dir(ds_dir, mel=model_cfg.mel)
    else:
        from f5e_tts_tpu.data.dataset import load_speech_dataset

        dataset = load_speech_dataset(dataset_name, model_cfg.tokenizer,
                                      dataset_type=dataset_type,
                                      data_root=args.data_dir, mel=model_cfg.mel)
    loader = build_loader(dataset, tokenize,
                          frames_threshold=train_cfg.batch_size_per_device,
                          max_samples=train_cfg.max_samples, seed=train_cfg.seed)

    def log_fn(metrics, update):
        if update % 10 == 0:
            print(f"update {update}: distill_loss={metrics['loss']:.5f} "
                  f"grad_norm={metrics['grad_norm']:.3f}")

    trainer = Trainer(model_cfg, train_cfg, vocab_size=vocab_size,
                      tokenize=tokenize, log_fn=log_fn,
                      distill_cfg_strength=args.cfg_strength)
    trainer.set_teacher(args.teacher)
    # student starts as the teacher (learns only the guidance offset)
    trainer.init_state(len(loader) * train_cfg.epochs,
                       pretrained_path=args.student or args.teacher)
    ts, info = trainer.train(loader, resume=not args.no_resume,
                             max_updates=args.max_updates)
    print(f"distilled: {info['updates']} updates in {info['seconds']:.0f}s; "
          f"serve the exported checkpoint with cfg_strength=0")
    return ts


if __name__ == "__main__":
    main()
