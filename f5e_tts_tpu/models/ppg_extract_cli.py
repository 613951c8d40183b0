"""Offline PPG extraction over a file list, sharded across hosts.

reference: src/f5_tts/ppg/infer.py (single-file) and
src/f5_tts/ppg/parallel_infer.py:22-246 (one multiprocessing.Process per GPU).
TPU redesign: one jitted extraction graph per length bucket; the file list is
host-sharded with jax.process_index()/count() (no process pools — a single
chip saturates on batched extraction).

Usage:
  python -m f5e_tts_tpu.models.ppg_extract_cli --ckpt 33.pt --config train.yaml \
      --filelist wavs.txt --output_dir ppg_out [--output_type map ...]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    import jax.numpy as jnp
    import numpy as np

    from f5e_tts_tpu.eval.harness import shard_for_host
    from f5e_tts_tpu.infer.audio import read_wav, resample
    from f5e_tts_tpu.models.conformer import load_ppg_extractor

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="wenet ASR checkpoint (33.pt)")
    p.add_argument("--config", required=True, help="train.yaml")
    p.add_argument("--filelist", required=True, help="one wav path per line")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_type", default="ppg", choices=["ppg", "map"])
    p.add_argument("--map_mix_ratio", type=float, default=1.0)
    p.add_argument("--phn_center", default=None)
    p.add_argument("--ce_layer", default=None)
    p.add_argument("--bucket_seconds", type=float, default=2.0,
                   help="length bucket granularity (compile stability)")
    args = p.parse_args(argv)

    ext = load_ppg_extractor(args.ckpt, args.config, output_type=args.output_type,
                             map_mix_ratio=args.map_mix_ratio,
                             phn_center_path=args.phn_center,
                             ce_layer_path=args.ce_layer)
    os.makedirs(args.output_dir, exist_ok=True)

    with open(args.filelist, "r", encoding="utf-8") as f:
        files = [line.strip() for line in f if line.strip()]
    files = shard_for_host(files)

    bucket = int(args.bucket_seconds * 16_000)
    t0 = time.time()
    done = 0
    for path in files:
        wav, sr = read_wav(path)
        wav = resample(wav, sr, 16_000)
        t = -(-len(wav) // bucket) * bucket  # round up to bucket
        padded = np.zeros(t, np.float32)
        padded[: len(wav)] = wav
        ppg, true_len = ext.audio_to_ppg(jnp.asarray(padded[None]),
                                         jnp.asarray([len(wav)]))
        out = np.asarray(ppg[0])[: int(true_len[0])]
        name = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(args.output_dir, f"{name}.npy"), out)
        done += 1
        if done % 100 == 0:
            print(f"{done}/{len(files)} ({done / (time.time() - t0):.1f} files/s)")
    print(f"extracted {done} files in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
