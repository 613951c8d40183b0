"""Epoch calculator for frame-packed (adaptive) batching.

Given a corpus size in hours and the per-device frame budget, compute the
`epochs` setting that yields a wanted number of optimizer updates.
reference: src/f5_tts/scripts/count_max_epoch.py (hardcoded constants there;
argparse here).

  python scripts/count_max_epoch.py --total_hours 95282 --devices 8 \
      --frames_per_device 38400 --wanted_max_updates 1200000
"""

from __future__ import annotations

import argparse
import json


def count_max_epoch(total_hours: float, devices: int, frames_per_device: int,
                    wanted_max_updates: int, grad_accum: int = 1,
                    hop_length: int = 256, sample_rate: int = 24000) -> dict:
    mini_batch_frames = frames_per_device * grad_accum * devices
    mini_batch_hours = mini_batch_frames * hop_length / sample_rate / 3600
    updates_per_epoch = total_hours / mini_batch_hours
    epochs = wanted_max_updates / updates_per_epoch
    return {
        "epochs": round(epochs),
        "updates_per_epoch": round(updates_per_epoch),
        "mini_batch_frames": mini_batch_frames,
        "mini_batch_hours": round(mini_batch_hours, 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--total_hours", type=float, required=True)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--frames_per_device", type=int, default=38400)
    p.add_argument("--wanted_max_updates", type=int, default=1_200_000)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--hop_length", type=int, default=256)
    p.add_argument("--sample_rate", type=int, default=24000)
    args = p.parse_args(argv)
    out = count_max_epoch(args.total_hours, args.devices, args.frames_per_device,
                          args.wanted_max_updates, args.grad_accum,
                          args.hop_length, args.sample_rate)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
