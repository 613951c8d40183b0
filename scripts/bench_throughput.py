"""Batched-serving throughput benchmark: utterances/sec/chip at batch B.

Complements bench.py's bs=1 latency RTF (the north-star's secondary headline:
batched utterances/sec/chip). Run on the real chip:

  python scripts/bench_throughput.py [--batch 4] [--nfe 32]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from f5e_tts_tpu.config import CFMConfig, preset
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--bucket", type=int, default=1536)
    p.add_argument("--unroll", type=int, default=1,
                   help="lax.scan unroll for the NFE loop (carry-copy lever)")
    p.add_argument("--scan-unroll", type=int, default=1,
                   help="depth-scan unroll (DiTConfig.scan_unroll)")
    args = p.parse_args()

    import dataclasses

    model_cfg = preset("F5TTS_v1_Base")
    arch = dataclasses.replace(model_cfg.arch, scan_unroll=args.scan_unroll)
    cfm = CFMConfig(ode_unroll=args.unroll)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, 2545)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    voc_cfg = VocosConfig()
    voc = jax.tree.map(lambda a: a.astype(jnp.bfloat16), init_vocos(jax.random.PRNGKey(1), voc_cfg))

    b = args.batch
    hop, sr = 256, 24_000
    ref_frames, total_frames = 472, 1416
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((b, ref_frames, arch.mel_dim)).astype(np.float32))
    inputs = fcfm.prepare_inputs(
        cond, jnp.full((b,), ref_frames, jnp.int32), jnp.full((b,), total_frames, jnp.int32),
        args.bucket, text_ids=jnp.asarray(rng.integers(0, 2545, (b, 160)).astype(np.int32)))

    @jax.jit
    def synth(params, voc, inputs, key):
        out, _ = fcfm.sample(params, state, arch, cfm, inputs, key, steps=args.nfe,
                             cfg_strength=2.0, sway_coef=-1.0, use_mask=True,
                             compute_dtype=jnp.bfloat16)
        return vocos_decode(voc, voc_cfg, out.astype(jnp.bfloat16), compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(42)
    wav = synth(params, voc, inputs, key)
    wav.block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        wav = synth(params, voc, inputs, jax.random.fold_in(key, i))
    wav.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    audio_s = b * total_frames * hop / sr
    print(json.dumps({
        "batch": b, "nfe": args.nfe, "bucket": args.bucket,
        "sec_per_batch": round(dt, 4),
        "utterances_per_sec": round(b / dt, 3),
        "rtf_per_chip": round(dt / audio_s, 5),
        "audio_s_per_s": round(audio_s / dt, 2),
    }))


if __name__ == "__main__":
    main()
