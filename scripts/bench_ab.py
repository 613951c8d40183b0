"""Paired A/B sampler benchmark: interleaved configs in ONE process.

Through the axon tunnel, back-to-back `bench.py` runs disagree by ±15%
(chip/tunnel period drift), which is larger than most lever effects. This
driver builds a jitted synthesize fn per config, warms them all up, then
times them INTERLEAVED round-robin — every config sees the same drift, so
the *ratios* are trustworthy even when the absolute RTFs wander.

Usage:
    python scripts/bench_ab.py --nfe 16 --ab scan_unroll=1 scan_unroll=2
    python scripts/bench_ab.py --nfe 16 --ab 'scan_unroll=1,quantize=int8' \
        'scan_unroll=2,quantize=int8'

Each --ab spec is comma-separated key=value pairs over:
    scan_unroll=<int>   DiTConfig depth-scan unroll
    ode_unroll=<int>    CFMConfig NFE-loop unroll
    quantize=int8       W8A8 trunk quantization
    cfg=<float>         cfg_strength (0 = distilled single-pass mode)

Prints one JSON line per config plus a final ratios line (all vs spec[0]).
Reference perf baseline: TRT-LLM RTF 0.0402 @ NFE16 bs=1 on L20
(reference runtime/triton_trtllm/README.md:65).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import statistics
import sys
import time

sys.path.insert(0, ".")  # run as `python scripts/bench_ab.py` from the repo root


def parse_spec(s: str) -> dict:
    out = {}
    for kv in s.split(","):
        k, v = kv.split("=")
        k = k.strip()
        v = v.strip()
        if k in ("scan_unroll", "ode_unroll"):
            out[k] = int(v)
        elif k == "cfg":
            out[k] = float(v)
        elif k == "quantize":
            out[k] = v
        else:
            raise ValueError(f"unknown A/B key {k!r}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfe", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=6,
                    help="interleaved timing rounds per config")
    ap.add_argument("--iters", type=int, default=2,
                    help="synthesize calls per timing round")
    ap.add_argument("--ab", nargs="+", required=True,
                    help="config specs, e.g. scan_unroll=1 scan_unroll=2")
    args = ap.parse_args()
    specs = [parse_spec(s) for s in args.ab]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5e_tts_tpu.config import CFMConfig, preset
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    model_cfg = preset("F5TTS_v1_Base")
    vocab = 2545
    base_params, state = fdit.init_dit(jax.random.PRNGKey(0),
                                       model_cfg.arch, vocab)
    base_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        base_params)
    voc_cfg = VocosConfig()
    voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)
    voc_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        voc_params)

    b = args.batch
    hop, sr = 256, 24_000
    ref_frames, total_frames = 472, 1416
    n = 1536
    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.standard_normal((b, ref_frames, model_cfg.arch.mel_dim))
        .astype(np.float32))
    lens = jnp.full((b,), ref_frames, jnp.int32)
    duration = jnp.full((b,), total_frames, jnp.int32)
    text_ids = jnp.asarray(rng.integers(0, vocab, (b, 160)).astype(np.int32))
    inputs = fcfm.prepare_inputs(cond, lens, duration, n, text_ids=text_ids)

    fns, pss = [], []
    for spec in specs:
        arch = dataclasses.replace(
            model_cfg.arch, scan_unroll=spec.get("scan_unroll", 1))
        cfm = CFMConfig(ode_unroll=spec.get("ode_unroll", 1))
        params = base_params
        if spec.get("quantize") == "int8":
            from f5e_tts_tpu.ops.quant import quantize_dit_params
            params = quantize_dit_params(base_params)
        cfg_strength = spec.get("cfg", 2.0)

        def make(arch=arch, cfm=cfm, cfg_strength=cfg_strength):
            @jax.jit
            def synthesize(params, voc_params, inputs, key):
                out, _ = fcfm.sample(
                    params, state, arch, cfm, inputs, key,
                    steps=args.nfe, cfg_strength=cfg_strength,
                    sway_coef=-1.0, use_mask=True,
                    compute_dtype=jnp.bfloat16)
                return vocos_decode(voc_params, voc_cfg,
                                    out.astype(jnp.bfloat16),
                                    compute_dtype=jnp.bfloat16)
            return synthesize
        fns.append(make())
        pss.append(params)

    key = jax.random.PRNGKey(42)
    # compile + warm each config to steady state before any timing: the
    # first 2-4 post-compile executions run up to 3x slower (see bench.py),
    # so a single warmup call leaves round 1 ramp-inflated.
    for f, p in zip(fns, pss):
        for i in range(4):
            wav = f(p, voc_params, inputs, jax.random.fold_in(key, 100 + i))
        wav.block_until_ready()

    times = [[] for _ in specs]
    k = 0
    for _ in range(args.rounds):
        for ci, (f, p) in enumerate(zip(fns, pss)):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                k += 1
                wav = f(p, voc_params, inputs, jax.random.fold_in(key, k))
            wav.block_until_ready()
            times[ci].append((time.perf_counter() - t0) / args.iters)

    audio_s = b * total_frames * hop / sr
    meds = []
    for spec, ts in zip(specs, times):
        med = statistics.median(ts)
        rtf = med / audio_s
        meds.append(rtf)
        print(json.dumps({
            "spec": spec, "nfe": args.nfe, "batch": b,
            "rtf_median": round(rtf, 5),
            "rtf_all": [round(t / audio_s, 5) for t in ts],
        }))
    print(json.dumps({
        "ratios_vs_first": [round(m / meds[0], 4) for m in meds],
    }))


if __name__ == "__main__":
    main()
