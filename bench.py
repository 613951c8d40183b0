"""Headline benchmark: batched TTS sampling throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "rtf_nfe32", "value": ..., "unit": "decode_s_per_audio_s", "vs_baseline": ...}

Baseline: the reference's offline TensorRT-LLM RTF 0.0402 at NFE=16 on an L20
(runtime/triton_trtllm/README.md:65); the canonical quality setting is NFE=32
(utils_infer.py:54). We report RTF at NFE=32 with the full folded-CFG sampler
+ Vocos decode; vs_baseline = baseline_rtf / our_rtf at equal NFE (>1 = faster).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def _probe_backend(timeout_s: float) -> bool:
    """Check the accelerator backend comes up, in a subprocess.

    A dead axon tunnel makes ``jax.devices()`` HANG (not raise), so the probe
    must be a separate process we can kill: an in-process try/except would
    wedge the whole benchmark. Returns True iff a backend initialized within
    ``timeout_s``.
    """
    code = os.environ.get("F5E_BENCH_PROBE_CODE",
                          "import jax; jax.devices(); print('ok')")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            env=os.environ.copy(),
        )
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False
    except OSError:
        return False


def _ensure_backend(metric: str) -> None:
    """Bounded retry on backend init; structured JSON error on final failure.

    Round-3 postmortem: the axon tunnel died mid-session and bench.py's
    record for the round was a raw 30-line RuntimeError traceback with rc=1.
    Rounds must stay machine-comparable, so on final failure we emit ONE
    parseable JSON line and exit 0.
    """
    delays = (0, 30, 60)  # three attempts, ~3.5 min worst case w/ 60s probes
    probe_timeout = float(os.environ.get("F5E_BENCH_PROBE_TIMEOUT", "75"))
    if os.environ.get("F5E_BENCH_NO_RETRY"):  # tests: single fast attempt
        delays = (0,)
    for d in delays:
        if d:
            time.sleep(d)
        if _probe_backend(timeout_s=probe_timeout):
            return
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": "decode_s_per_audio_s",
        "vs_baseline": None,
        "error": "tpu_backend_unavailable",
    }))
    sys.exit(0)


def _note_blocked_artifacts() -> None:
    """One stderr line naming the still-blocked reference artifacts.

    VERDICT r4 #8: every round's BENCH record should carry the blocked list
    so 'real-ckpt parity pending' stays visible. stderr keeps stdout's
    one-JSON-line contract intact.
    """
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "artifact_watch",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "artifact_watch.py"))
        aw = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(aw)
        found = aw.scan()
        blocked = [k for k, v in found.items() if not v]
        if blocked:
            print(f"NOTE blocked artifacts (parity pending): {','.join(blocked)}",
                  file=sys.stderr)
        else:
            print("NOTE all reference artifacts present — run scripts/artifact_watch.py",
                  file=sys.stderr)
    except Exception:
        pass


def main():
    # optional overrides: the driver runs bare (NFE-32 bs-1 headline);
    # --nfe 16 reproduces the reference's production serving configuration
    # (runtime/triton_trtllm/README.md:65, RTF 0.0402 offline bs=1 on L20)
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfe", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    # opt-in W8A8 trunk quantization (ops/quant.py) — the api.py
    # F5TTS(quantize="int8") serving path, reproducible from the bench CLI
    ap.add_argument("--quantize", choices=["int8"], default=None)
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll for the NFE loop (carry-copy lever)")
    ap.add_argument("--prune", default=None,
                    help="EPSS-pruned schedule (arXiv 2505.19931): comma-separated "
                         "keep indices into the --nfe sway grid, e.g. "
                         "'0,1,2,3,5,9,17,32' — NFE becomes len-1")
    ap.add_argument("--scan-unroll", type=int, default=1,
                    help="depth-scan unroll (DiTConfig.scan_unroll)")
    ap.add_argument("--cfg", type=float, default=2.0,
                    help="cfg_strength; 0 = the CFG-distilled serving mode "
                         "(train/distill.py): ONE backbone pass per ODE step "
                         "instead of the folded cond+uncond pair")
    args = ap.parse_args()
    keep = [int(i) for i in args.prune.split(",")] if args.prune else None
    eff_nfe = (len(keep) - 1) if keep else args.nfe
    _ensure_backend(f"rtf_nfe{eff_nfe}_bs{args.batch}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5e_tts_tpu.config import CFMConfig, preset
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    import dataclasses

    model_cfg = preset("F5TTS_v1_Base")
    arch = dataclasses.replace(model_cfg.arch, scan_unroll=args.scan_unroll)
    cfm = CFMConfig(ode_unroll=args.unroll)
    vocab = 2545

    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, vocab)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    if args.quantize == "int8":
        from f5e_tts_tpu.ops.quant import quantize_dit_params
        params = quantize_dit_params(params)
    voc_cfg = VocosConfig()
    voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)
    voc_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, voc_params)

    # benchmark shape: batch 1 (matching the reference's offline bs=1 RTF),
    # 10 s of generated audio after a ~5 s prompt
    b = args.batch
    hop, sr = 256, 24_000
    ref_frames, total_frames = 472, 1416  # ~5 s prompt, ~15 s total
    n = 1536  # padded bucket
    nfe = args.nfe

    ts_grid = (fcfm.pruned_sway_timesteps(keep, base_steps=nfe, sway_coef=-1.0)
               if keep else None)
    nfe = eff_nfe

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((b, ref_frames, arch.mel_dim)).astype(np.float32))
    lens = jnp.full((b,), ref_frames, jnp.int32)
    duration = jnp.full((b,), total_frames, jnp.int32)
    text_ids = jnp.asarray(rng.integers(0, vocab, (b, 160)).astype(np.int32))
    inputs = fcfm.prepare_inputs(cond, lens, duration, n, text_ids=text_ids)

    # ONE jitted graph for sampler + vocoder — an eager vocos_decode tail runs
    # op-by-op through the dispatch path (measured ~100+ ms of pure overhead)
    @jax.jit
    def synthesize(params, voc_params, inputs, key):
        # use_mask=True: the exact serving configuration (pipeline.py always
        # samples with the attention mask on)
        out, _ = fcfm.sample(params, state, arch, cfm, inputs, key,
                             steps=nfe, cfg_strength=args.cfg, sway_coef=-1.0,
                             use_mask=True, timesteps=ts_grid,
                             compute_dtype=jnp.bfloat16)
        return vocos_decode(voc_params, voc_cfg, out.astype(jnp.bfloat16),
                            compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(42)
    # compile + warm to steady state: the first 2-4 post-compile executions
    # through the tunnel run up to 3x slower (executable upload / device
    # ramp) — a paired in-process A/B (scripts/bench_ab.py) showed iter-1 at
    # 0.059 RTF vs 0.0185 steady at the same config, so a 5-iter mean over a
    # single warmup call misreports steady-state RTF by ~1.8x.
    for i in range(4):
        wav = synthesize(params, voc_params, inputs, jax.random.fold_in(key, 100 + i))
    wav.block_until_ready()

    # per-iteration timing, median reported (reference RTF convention is
    # steady-state serving latency; TRT numbers are likewise post-warmup)
    iters = 8
    samples = []
    for i in range(iters):
        t0 = time.perf_counter()
        wav = synthesize(params, voc_params, inputs, jax.random.fold_in(key, i))
        wav.block_until_ready()
        samples.append(time.perf_counter() - t0)
    dt = statistics.median(samples)

    # full output duration (reference RTF convention); batch>1 divides wall
    # across every utterance produced
    audio_s = b * total_frames * hop / sr
    rtf = dt / audio_s
    # L20 TRT-LLM at NFE=16 (README.md:65), NFE-normalized to the measured nfe
    baseline_rtf = 0.0402 * (nfe / 16)
    _note_blocked_artifacts()  # lands adjacent to the metric in BENCH tails
    print(json.dumps({
        "metric": f"rtf_nfe{nfe}_bs{b}",
        "value": round(rtf, 5),
        "unit": "decode_s_per_audio_s",
        "vs_baseline": round(baseline_rtf / rtf, 3),
    }))


if __name__ == "__main__":
    main()
