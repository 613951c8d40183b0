"""Device duty-cycle profile of the batched synth graph (VERDICT r2 #3).

Answers "why is utterances/sec flat from bs=1 to bs=8?" with a trace instead
of a shrug: traces ONE jitted sampler+vocoder call at the given batch size,
parses the perfetto JSON directly (the tensorboard-plugin converter is
incompatible with the installed TF), and reports

  - wall time of the traced call
  - device busy time (union of device-lane op spans, overlap-merged)
  - duty cycle (busy/wall) — >90% busy at bs=1 means batching has no idle
    gaps to fill and throughput is compute-bound flat
  - top ops by total device time

Run on the real chip:
  python scripts/profile_duty.py --batch 1
  python scripts/profile_duty.py --batch 8
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def load_trace(trace_dir: str) -> dict:
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f)


def device_busy(trace: dict):
    """(busy_seconds, per-op SELF-time totals) over the device op lanes.

    Perfetto JSON: process names mark TPU/device vs host threads; 'ts'/'dur'
    are microseconds. On TPU the device process has three lanes —
    "Steps", "XLA Modules" (the whole jitted call as one span), and
    "XLA Ops" (HLO instructions, NESTED: while.N spans contain their body
    ops). Summing raw durations double-counts every loop body under its
    while span (and the whole step under the module span), which is how the
    first round-4 trace reported categories at 261% of busy. We therefore
    (a) keep only the "XLA Ops" lanes and (b) report per-op *self* time via
    a stack sweep (a parent's time minus its children's), so totals sum to
    device-busy exactly."""
    pnames = {}
    tnames = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e.get("args", {}).get("name", "")
    dev_pids = {pid for pid, n in pnames.items()
                if any(k in n.lower() for k in ("tpu", "device", "/device", "xla"))
                and "host" not in n.lower()}
    if not dev_pids:  # CPU backend: compute lanes live under the host process
        dev_pids = {pid for pid, n in pnames.items() if "cpu" in n.lower()}
    op_lanes = {k for k, n in tnames.items()
                if k[0] in dev_pids and "xla ops" in n.lower()}
    if dev_pids and not op_lanes and tnames:
        # Without the "XLA Ops" lane filter, the whole-step "XLA Modules"
        # span is counted alongside its constituent ops and per-op totals
        # return to ~2x device-busy — make the regression loud, not silent.
        print("WARNING: device process found but no 'XLA Ops' lane; "
              "per-op totals may double-count module/step spans",
              file=sys.stderr)

    by_lane = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = (e["pid"], e.get("tid"))
        if op_lanes and lane not in op_lanes:
            continue
        ts, dur = e.get("ts", 0), e.get("dur", 0)
        if dur <= 0:
            continue
        by_lane.setdefault(lane, []).append((ts, dur, e.get("name", "?")))

    spans = []
    per_op = {}
    for evs in by_lane.values():
        # self-time stack sweep per lane: events in start order, a child
        # starts before its parent ends; subtract each child's dur from
        # the innermost open parent
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # (end_ts, name)
        for ts, dur, name in evs:
            spans.append((ts, ts + dur))
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                per_op[stack[-1][1]] = per_op.get(stack[-1][1], 0) - dur
            per_op[name] = per_op.get(name, 0) + dur
            stack.append((ts + dur, name))
    spans.sort()
    busy = 0.0
    cur_s = cur_e = None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy / 1e6, {k: v / 1e6 for k, v in per_op.items()}, pnames


def main():
    from f5e_tts_tpu.config import CFMConfig, preset
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--bucket", type=int, default=1536)
    p.add_argument("--trace_dir", default="/tmp/duty_trace")
    p.add_argument("--top", type=int, default=12)
    args = p.parse_args()

    model_cfg = preset("F5TTS_v1_Base")
    arch = model_cfg.arch
    cfm = CFMConfig()
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, 2545)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    voc_cfg = VocosConfig()
    voc = jax.tree.map(lambda a: a.astype(jnp.bfloat16), init_vocos(jax.random.PRNGKey(1), voc_cfg))

    b = args.batch
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
    synth(params, voc, inputs, key).block_until_ready()  # compile
    synth(params, voc, inputs, key).block_until_ready()  # warm

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    synth(params, voc, inputs, jax.random.fold_in(key, 1)).block_until_ready()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    trace = load_trace(args.trace_dir)
    busy, per_op, pnames = device_busy(trace)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]
    print(json.dumps({
        "batch": b, "nfe": args.nfe, "bucket": args.bucket,
        "wall_s": round(wall, 4), "device_busy_s": round(busy, 4),
        "duty_pct": round(100 * busy / wall, 1),
        "utt_per_s": round(b / wall, 3),
    }))
    print("process lanes:", json.dumps(pnames))
    for name, s in top:
        print(f"  {s*1e3:9.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
