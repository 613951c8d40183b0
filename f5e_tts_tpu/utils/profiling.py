"""Profiling / tracing hooks and FLOPs accounting.

reference: the reference's tracing is NVTX ranges + cudaProfilerStart
(benchmark.py:471-479) and a thop FLOPs counter
(scripts/count_params_gflops.py:26-40). TPU equivalents: jax.profiler traces
(xplane, viewable in XProf/TensorBoard), named annotations, and an analytic
FLOPs/params counter for the DiT/UNetT backbones.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block (xplane protobuf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range visible in the profiler (NVTX-range equivalent)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def wallclock(label: str, results: Optional[dict] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"[{label}] {dt * 1e3:.1f} ms")


def start_server(port: int = 9999) -> None:
    """On-demand profiling server (capture via xprof / tensorboard profile)."""
    jax.profiler.start_server(port)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def dit_flops(cfg, seq_len: int, text_len: int = 150) -> float:
    """Analytic forward FLOPs for one DiT call (counts multiply-adds as 2 ops,
    matching thop conventions — scripts/count_params_gflops.py:26-40)."""
    d, depth, dh = cfg.dim, cfg.depth, cfg.heads * cfg.dim_head
    n = seq_len
    per_layer = (
        2 * n * d * (3 * dh)  # qkv proj
        + 2 * n * d * dh  # out proj
        + 2 * 2 * n * n * dh  # qk^T + av
        + 2 * 2 * n * d * (d * cfg.ff_mult)  # ff1 + ff2
        + 2 * d * 6 * d  # adaLN modulation (per sample, not per token)
    )
    # NOTE: the reference's "363.4 GFLOPs" (count_params_gflops.py) is thop
    # output = multiply-accumulates, and thop does not see the functional
    # F.scaled_dot_product_attention — true forward FLOPs are ~2.8x that.
    text_dim = cfg.text_dim if cfg.text_dim is not None else cfg.mel_dim
    embed = (
        2 * n * (2 * cfg.mel_dim + text_dim) * d  # input proj
        + 2 * 2 * n * d * 31 * (d // 16)  # conv pos embed (2 taps convs)
        + cfg.conv_layers * (2 * n * text_dim * 7 + 2 * 2 * n * text_dim * text_dim * 2)
    )
    out = 2 * n * d * cfg.mel_dim + 2 * n * d * 2 * d
    return float(depth * per_layer + embed + out)


def report_model_stats(cfg, vocab_size: int = 2545, seconds: float = 20.0,
                       hop: int = 256, sr: int = 24000) -> dict:
    """Params + GFLOPs for a given audio length (reference prints DiT-Base
    335.8M / 363.4 GFLOPs @ 20 s)."""
    from f5e_tts_tpu.models import backbone as fbb

    params, _ = fbb.init_backbone(jax.random.PRNGKey(0), cfg, vocab_size)
    n = int(seconds * sr / hop)
    stats = {
        "params_m": count_params(params) / 1e6,
        "gflops_fwd": dit_flops(cfg, n) / 1e9,
        "seq_len": n,
    }
    return stats
