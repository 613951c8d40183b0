"""Serving benchmark harness: RTF + latency percentiles, offline or client-server.

reference: src/f5_tts/runtime/triton_trtllm/benchmark.py (torchrun DDP harness,
warmup, NVTX, RTF = decode_time/audio_duration :542-552) and
client_grpc.py latency percentile stats. TPU redesign: warmup compiles the
bucket ladder; offline mode times the jitted sampler directly; server mode
drives the socket server like a real client fleet (threads).

Usage:
  python -m f5e_tts_tpu.serving.benchmark offline --ckpt ... --nfe 16
  python -m f5e_tts_tpu.serving.benchmark server --host 127.0.0.1 --port 9998 \
      --concurrency 2 --requests 26
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from typing import List

import numpy as np


def percentile_stats(latencies: List[float]) -> dict:
    a = np.asarray(latencies)
    if a.size == 0:
        return {}
    return {
        "p50_ms": float(np.percentile(a, 50) * 1e3),
        "p90_ms": float(np.percentile(a, 90) * 1e3),
        "p99_ms": float(np.percentile(a, 99) * 1e3),
        "mean_ms": float(a.mean() * 1e3),
    }


def bench_offline(engine, ref_wav: np.ndarray, ref_sr: int, ref_text: str,
                  texts: List[str], nfe: int, warmup: bool = True) -> dict:
    """Offline RTF over a list of prompts (benchmark.py offline mode)."""
    if warmup:
        _ = engine.infer(ref_wav, ref_sr, ref_text, texts[0], nfe_steps=nfe)
    t0 = time.perf_counter()
    total_audio = 0.0
    latencies = []
    for text in texts:
        t1 = time.perf_counter()
        wav, sr, _ = engine.infer(ref_wav, ref_sr, ref_text, text, nfe_steps=nfe)
        latencies.append(time.perf_counter() - t1)
        total_audio += len(wav) / sr
    wall = time.perf_counter() - t0
    return {"mode": "offline", "nfe": nfe, "n": len(texts),
            "rtf": wall / max(total_audio, 1e-9),
            "audio_s": total_audio, "wall_s": wall, **percentile_stats(latencies)}


def bench_concurrent(engine, ref_wav: np.ndarray, ref_sr: int, ref_text: str,
                     texts: List[str], nfe: int, concurrency: int = 4,
                     warmup: bool = True) -> dict:
    """Concurrent offline benchmark: N client threads against one engine.

    With a DynamicBatcher attached (engine.enable_batching) concurrent
    requests coalesce into folded sampler batches — the Triton
    dynamic_batching scenario (runtime/triton_trtllm/README.md:64,
    concurrency 2). Reports RTF, latency percentiles, and the observed batch
    size distribution."""
    if warmup:
        # compile pass: run the full workload once at the measured concurrency
        # so every (bucket, batch-size) sampler shape and vocoder ladder rung
        # is compiled before timing (mirrors warm_up_buckets in the servers)
        warm_q = list(texts)
        wlock = threading.Lock()

        def warm_worker():
            while True:
                with wlock:
                    if not warm_q:
                        return
                    t = warm_q.pop()
                engine.infer(ref_wav, ref_sr, ref_text, t, nfe_steps=nfe)

        ths = [threading.Thread(target=warm_worker) for _ in range(concurrency)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
    if engine.batcher is not None:
        engine.batcher.batch_sizes.clear()

    results = []
    lock = threading.Lock()
    queue = list(texts)

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                text = queue.pop()
            t1 = time.perf_counter()
            wav, sr, _ = engine.infer(ref_wav, ref_sr, ref_text, text,
                                      nfe_steps=nfe)
            with lock:
                results.append((time.perf_counter() - t1, len(wav) / sr))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total_audio = sum(r[1] for r in results)
    sizes = list(engine.batcher.batch_sizes) if engine.batcher is not None else []
    return {"mode": "concurrent", "concurrency": concurrency, "nfe": nfe,
            "n": len(results), "rtf": wall / max(total_audio, 1e-9),
            "audio_s": total_audio, "wall_s": wall,
            "batch_sizes": sizes,
            "mean_batch": float(np.mean(sizes)) if sizes else 1.0,
            **percentile_stats([r[0] for r in results])}


def bench_server(host: str, port: int, texts: List[str], concurrency: int = 2,
                 sample_rate: int = 24_000) -> dict:
    """Client-server benchmark (client_grpc.py / benchmark.py client mode)."""
    from f5e_tts_tpu.serving.socket_client import request

    results = []
    lock = threading.Lock()
    queue = list(texts)

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                text = queue.pop()
            t0 = time.perf_counter()
            wav, first = request(host, port, text)
            total = time.perf_counter() - t0
            with lock:
                results.append((total, first, len(wav) / sample_rate))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total_audio = sum(r[2] for r in results)
    return {"mode": "server", "concurrency": concurrency, "n": len(results),
            "rtf": wall / max(total_audio, 1e-9),
            "first_chunk": percentile_stats([r[1] for r in results if r[1]]),
            "total": percentile_stats([r[0] for r in results])}


DEFAULT_TEXTS = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Machine learning systems convert text into natural sounding speech.",
    "A journey of a thousand miles begins with a single step forward.",
] * 9  # ~26 prompts, matching the reference benchmark set size


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    po = sub.add_parser("offline")
    po.add_argument("--model", default="F5TTS_v1_Base")
    po.add_argument("--ckpt", default="")
    po.add_argument("--vocab", default="")
    po.add_argument("--vocoder_local_path", default=None)
    po.add_argument("--ref_audio", required=True)
    po.add_argument("--ref_text", default="some call me nature.")
    po.add_argument("--nfe", type=int, default=16)
    pc = sub.add_parser("concurrent")
    pc.add_argument("--model", default="F5TTS_v1_Base")
    pc.add_argument("--ckpt", default="")
    pc.add_argument("--vocab", default="")
    pc.add_argument("--vocoder_local_path", default=None)
    pc.add_argument("--ref_audio", required=True)
    pc.add_argument("--ref_text", default="some call me nature.")
    pc.add_argument("--nfe", type=int, default=16)
    pc.add_argument("--concurrency", type=int, default=4)
    pc.add_argument("--max_batch", type=int, default=4)
    pc.add_argument("--batch_window_ms", type=float, default=20.0)
    ps = sub.add_parser("server")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=9998)
    ps.add_argument("--concurrency", type=int, default=2)
    ps.add_argument("--requests", type=int, default=26)
    args = p.parse_args(argv)

    if args.mode == "offline":
        from f5e_tts_tpu.api import F5TTS
        from f5e_tts_tpu.infer.audio import read_wav

        tts = F5TTS(model=args.model, ckpt_file=args.ckpt, vocab_file=args.vocab,
                    vocoder_local_path=args.vocoder_local_path)
        wav, sr = read_wav(args.ref_audio)
        stats = bench_offline(tts.engine, wav, sr, args.ref_text,
                              DEFAULT_TEXTS[:26], args.nfe)
    elif args.mode == "concurrent":
        from f5e_tts_tpu.api import F5TTS
        from f5e_tts_tpu.infer.audio import read_wav

        tts = F5TTS(model=args.model, ckpt_file=args.ckpt, vocab_file=args.vocab,
                    vocoder_local_path=args.vocoder_local_path)
        if args.max_batch > 0:
            tts.engine.enable_batching(max_batch=args.max_batch,
                                       window_ms=args.batch_window_ms,
                                       nfe_steps=args.nfe)
        wav, sr = read_wav(args.ref_audio)
        stats = bench_concurrent(tts.engine, wav, sr, args.ref_text,
                                 DEFAULT_TEXTS[:26], args.nfe,
                                 concurrency=args.concurrency)
    else:
        stats = bench_server(args.host, args.port, DEFAULT_TEXTS[: args.requests],
                             args.concurrency)
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
