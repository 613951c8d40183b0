"""HTTP serving endpoint test over a real loopback connection."""

import io
import json
import threading
import time
import urllib.request
import wave

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer.pipeline import TTSEngine
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.serving import http_server

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}


def test_http_tts_roundtrip():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    engine = TTSEngine(params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
                       cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
                       tokenizer="char",
                       vocoder_decode=lambda m: 0.02 + np.zeros((m.shape[0], m.shape[1] * 64),
                                                                np.float32),
                       compute_dtype=jnp.float32, buckets=(128, 256))
    t = np.arange(6000) / 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    http_server.TTSHandler.engine = engine
    http_server.TTSHandler.ref_audio = ref
    http_server.TTSHandler.ref_sr = 8000
    http_server.TTSHandler.ref_text = "a ref."
    http_server.TTSHandler.nfe = 2
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 18321), http_server.TTSHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    time.sleep(0.3)
    try:
        # health
        with urllib.request.urlopen("http://127.0.0.1:18321/health", timeout=30) as r:
            assert r.read() == b"ok"
        # tts
        body = json.dumps({"text": "hello from http.", "nfe": 2, "seed": 3}).encode()
        req = urllib.request.Request("http://127.0.0.1:18321/tts", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        with wave.open(io.BytesIO(data)) as f:
            assert f.getframerate() == 8000
            assert f.getnframes() > 0
        # error path: missing text
        req = urllib.request.Request("http://127.0.0.1:18321/tts", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()


def test_warm_up_buckets_covers_pow2_batch_shapes(rng):
    """Server warm-up must compile every power-of-two sampler batch the
    batcher can emit per bucket (1, 2, 4 for max_batch=4), so no request
    shape compiles during serving."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
    from f5e_tts_tpu.infer.pipeline import TTSEngine
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.serving.http_server import warm_up_buckets

    mel = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                    target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2,
                     mel_dim=12, text_dim=16, conv_layers=0, dropout=0.0)
    vocab = {c: i for i, c in enumerate(" warmup.")}
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    eng = TTSEngine(params=params, state=state, arch=arch, vocab=vocab, mel=mel,
                    cfm=CFMConfig(),
                    infer_cfg=InferConfig(nfe_steps=2, max_duration=256),
                    tokenizer="char",
                    vocoder_decode=lambda m: np.zeros(
                        (m.shape[0], m.shape[1] * 64), np.float32),
                    compute_dtype=jnp.float32, buckets=(128,))
    eng.enable_batching(max_batch=4, window_ms=40.0, nfe_steps=2)

    ref_mel = rng.standard_normal((1, 40, 12)).astype(np.float32)
    warm_up_buckets(eng, ref_mel, "warm", nfe=2)
    # every pow2 fold size was exercised at least once
    assert {1, 2, 4} <= set(eng.batcher.batch_sizes), eng.batcher.batch_sizes
    eng.batcher.stop()
