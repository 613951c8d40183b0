"""gRPC serving endpoint over a real loopback channel: streaming + offline +
per-request reference override + client latency stats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

grpc = pytest.importorskip("grpc")

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer.pipeline import TTSEngine
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.serving import tts_pb2
from f5e_tts_tpu.serving.grpc_client import _stubs, percentile_stats, run_once
from f5e_tts_tpu.serving.grpc_server import make_server
from f5e_tts_tpu.serving.socket_server import TTSStreamingProcessor

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}


@pytest.fixture(scope="module")
def server():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    engine = TTSEngine(params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
                       cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
                       tokenizer="char",
                       vocoder_decode=lambda m: 0.02 + np.zeros((m.shape[0], m.shape[1] * 64),
                                                                np.float32),
                       compute_dtype=jnp.float32, buckets=(128, 256))
    t = np.arange(6000) / 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    proc = TTSStreamingProcessor(engine, ref, 8000, "a ref.", nfe_steps=2,
                                 warm_up=False)
    srv, port = make_server(proc, host="127.0.0.1", port=0)
    srv.start()
    yield f"127.0.0.1:{port}"
    srv.stop(grace=None)


def test_grpc_streaming_roundtrip(server):
    with grpc.insecure_channel(server) as channel:
        stream_stub, offline_stub = _stubs(channel)
        req = tts_pb2.TTSRequest(gen_text="hello over grpc.", nfe_steps=2)
        r = run_once(stream_stub, offline_stub, req)
    assert r["sample_rate"] == 8000
    assert r["audio_s"] > 0
    assert np.isfinite(r["wav"]).all()
    assert r["first_chunk_s"] is not None and r["first_chunk_s"] <= r["total_s"]


def test_grpc_offline_and_stats(server):
    with grpc.insecure_channel(server) as channel:
        stream_stub, offline_stub = _stubs(channel)
        req = tts_pb2.TTSRequest(gen_text="offline mode.", nfe_steps=2)
        results = [run_once(stream_stub, offline_stub, req, offline=True)
                   for _ in range(2)]
    assert all(r["audio_s"] > 0 for r in results)
    stats = percentile_stats([r["total_s"] for r in results])
    assert stats["p50"] <= stats["p99"] <= stats["max"] + 1e-9


def test_grpc_per_request_ref_override(server):
    t = np.arange(4000) / 8000
    other_ref = (0.15 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    with grpc.insecure_channel(server) as channel:
        stream_stub, offline_stub = _stubs(channel)
        req = tts_pb2.TTSRequest(gen_text="custom prompt.", ref_text="other ref.",
                                 ref_pcm_f32=other_ref.tobytes(),
                                 ref_sample_rate=8000, nfe_steps=2)
        r = run_once(stream_stub, offline_stub, req, offline=True)
    assert r["audio_s"] > 0
    assert np.isfinite(r["wav"]).all()
