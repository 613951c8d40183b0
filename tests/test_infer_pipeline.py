"""Inference pipeline tests: chunking, duration, crossfade, full infer()."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.infer import pipeline as fpipe
from f5e_tts_tpu.models import dit as fdit


def test_chunk_text():
    text = "Hello world. This is a test! Short. " * 4
    chunks = fpipe.chunk_text(text, max_chars=40)
    assert len(chunks) > 1
    assert all(len(c.encode("utf-8")) <= 41 + 30 for c in chunks)  # sentence-bounded
    # round-trip words preserved
    assert "".join(chunks).replace(" ", "") == text.strip().replace(" ", "")


def test_chunk_text_cjk():
    text = "你好。世界！这是测试。" * 10
    chunks = fpipe.chunk_text(text, max_chars=30)
    assert len(chunks) > 1
    assert "".join(chunks) == text


def test_estimate_duration():
    # ref 100 frames, ref_text 10 bytes, gen_text 20 bytes, speed 1
    d = fpipe.estimate_duration(100, "a" * 10, "b" * 20, speed=1.0)
    assert d == 100 + 200
    # fix_duration wins
    d = fpipe.estimate_duration(100, "a" * 10, "b" * 20, fix_duration=2.0,
                                sample_rate=24000, hop_length=256)
    assert d == int(2.0 * 24000 / 256)
    # short text slows to 0.3 (utils_infer.py:457-459)
    d = fpipe.estimate_duration(100, "a" * 10, "b" * 5, speed=1.0)
    assert d == 100 + int(100 / 10 * 5 / 0.3)


def test_pick_bucket():
    assert fpipe.pick_bucket(100) == 256
    assert fpipe.pick_bucket(256) == 256
    assert fpipe.pick_bucket(257) == 512
    assert fpipe.pick_bucket(99999) == 4096
    # the full 10-rung serving ladder (1280/1792 rungs added round 3 to cut
    # padding waste in the 1024-2048 band)
    assert fpipe.DEFAULT_BUCKETS == (256, 512, 768, 1024, 1280, 1536, 1792,
                                     2048, 3072, 4096)
    assert fpipe.pick_bucket(1025) == 1280
    assert fpipe.pick_bucket(1281) == 1536
    assert fpipe.pick_bucket(1537) == 1792
    assert fpipe.pick_bucket(1793) == 2048
    assert fpipe.pick_bucket(2049) == 3072


def test_cross_fade_stitch():
    sr = 100
    a = np.ones(100, np.float32)
    b = np.ones(100, np.float32) * 3
    out = fpipe.cross_fade_stitch([a, b], sr, cross_fade_duration=0.2)  # 20 samples
    assert len(out) == 180
    # fade region is monotone between 1 and 3
    region = out[80:100]
    assert region[0] <= region[-1]
    assert out[0] == 1 and out[-1] == 3
    # zero fade = concat
    out = fpipe.cross_fade_stitch([a, b], sr, cross_fade_duration=0)
    assert len(out) == 200


def test_audio_io_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    p = str(tmp_path / "t.wav")
    faudio.write_wav(p, x, 24000)
    y, sr = faudio.read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.5e-4)


def test_resample():
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = faudio.resample(x, 16000, 24000)
    assert abs(len(y) - 24000) <= 2
    # energy preserved approximately
    assert abs(faudio.rms(y) - faudio.rms(x)) < 0.02


def test_normalize_rms():
    x = np.ones(100, np.float32) * 0.01
    y, r = faudio.normalize_rms(x, 0.1)
    assert abs(faudio.rms(y) - 0.1) < 1e-6
    assert abs(r - 0.01) < 1e-6
    # loud audio untouched
    x = np.ones(100, np.float32) * 0.5
    y, r = faudio.normalize_rms(x, 0.1)
    assert (y == x).all()


def test_remove_silence_edges():
    sr = 1000
    x = np.concatenate([np.zeros(500), 0.5 * np.ones(1000), np.zeros(500)]).astype(np.float32)
    y = faudio.remove_silence_edges(x, sr)
    assert 900 <= len(y) <= 1100


def test_engine_infer_end_to_end(rng):
    """Tiny engine: infer() produces a finite stitched wave of plausible length."""
    mel_cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                        target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                     text_dim=16, conv_layers=0, dropout=0.0)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    params["proj_out"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(9),
                                                       params["proj_out"]["w"].shape)

    hop = mel_cfg.hop_length

    def fake_vocoder(mel):
        return np.zeros((mel.shape[0], mel.shape[1] * hop), np.float32) + 0.05

    engine = fpipe.TTSEngine(
        params=params, state=state, arch=arch, vocab=vocab, mel=mel_cfg,
        cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
        tokenizer="char", vocoder_decode=fake_vocoder, compute_dtype=jnp.float32,
        buckets=(128, 256, 512))

    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(4000) / 8000)).astype(np.float32)
    wav, sr, mel = engine.infer(ref, 8000, "hello there.", "this is a test.", seed=1)
    assert sr == 8000
    assert np.isfinite(wav).all()
    assert len(wav) > 0
    assert mel.ndim == 2 and mel.shape[1] == 12


def test_engine_vc_and_tts_modes(rng):
    """synthesize_chunk runs the sample_tts and sample_vc CFG variants through
    a PPG-conditioned engine."""
    from f5e_tts_tpu.config import CodebookConfig, PPGConfig

    mel_cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                        target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                     text_dim=16, conv_layers=0, dropout=0.0,
                     ppg=PPGConfig(use_ppg=True, ppg_dim=6))
    vocab = {c: i for i, c in enumerate(" abcdef")}
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    engine = fpipe.TTSEngine(params=params, state=state, arch=arch, vocab=vocab,
                             mel=mel_cfg, cfm=CFMConfig(),
                             infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
                             tokenizer="char", vocoder_decode=None,
                             compute_dtype=jnp.float32, buckets=(128, 256))
    ref_mel = rng.standard_normal((1, 40, 12)).astype(np.float32)
    ppg = rng.standard_normal((1, 100, 6)).astype(np.float32)
    out_tts = engine.synthesize_chunk(ref_mel, "abc def", 100, mode="tts",
                                      alpha_spk=3.5, alpha_txt=3.0, nfe_steps=2)
    assert out_tts.shape == (60, 12)
    out_vc = engine.synthesize_chunk(ref_mel, "", 100, mode="vc", alpha_spk=1.0,
                                     alpha_ppg=2.0, ppg=ppg, nfe_steps=2)
    assert out_vc.shape[1] == 12
    assert np.isfinite(out_tts).all() and np.isfinite(out_vc).all()


def test_engine_streaming(rng):
    mel_cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                        target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                     text_dim=16, conv_layers=0, dropout=0.0)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    engine = fpipe.TTSEngine(
        params=params, state=state, arch=arch, vocab=vocab, mel=mel_cfg,
        cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
        tokenizer="char",
        vocoder_decode=lambda m: np.zeros((m.shape[0], m.shape[1] * 64), np.float32),
        compute_dtype=jnp.float32, buckets=(128, 256, 512))
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(4000) / 8000)).astype(np.float32)
    stream = engine.infer(ref, 8000, "hello.", "a test.", streaming=True, chunk_size=100)
    chunks = list(stream)
    assert len(chunks) >= 1
    assert all(len(c) <= 100 for c, _ in chunks)


def test_engine_infer_pruned_timesteps(rng):
    """infer(timesteps=...) runs the pruned EPSS grid through the full
    pipeline: full keep-set matches the default sway path exactly; a pruned
    grid yields a finite wave of the same length; a batcher (if attached)
    is bypassed for custom grids."""
    from f5e_tts_tpu.models.cfm import pruned_sway_timesteps

    mel_cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                        target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                     text_dim=16, conv_layers=0, dropout=0.0)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    params["proj_out"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(9),
                                                       params["proj_out"]["w"].shape)
    hop = mel_cfg.hop_length

    def fake_vocoder(mel):
        # length-preserving, mel-dependent so outputs distinguish schedules
        return np.asarray(mel, np.float32).mean(-1).repeat(hop, -1)

    engine = fpipe.TTSEngine(
        params=params, state=state, arch=arch, vocab=vocab, mel=mel_cfg,
        cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=4, max_duration=512),
        tokenizer="char", vocoder_decode=fake_vocoder, compute_dtype=jnp.float32,
        buckets=(128, 256, 512))
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(4000) / 8000)).astype(np.float32)

    w_def, _, _ = engine.infer(ref, 8000, "hello there.", "this is a test.", seed=1)
    full = pruned_sway_timesteps(range(5), base_steps=4, sway_coef=-1.0)
    w_full, _, _ = engine.infer(ref, 8000, "hello there.", "this is a test.", seed=1,
                                timesteps=full)
    np.testing.assert_array_equal(w_full, w_def)

    pruned = pruned_sway_timesteps((0, 1, 4), base_steps=4, sway_coef=-1.0)
    engine.enable_batching(max_batch=2, window_ms=10, nfe_steps=4)
    try:
        w_p, sr, _ = engine.infer(ref, 8000, "hello there.", "this is a test.", seed=1,
                                  timesteps=pruned)
        assert not engine.batcher.batch_sizes  # custom grid bypasses the batcher
    finally:
        engine.batcher.stop()
    assert sr == 8000 and np.isfinite(w_p).all()
    assert w_p.shape == w_def.shape  # schedule changes values, not duration
    assert not np.allclose(w_p, w_def)  # and it genuinely ran fewer/different steps


def test_engine_batcher_pruned_grid(rng):
    """enable_batching(timesteps=...) bakes a pruned EPSS grid into the
    batcher; matching-grid requests co-batch and reproduce the direct
    pruned path exactly, default-grid requests fall back to direct."""
    from f5e_tts_tpu.models.cfm import pruned_sway_timesteps

    mel_cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                        target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                     text_dim=16, conv_layers=0, dropout=0.0)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, len(vocab))
    params["proj_out"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(9),
                                                       params["proj_out"]["w"].shape)
    hop = mel_cfg.hop_length

    def fake_vocoder(mel):
        return np.asarray(mel, np.float32).mean(-1).repeat(hop, -1)

    def mk():
        return fpipe.TTSEngine(
            params=params, state=state, arch=arch, vocab=vocab, mel=mel_cfg,
            cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=4, max_duration=512),
            tokenizer="char", vocoder_decode=fake_vocoder, compute_dtype=jnp.float32,
            buckets=(128, 256, 512))

    grid = pruned_sway_timesteps((0, 1, 4), base_steps=4, sway_coef=-1.0)
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(4000) / 8000)).astype(np.float32)

    direct = mk()
    w_direct, _, _ = direct.infer(ref, 8000, "hello there.", "this is a test.",
                                  seed=1, timesteps=grid)

    eng = mk()
    eng.enable_batching(max_batch=2, window_ms=10, timesteps=grid)
    assert eng.batcher.nfe == 2  # derived from the grid
    try:
        w_b, _, _ = eng.infer(ref, 8000, "hello there.", "this is a test.",
                              seed=1, timesteps=grid)
        assert eng.batcher.batch_sizes, "matching grid should use the batcher"
        np.testing.assert_allclose(w_b, w_direct, rtol=1e-5, atol=1e-6)
        n_before = len(eng.batcher.batch_sizes)
        w_d, _, _ = eng.infer(ref, 8000, "hello there.", "this is a test.", seed=1)
        assert len(eng.batcher.batch_sizes) == n_before  # default grid -> direct
        assert not np.allclose(w_d, w_direct)
    finally:
        eng.batcher.stop()
