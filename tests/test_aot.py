"""AOT export/import tests."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.utils.aot import export_fn, load_fn


def test_export_roundtrip(tmp_path, rng):
    w = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))

    def f(w, x):
        return jnp.tanh(x @ w)

    x = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    path = str(tmp_path / "f.jaxexport")
    export_fn(f, (w, x), path)
    g = load_fn(path)
    np.testing.assert_allclose(np.asarray(g(w, x)), np.asarray(f(w, x)),
                               rtol=1e-6, atol=1e-7)


def test_export_sampler_bucket(tmp_path, rng):
    from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
    from f5e_tts_tpu.infer.pipeline import TTSEngine
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.utils.aot import export_sampler_buckets

    mel = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=8,
                    target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=8,
                     text_dim=16, conv_layers=0, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, 9)
    engine = TTSEngine(params=params, state=state, arch=arch, vocab={" ": 0},
                       mel=mel, cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2),
                       tokenizer="char", vocoder_decode=None,
                       compute_dtype=jnp.float32, buckets=(64,))
    paths = export_sampler_buckets(engine, ref_frames=16, out_dir=str(tmp_path),
                                   nfe=2, text_len=8)
    assert len(paths) == 1
    g = load_fn(paths[0])
    out = g(engine.params,
            jnp.zeros((1, 16, 8), jnp.float32), jnp.asarray([16], jnp.int32),
            jnp.asarray([48], jnp.int32), jnp.zeros((1, 8), jnp.int32),
            jnp.asarray([0], jnp.int32))
    assert out.shape == (1, 64, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_engine_dir_fast_path_matches_jit(tmp_path, rng):
    """TTSEngine with engine_dir uses the exported sampler; output must equal
    the jit path exactly. Non-matching shapes/NFE fall back to jit."""
    import dataclasses

    from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
    from f5e_tts_tpu.infer.pipeline import TTSEngine
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.utils.aot import export_sampler_buckets, find_sampler_engine

    mel = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=8,
                    target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=8,
                     text_dim=16, conv_layers=0, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, 30)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    base = dict(params=params, state=state, arch=arch, vocab=vocab, mel=mel,
                cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2),
                tokenizer="char", vocoder_decode=None,
                compute_dtype=jnp.float32, buckets=(64,), text_pad_to=8)

    jit_engine = TTSEngine(**base)
    ref_mel = rng.standard_normal((1, 16, 8)).astype(np.float32)

    export_sampler_buckets(jit_engine, ref_frames=16, out_dir=str(tmp_path),
                           nfe=2, text_len=16)
    aot_engine = TTSEngine(**base, engine_dir=str(tmp_path))

    kw = dict(duration=48, seed=5, nfe_steps=2)
    out_jit = jit_engine.synthesize_chunk(ref_mel, "a ref. hello.", **kw)
    out_aot = aot_engine.synthesize_chunk(ref_mel, "a ref. hello.", **kw)
    assert aot_engine._aot_cache  # fast path actually engaged
    assert any(v is not None for v in aot_engine._aot_cache.values())
    np.testing.assert_array_equal(out_aot, out_jit)

    # fallback: different NFE has no engine file -> jit path, still works
    out_fb = aot_engine.synthesize_chunk(ref_mel, "a ref. hello.", duration=48,
                                         seed=5, nfe_steps=4)
    assert np.isfinite(out_fb).all()
    assert aot_engine._aot_cache[(4, 16, 64, None, None)] is None

    # finder: text too long for any exported engine -> None
    assert find_sampler_engine(str(tmp_path), 2, 16, 64, min_text_len=99) is None


def test_export_ppg_buckets(tmp_path, rng):
    """wenet export_jit equivalent: serialized mel->PPG per length bucket
    matches the live extractor, including the bucket lookup + pad contract."""
    from f5e_tts_tpu.models.conformer import (ConformerConfig, PPGExtractor,
                                              init_conformer)
    from f5e_tts_tpu.utils.aot import (export_ppg_buckets, find_ppg_engine,
                                       load_fn)

    cfg = ConformerConfig(input_dim=8, output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1, cnn_module_kernel=3)
    params = init_conformer(jax.random.PRNGKey(0), cfg)
    ex = PPGExtractor(params=params, cfg=cfg)

    paths = export_ppg_buckets(ex, str(tmp_path), frame_buckets=(40, 80))
    assert len(paths) == 2

    t_true = 52
    found = find_ppg_engine(str(tmp_path), batch=1, t=t_true)
    assert found is not None and found[1] == 80
    fn = load_fn(found[0])

    feats = np.zeros((1, 80, 8), np.float32)
    feats[0, :t_true] = rng.standard_normal((t_true, 8)).astype(np.float32)
    lens = jnp.asarray([t_true], jnp.int32)
    ppg_engine, len_engine = fn(params, jnp.asarray(feats), lens)
    ppg_live, len_live = ex.mel_to_ppg(jnp.asarray(feats), lens)
    np.testing.assert_array_equal(np.asarray(len_engine), np.asarray(len_live))
    np.testing.assert_allclose(np.asarray(ppg_engine), np.asarray(ppg_live),
                               rtol=1e-5, atol=1e-6)
    # no bucket large enough -> None
    assert find_ppg_engine(str(tmp_path), batch=1, t=100) is None


def test_variant_engines_epss_and_cfg0(tmp_path, rng):
    """Variant engine files: an EPSS pruned grid and a cfg=0 (distilled
    serving) export get tagged filenames, dispatch from synthesize_chunk, and
    match the jit path bitwise; the finder never confuses variants."""
    from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
    from f5e_tts_tpu.infer.pipeline import TTSEngine
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.models.cfm import pruned_sway_timesteps
    from f5e_tts_tpu.utils.aot import export_sampler_buckets, find_sampler_engine

    mel = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=8,
                    target_sample_rate=8000)
    arch = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=8,
                     text_dim=16, conv_layers=0, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, 30)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    base = dict(params=params, state=state, arch=arch, vocab=vocab, mel=mel,
                cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=4),
                tokenizer="char", vocoder_decode=None,
                compute_dtype=jnp.float32, buckets=(64,), text_pad_to=8)
    jit_engine = TTSEngine(**base)
    ref_mel = rng.standard_normal((1, 16, 8)).astype(np.float32)

    grid = pruned_sway_timesteps([0, 1, 4], base_steps=4)  # 2 effective steps
    p1 = export_sampler_buckets(jit_engine, ref_frames=16, out_dir=str(tmp_path),
                                nfe=4, text_len=16, timesteps=grid)
    p2 = export_sampler_buckets(jit_engine, ref_frames=16, out_dir=str(tmp_path),
                                nfe=4, text_len=16, cfg_strength=0.0)
    assert "_ts" in p1[0] and "_cfg0" in p2[0]

    # finder is variant-exact: default lookup sees neither tagged file
    assert find_sampler_engine(str(tmp_path), 4, 16, 64, 16) is None
    assert find_sampler_engine(str(tmp_path), 4, 16, 64, 16, timesteps=grid)
    assert find_sampler_engine(str(tmp_path), 4, 16, 64, 16, cfg_strength=0.0)
    wrong = tuple(t + 0.01 for t in grid)
    assert find_sampler_engine(str(tmp_path), 4, 16, 64, 16, timesteps=wrong) is None

    aot_engine = TTSEngine(**base, engine_dir=str(tmp_path))
    kw = dict(duration=48, seed=5)
    for variant in (dict(timesteps=grid), dict(cfg_strength=0.0)):
        out_jit = jit_engine.synthesize_chunk(ref_mel, "a ref. hello.", **kw, **variant)
        out_aot = aot_engine.synthesize_chunk(ref_mel, "a ref. hello.", **kw, **variant)
        np.testing.assert_array_equal(out_aot, out_jit)
    engaged = [k for k, v in aot_engine._aot_cache.items() if v is not None]
    assert len(engaged) == 2, aot_engine._aot_cache
