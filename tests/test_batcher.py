"""Dynamic batcher + preprocess_ref_audio_text + grad accumulation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer.pipeline import TTSEngine, preprocess_ref_audio_text
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.serving.batcher import DynamicBatcher
from f5e_tts_tpu.utils.text import list_str_to_idx

pytestmark = pytest.mark.core

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefgh")}


@pytest.fixture(scope="module")
def engine():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    return TTSEngine(params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
                     cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
                     tokenizer="char",
                     vocoder_decode=lambda m: np.zeros((m.shape[0], m.shape[1] * 64),
                                                       np.float32),
                     compute_dtype=jnp.float32, buckets=(128, 256))


def test_dynamic_batcher(engine, rng):
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=60, nfe_steps=2)
    ids = list_str_to_idx([list("abc gh")], VOCAB)[0]
    futs = []
    for i in range(5):  # more than one batch
        ref = rng.standard_normal((40 + 4 * i, 12)).astype(np.float32)
        futs.append(batcher.submit(ref, ids, duration=90 + i, seed=i))
    for i, f in enumerate(futs):
        wav, mel_gen = f.result(timeout=300)
        assert np.isfinite(wav).all()
        assert mel_gen.shape[0] == (90 + i) - (40 + 4 * i)
    batcher.stop()


def test_decode_mel_ladder(engine):
    """decode_mel pads to the vocoder ladder (one compile per rung) and trims
    the wav to the exact utterance length."""
    shapes = []

    def voc(m):
        shapes.append(tuple(m.shape))
        return np.ones((m.shape[0], m.shape[1] * engine.mel.hop_length), np.float32)

    import dataclasses

    eng = dataclasses.replace(engine, vocoder_decode=voc)
    w = eng.decode_mel(np.zeros((70, 12), np.float32))
    assert w.shape == (70 * eng.mel.hop_length,)
    assert shapes[-1][1] % eng.vocoder_pad_to == 0
    # distinct lengths within one rung share the compiled shape
    eng.decode_mel(np.zeros((90, 12), np.float32))
    assert shapes[-1][1] == shapes[-2][1]
    # batch form
    w = eng.decode_mel(np.zeros((3, 70, 12), np.float32))
    assert w.shape == (3, 70 * eng.mel.hop_length)
    # pad frames hold the mel silence floor, not zeros
    captured = {}

    def voc2(m):
        captured["m"] = np.asarray(m)
        return np.zeros((m.shape[0], m.shape[1] * eng.mel.hop_length), np.float32)

    eng2 = dataclasses.replace(engine, vocoder_decode=voc2)
    eng2.decode_mel(np.zeros((70, 12), np.float32))
    np.testing.assert_allclose(captured["m"][0, 70:], np.log(1e-5), rtol=1e-6)


def test_batcher_pow2_batch(engine, rng):
    """A lone request runs at sampler batch 1, not max_batch (round-2 fix)."""
    import f5e_tts_tpu.serving.batcher as bmod

    seen = []
    orig = fcfm.sample

    def spy(params, state, arch, cfm, inputs, *a, **k):
        seen.append(inputs.cond.shape[0])
        return orig(params, state, arch, cfm, inputs, *a, **k)

    batcher = DynamicBatcher(engine, max_batch=4, window_ms=30, nfe_steps=2)
    ids = list_str_to_idx([list("abc")], VOCAB)[0]
    bmod.fcfm.sample = spy
    try:
        ref = rng.standard_normal((40, 12)).astype(np.float32)
        wav, mel = batcher.submit(ref, ids, duration=90).result(timeout=300)
    finally:
        bmod.fcfm.sample = orig
    batcher.stop()
    assert seen == [1], seen
    assert mel.shape[0] == 50


def test_preprocess_ref_audio_text():
    sr = 8000
    # 20 s audio with a long silence at ~8 s
    t1 = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8 * sr) / sr)).astype(np.float32)
    gap = np.zeros(int(0.8 * sr), np.float32)
    t2 = (0.3 * np.sin(2 * np.pi * 330 * np.arange(11 * sr) / sr)).astype(np.float32)
    wav = np.concatenate([t1, gap, t2])
    out, text = preprocess_ref_audio_text(wav, sr, "hello there", show_info=lambda *_: None)
    assert len(out) <= 12 * sr
    assert len(out) < len(wav)  # clipped at the silence
    assert text == "hello there. "

    # short audio untouched; punctuation normalized
    short = t1[: 2 * sr]
    out, text = preprocess_ref_audio_text(short, sr, "hi.", show_info=lambda *_: None)
    assert len(out) == len(short)
    assert text == "hi. "

    # empty ref text without transcriber -> clear error
    with pytest.raises(RuntimeError, match="ASR"):
        preprocess_ref_audio_text(short, sr, "", show_info=lambda *_: None)

    # with a transcriber
    out, text = preprocess_ref_audio_text(short, sr, "",
                                          transcribe=lambda w, s: "auto text",
                                          show_info=lambda *_: None)
    assert text.startswith("auto text")


def test_grad_accumulation():
    import optax

    from f5e_tts_tpu.config import TrainConfig
    from f5e_tts_tpu.train.step import make_optimizer

    tc = TrainConfig(learning_rate=1e-2, num_warmup_updates=0, grad_accumulation_steps=2)
    opt = make_optimizer(tc, total_updates=10)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    g = {"w": jnp.ones((3,))}
    updates, state = opt.update(g, state, params)
    p1 = optax.apply_updates(params, updates)
    # first micro-step: no parameter change yet (accumulating)
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0, atol=1e-8)
    updates, state = opt.update(g, state, p1)
    p2 = optax.apply_updates(p1, updates)
    # second micro-step applies the real update
    assert abs(float(p2["w"][0]) - 1.0) > 1e-5


def test_batcher_per_request_seed_invariance(engine, rng):
    """A request's output must depend only on its own seed, not on co-batched
    requests or its batch slot (round-1 advisor medium)."""
    ids_a = list_str_to_idx([list("abc gh")], VOCAB)[0]
    ids_b = list_str_to_idx([list("h gfe")], VOCAB)[0]
    ref_a = rng.standard_normal((40, 12)).astype(np.float32)
    ref_b = rng.standard_normal((48, 12)).astype(np.float32)

    # run A alone (tiny window -> solo batch)
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=1, nfe_steps=2)
    _, mel_alone = batcher.submit(ref_a, ids_a, duration=100, seed=7).result(timeout=300)
    batcher.stop()

    # run A co-batched with B, A in slot 1 this time (same duration -> same bucket)
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=500, nfe_steps=2)
    fut_b = batcher.submit(ref_b, ids_b, duration=100, seed=99)
    fut_a = batcher.submit(ref_a, ids_a, duration=100, seed=7)
    _, mel_cobatched = fut_a.result(timeout=300)
    _, mel_b = fut_b.result(timeout=300)
    batcher.stop()

    np.testing.assert_array_equal(mel_alone, mel_cobatched)
    assert not np.array_equal(mel_b[: mel_alone.shape[0]], mel_alone)


def _mk_engine():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    return TTSEngine(params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
                     cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
                     tokenizer="char",
                     vocoder_decode=lambda m: np.asarray(m, np.float32).mean(-1).repeat(64, -1),
                     compute_dtype=jnp.float32, buckets=(128, 256))


def test_infer_through_batcher_matches_direct(rng):
    """engine.infer with a DynamicBatcher attached returns the same audio as
    the unbatched path (batch invariance through the serving wire)."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)

    direct = _mk_engine()
    wav_d, sr_d, mel_d = direct.infer(ref, sr, "abc def", "gh abc", seed=3)

    batched = _mk_engine()
    batched.enable_batching(max_batch=4, window_ms=10)
    wav_b, sr_b, mel_b = batched.infer(ref, sr, "abc def", "gh abc", seed=3)
    batched.batcher.stop()

    assert sr_d == sr_b
    assert batched.batcher.batch_sizes, "request never went through the batcher"
    np.testing.assert_allclose(mel_b, mel_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(wav_b, wav_d, rtol=1e-4, atol=1e-5)

    # non-default nfe falls back to the direct path (batcher untouched)
    n_batches = len(batched.batcher.batch_sizes)
    batched.infer(ref, sr, "abc def", "gh", seed=1, nfe_steps=4)
    assert len(batched.batcher.batch_sizes) == n_batches


def test_concurrent_requests_fold_into_one_batch(rng):
    """Two concurrent infer() calls land in ONE folded sampler batch
    (VERDICT #2: Triton dynamic_batching equivalent, config.pbtxt:15-18)."""
    import threading

    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    eng = _mk_engine()
    # long window so both requests comfortably join the same batch
    eng.enable_batching(max_batch=4, window_ms=500)
    # pre-compile so neither request stalls on XLA while the other waits
    eng.infer(ref, sr, "abc def", "gh", seed=0)
    eng.batcher.batch_sizes.clear()

    results = {}

    def run(tag, text, seed):
        results[tag] = eng.infer(ref, sr, "abc def", text, seed=seed)

    t1 = threading.Thread(target=run, args=("a", "gh abc", 3))
    t2 = threading.Thread(target=run, args=("b", "cba hg", 7))
    t1.start(); t2.start(); t1.join(); t2.join()
    eng.batcher.stop()

    assert 2 in eng.batcher.batch_sizes, eng.batcher.batch_sizes
    # co-batched result identical to a solo run with the same seed
    solo = _mk_engine()
    wav_solo, _, _ = solo.infer(ref, sr, "abc def", "gh abc", seed=3)
    np.testing.assert_allclose(results["a"][0], wav_solo, rtol=1e-4, atol=1e-5)


def test_bench_concurrent_reports_cobatching(rng):
    """Concurrency-4 benchmark through the batcher: all requests served, and
    co-batching observed (VERDICT #2 'done' criterion)."""
    from f5e_tts_tpu.serving.benchmark import bench_concurrent

    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    eng = _mk_engine()
    eng.enable_batching(max_batch=4, window_ms=300)
    texts = ["gh abc", "cba hg", "abc gh", "ha bc", "bc ha", "gach b"]
    stats = bench_concurrent(eng, ref, sr, "abc def", texts, nfe=2,
                             concurrency=4)
    eng.batcher.stop()
    assert stats["n"] == len(texts)
    assert stats["rtf"] > 0
    assert stats["batch_sizes"], "no batches recorded"
    assert max(stats["batch_sizes"]) >= 2, stats["batch_sizes"]
    assert stats["mean_batch"] > 1.0
    # stage timeline (round-3: net-of-transfer accounting, VERDICT r2 #2)
    assert stats["stage_totals"]["sampler_s"] > 0
    assert 0 < stats["rtf_net_of_transfer"] <= stats["rtf"] + 1e-9


def test_batcher_device_finish_matches_host(rng):
    """The device-resident finish (_finish_on_device: slice/mask + vocode on
    device, no mel round trip) produces the same wav + mel as the host path."""
    import dataclasses

    def mk(variant):
        def voc_host(m):
            return np.asarray(m, np.float32).mean(-1).repeat(64, -1)

        if variant in ("dev", "fused"):
            voc_host.device = lambda m: jnp.repeat(jnp.mean(
                m.astype(jnp.float32), axis=-1), 64, axis=-1)
        if variant == "fused":
            from f5e_tts_tpu.infer.pipeline import slice_gen_core

            def fused(out, starts, gens, L):
                mel = slice_gen_core(out, starts, gens, L)
                return jnp.repeat(jnp.mean(mel, axis=-1), 64, axis=-1), mel

            voc_host.device_sliced = fused
        eng = _mk_engine()
        return dataclasses.replace(eng, vocoder_decode=voc_host)

    ids_a = list_str_to_idx([list("abc gh")], VOCAB)[0]
    ids_b = list_str_to_idx([list("h gfe")], VOCAB)[0]
    ref_a = rng.standard_normal((40, 12)).astype(np.float32)
    ref_b = rng.standard_normal((48, 12)).astype(np.float32)

    outs = {}
    for tag in ("host", "dev", "fused"):
        eng = mk(tag)
        batcher = DynamicBatcher(eng, max_batch=4, window_ms=500, nfe_steps=2)
        fa = batcher.submit(ref_a, ids_a, duration=100, seed=5)
        fb = batcher.submit(ref_b, ids_b, duration=90, seed=9)
        outs[tag] = (fa.result(timeout=300), fb.result(timeout=300))
        assert 2 in batcher.batch_sizes  # actually co-batched
        keys = set(batcher.stage_times[-1])
        assert {"sampler_s", "vocode_s", "wav_xfer_s", "mel_xfer_s"} <= keys
        batcher.stop()

    for variant in ("dev", "fused"):
        for (wav_h, mel_h), (wav_d, mel_d) in zip(outs["host"], outs[variant]):
            assert mel_h.shape == mel_d.shape, variant
            np.testing.assert_allclose(mel_d, mel_h, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(wav_d, wav_h, rtol=1e-5, atol=1e-6)


def test_direct_path_device_decode_matches_host(rng):
    """infer() WITHOUT a batcher: the device-resident decode (synthesize_chunk
    device_out + slice_gen + vocoder.device) returns the same wav/spec as the
    host fetch -> decode_mel path."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)

    host_eng = _mk_engine()
    wav_h, _, mel_h = host_eng.infer(ref, sr, "abc def", "gh abc", seed=3)

    dev_eng = _mk_engine()
    dev_eng.vocoder_decode.device = lambda m: jnp.repeat(jnp.mean(
        m.astype(jnp.float32), axis=-1), 64, axis=-1)
    wav_d, _, mel_d = dev_eng.infer(ref, sr, "abc def", "gh abc", seed=3)

    np.testing.assert_allclose(mel_d, mel_h, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(wav_d, wav_h, rtol=1e-5, atol=1e-6)


def test_batcher_return_mel_false(rng):
    """return_mel=False: futures resolve (wav, None), infer() still returns
    a wav and an empty spec."""
    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    eng = _mk_engine()
    eng.vocoder_decode.device = lambda m: jnp.asarray(
        np.asarray(m, np.float32).mean(-1).repeat(64, -1))
    eng.enable_batching(max_batch=4, window_ms=10, return_mel=False)
    wav, out_sr, spec = eng.infer(ref, sr, "abc def", "gh abc", seed=3)
    eng.batcher.stop()
    assert eng.batcher.batch_sizes, "request never went through the batcher"
    assert np.isfinite(wav).all() and len(wav) > 0
    assert spec.shape[0] == 0  # no mel fetched


def test_bench_openloop_poisson(rng):
    """Open-loop benchmark: Poisson arrivals, every request served, latency
    measured from scheduled arrival, stage/net-of-transfer stats present."""
    from f5e_tts_tpu.serving.benchmark import bench_openloop

    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    eng = _mk_engine()
    eng.enable_batching(max_batch=4, window_ms=100)
    texts = ["gh abc", "cba hg", "abc gh", "ha bc", "bc ha", "gach b"]
    stats = bench_openloop(eng, ref, sr, "abc def", texts, nfe=2, qps=20.0,
                           seed=1)
    eng.batcher.stop()
    assert stats["n"] == len(texts)
    assert stats["qps_achieved"] > 0
    assert stats["p50_ms"] > 0
    assert stats["batch_sizes"]
    assert 0 < stats["rtf_net_of_transfer"] <= stats["rtf"] + 1e-9


def test_batcher_int16_wire_matches_f32(rng):
    """wire_dtype='int16': the on-device pcm16 quantization halves the wav
    fetch bytes; futures still resolve float32 within 1 LSB (1/32767) of the
    f32 wire path."""
    import dataclasses

    from f5e_tts_tpu.infer.pipeline import slice_gen_core

    def mk():
        def voc_host(m):
            return np.asarray(m, np.float32).mean(-1).repeat(64, -1)

        voc_host.device = lambda m: jnp.repeat(jnp.mean(
            m.astype(jnp.float32), axis=-1), 64, axis=-1)

        def fused(out, starts, gens, L):
            mel = slice_gen_core(out, starts, gens, L)
            return jnp.repeat(jnp.mean(mel, axis=-1), 64, axis=-1), mel

        def fused_i16(out, starts, gens, L):
            wav, mel = fused(out, starts, gens, L)
            # match api.py's device-side pcm16 quantization exactly
            wav = jnp.clip(jnp.round(wav.astype(jnp.float32) * 32767.0),
                           -32768, 32767).astype(jnp.int16)
            return wav, mel

        voc_host.device_sliced = fused
        voc_host.device_sliced_i16 = fused_i16
        eng = _mk_engine()
        return dataclasses.replace(eng, vocoder_decode=voc_host)

    ids_a = list_str_to_idx([list("abc gh")], VOCAB)[0]
    ids_b = list_str_to_idx([list("h gfe")], VOCAB)[0]
    ref_a = rng.standard_normal((40, 12)).astype(np.float32)
    ref_b = rng.standard_normal((48, 12)).astype(np.float32)

    outs = {}
    for wire in ("float32", "int16"):
        batcher = DynamicBatcher(mk(), max_batch=4, window_ms=500,
                                 nfe_steps=2, wire_dtype=wire)
        fa = batcher.submit(ref_a, ids_a, duration=100, seed=5)
        fb = batcher.submit(ref_b, ids_b, duration=90, seed=9)
        outs[wire] = (fa.result(timeout=300), fb.result(timeout=300))
        batcher.stop()

    for (wav_f, mel_f), (wav_q, mel_q) in zip(outs["float32"], outs["int16"]):
        assert wav_q.dtype == np.float32
        assert wav_q.shape == wav_f.shape
        # quantization error bounded by one pcm16 LSB
        assert np.abs(wav_q - np.clip(wav_f, -1.0, 1.0)).max() <= 1.001 / 32767
        np.testing.assert_allclose(mel_q, mel_f, rtol=1e-5, atol=1e-6)


def test_socket_pcm16_wire_framing():
    """TTSStreamingProcessor(wire='pcm16') streams int16 frames; 'f32' (the
    reference protocol, socket_server.py:138-178) streams float32."""
    from f5e_tts_tpu.serving.socket_server import TTSStreamingProcessor

    class _FakeEngine:
        class mel:
            target_sample_rate = 8000

        class infer_cfg:
            nfe_steps = 2

        def infer(self, *a, streaming=False, chunk_size=2048, **k):
            wav = (0.5 * np.sin(np.linspace(0, 40, 4096))).astype(np.float32)
            for i in range(0, len(wav), chunk_size):
                yield wav[i : i + chunk_size], 8000

    for wire, dtype in (("f32", np.float32), ("pcm16", np.int16)):
        proc = TTSStreamingProcessor.__new__(TTSStreamingProcessor)
        proc.engine = _FakeEngine()
        proc.ref_audio, proc.ref_sr, proc.ref_text = np.zeros(80, np.float32), 8000, "r"
        proc.chunk_size, proc.nfe_steps, proc.wire = 2048, 2, wire
        proc.timesteps, proc.cfg_strength = None, None
        sent = []
        proc.generate_stream("hello", sent.append)
        assert sent[-1] == b"END"
        frames = [np.frombuffer(b, dtype) for b in sent[:-1]]
        assert frames and all(len(f) for f in frames)
        full = np.concatenate(frames)
        if dtype is np.int16:
            full = full.astype(np.float32) / 32767.0
        expect = (0.5 * np.sin(np.linspace(0, 40, 4096))).astype(np.float32)
        np.testing.assert_allclose(full, expect, atol=1.1 / 32767)


def test_infer_int16_wire_through_engine(rng):
    """engine.infer with enable_batching(wire_dtype='int16') + the fused i16
    device decode: audio within 1 pcm16 LSB of the f32-wire batcher path."""
    import dataclasses

    from f5e_tts_tpu.infer.pipeline import slice_gen_core

    def mk(wire):
        def voc_host(m):
            return np.asarray(m, np.float32).mean(-1).repeat(64, -1)

        voc_host.device = lambda m: jnp.repeat(jnp.mean(
            m.astype(jnp.float32), axis=-1), 64, axis=-1)

        def fused(out, starts, gens, L):
            mel = slice_gen_core(out, starts, gens, L)
            return jnp.repeat(jnp.mean(mel, axis=-1), 64, axis=-1), mel

        def fused_i16(out, starts, gens, L):
            wav, mel = fused(out, starts, gens, L)
            wav = jnp.clip(jnp.round(wav.astype(jnp.float32) * 32767.0),
                           -32768, 32767).astype(jnp.int16)
            return wav, mel

        voc_host.device_sliced = fused
        voc_host.device_sliced_i16 = fused_i16
        eng = dataclasses.replace(_mk_engine(), vocoder_decode=voc_host)
        eng.enable_batching(max_batch=4, window_ms=10, wire_dtype=wire)
        return eng

    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    e32 = mk("float32")
    wav_f, _, _ = e32.infer(ref, sr, "abc def", "gh abc", seed=3)
    e32.batcher.stop()
    e16 = mk("int16")
    wav_q, _, _ = e16.infer(ref, sr, "abc def", "gh abc", seed=3)
    e16.batcher.stop()
    assert e16.batcher.batch_sizes, "request never went through the batcher"
    assert wav_q.dtype == np.float32 and wav_q.shape == wav_f.shape
    assert np.abs(wav_q - np.clip(wav_f, -1, 1)).max() <= 1.001 / 32767


def test_batcher_chunked_xfer_matches_full(rng):
    """xfer_chunks>1 (wav-only config): the row-chunked wav fetch resolves
    identical audio to the single full-batch fetch, covers degenerate
    (empty-wav) requests, and records a stage row per batch."""
    import dataclasses

    from f5e_tts_tpu.infer.pipeline import slice_gen_core

    def mk():
        def voc_host(m):
            return np.asarray(m, np.float32).mean(-1).repeat(64, -1)

        voc_host.device = lambda m: jnp.repeat(jnp.mean(
            m.astype(jnp.float32), axis=-1), 64, axis=-1)

        def fused(out, starts, gens, L):
            mel = slice_gen_core(out, starts, gens, L)
            return jnp.repeat(jnp.mean(mel, axis=-1), 64, axis=-1), mel

        voc_host.device_sliced = fused
        return dataclasses.replace(_mk_engine(), vocoder_decode=voc_host)

    texts = ["abc gh", "h gfe", "gg ab", "fe dc"]
    ids = [list_str_to_idx([list(t)], VOCAB)[0] for t in texts]
    refs = [rng.standard_normal((40 + 4 * i, 12)).astype(np.float32)
            for i in range(len(texts))]
    # durations[1] == ref len -> _process clamps to ref_len+1, i.e. the
    # minimum 1-frame generation, exercised inside a middle chunk
    durs = [100, 44, 90, 96]

    outs = {}
    for chunks in (1, 3):
        batcher = DynamicBatcher(mk(), max_batch=4, window_ms=500, nfe_steps=2,
                                 return_mel=False, xfer_chunks=chunks)
        futs = [batcher.submit(r, i, duration=d, seed=7 + k)
                for k, (r, i, d) in enumerate(zip(refs, ids, durs))]
        outs[chunks] = [f.result(timeout=300) for f in futs]
        assert max(batcher.batch_sizes) == 4, "requests did not co-batch"
        assert batcher.stage_times, "no stage row recorded"
        batcher.stop()

    for (wav_1, mel_1), (wav_c, mel_c) in zip(outs[1], outs[3]):
        assert mel_1 is None and mel_c is None
        assert wav_c.dtype == np.float32
        np.testing.assert_array_equal(wav_c, wav_1)
    # min-duration request -> exactly one generated frame of audio
    assert outs[3][1][0].shape == (64,)
