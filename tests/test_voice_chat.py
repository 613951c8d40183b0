"""Voice-chat orchestration: conversation state, audio/text user turns,
LLM round, TTS of the reply (stub LLM + transcriber over a tiny engine)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer.pipeline import TTSEngine
from f5e_tts_tpu.infer.voice_chat import DEFAULT_SYSTEM_PROMPT, VoiceChat
from f5e_tts_tpu.models import dit as fdit

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.!")}


@pytest.fixture(scope="module")
def engine():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), ARCH, len(VOCAB))
    return TTSEngine(params=params, state=state, arch=ARCH, vocab=VOCAB, mel=MEL,
                     cfm=CFMConfig(), infer_cfg=InferConfig(nfe_steps=2, max_duration=512),
                     tokenizer="char",
                     vocoder_decode=lambda m: 0.02 + np.zeros((m.shape[0], m.shape[1] * 64),
                                                              np.float32),
                     compute_dtype=jnp.float32, buckets=(128, 256))


def _mk_chat(engine, transcribe=None):
    seen = []

    def respond(messages):
        seen.append(list(messages))
        assert messages[0]["role"] == "system"
        return f"echo. {messages[-1]['content']}"

    t = np.arange(6000) / 8000
    ref = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    vc = VoiceChat(engine, ref, 8000, "a ref.", respond_fn=respond,
                   transcribe_fn=transcribe, nfe_steps=2)
    return vc, seen


def test_text_chat_round(engine):
    vc, seen = _mk_chat(engine)
    reply, wav, sr = vc.chat(text="hello there.")
    assert reply == "echo. hello there."
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()
    # conversation state grows in pairs; system prompt prepended per call
    assert [m["role"] for m in vc.messages] == ["user", "assistant"]
    assert seen[0][0]["content"] == DEFAULT_SYSTEM_PROMPT

    vc.chat(text="again please.")
    assert [m["role"] for m in vc.messages] == ["user", "assistant"] * 2
    # second LLM call saw the whole history
    assert len(seen[1]) == 1 + 3


def test_audio_user_turn_and_clear(engine, tmp_path):
    calls = []

    def transcribe(path):
        calls.append(path)
        return "spoken words."

    vc, _ = _mk_chat(engine, transcribe=transcribe)
    wav_path = str(tmp_path / "user.wav")
    from f5e_tts_tpu.infer.audio import write_wav

    write_wav(wav_path, np.zeros(8000, np.float32), 8000)
    reply, wav, sr = vc.chat(audio_path=wav_path)
    assert calls == [wav_path]
    assert reply == "echo. spoken words."
    vc.clear()
    assert vc.messages == []


def test_empty_input_and_missing_transcriber(engine):
    vc, _ = _mk_chat(engine)
    assert vc.chat(text="   ") == (None, None, None)
    assert vc.messages == []
    with pytest.raises(ValueError, match="transcribe_fn"):
        vc.user_turn(audio_path="/nonexistent.wav")
    with pytest.raises(ValueError, match="no assistant reply"):
        vc.speak()
