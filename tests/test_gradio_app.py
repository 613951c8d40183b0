"""Headless cores of the gradio UI (reference: infer_gradio.py:120-1005) —
model switcher persistence, multistyle generation, validation, txt upload."""

import json

import numpy as np
import pytest

from f5e_tts_tpu.infer import gradio_app as ga


def test_load_text_from_file(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("  hello there \n")
    assert ga.load_text_from_file(str(p)) == "hello there"
    assert ga.load_text_from_file(None) == ""


def test_validate_speech_types():
    text = "{Regular} hi {Shouting} HEY"
    assert ga.validate_speech_types(text, "Regular", "Shouting")
    assert not ga.validate_speech_types(text, "Regular")
    # empty rows are ignored
    assert ga.validate_speech_types(text, "Regular", "", "Shouting", "")


def test_model_choice_persistence(tmp_path):
    cache = str(tmp_path / "last.txt")
    mc = ga.ModelChoice("F5TTS_v1_Base", cache_path=cache)
    # fresh cache -> defaults
    assert mc.load_last_used_custom() == ga.DEFAULT_CUSTOM_CFG
    # set custom persists across instances (reference :968-976)
    cfg = json.dumps({"dim": 64, "depth": 2})
    mc.set_custom("/x/model.safetensors", "/x/vocab.txt", cfg)
    assert mc.choice == ("Custom", "/x/model.safetensors", "/x/vocab.txt", cfg)
    mc2 = ga.ModelChoice("F5TTS_v1_Base", cache_path=cache)
    assert mc2.load_last_used_custom() == ["/x/model.safetensors", "/x/vocab.txt", cfg]
    # switch to builtin hides custom; back to Custom restores last used
    assert mc2.switch("E2-TTS") is None
    assert mc2.choice == "E2-TTS"
    assert mc2.switch("Custom") == ("/x/model.safetensors", "/x/vocab.txt", cfg)


def test_generate_multistyle_core():
    calls = []

    def fake_infer(audio, ref_text, text, seed, speed, remove_silence):
        calls.append(dict(audio=audio, text=text, seed=seed, speed=speed))
        return np.full(4, len(calls), np.float32), 24000, ref_text + "!"

    voices = {"Regular": {"audio": "A", "ref_text": "ra"},
              "Shout": {"audio": "B", "ref_text": "rb"}}
    script = '{Regular} one {"name": "Shout", "seed": 5, "speed": 1.5} two ' \
             "{Missing} three"
    wav, sr, voices_out, meta = ga.generate_multistyle_core(
        fake_infer, script, voices, seed_fn=lambda: 42)

    assert sr == 24000 and len(wav) == 12
    assert [c["text"] for c in calls] == ["one", "two", "three"]
    # explicit seed honored; seed=-1 drew from seed_fn
    assert calls[0]["seed"] == 42 and calls[1]["seed"] == 5
    assert calls[1]["speed"] == 1.5
    # unknown style falls back to Regular's audio
    assert calls[2]["audio"] == "A"
    # ref texts updated from the infer return (auto-transcription flow)
    assert voices_out["Regular"]["ref_text"] == "ra!!"
    # metadata is one JSON line per segment
    lines = meta.strip().split("\n")
    assert len(lines) == 3 and json.loads(lines[1].split("} ")[0] + "}")["seed"] == 5


def test_generate_multistyle_no_regular_raises():
    with pytest.raises(ValueError, match="no reference"):
        ga.generate_multistyle_core(lambda *a: (np.zeros(1), 24000, ""),
                                    "{Nope} hi", {})
