"""Misc component tests: gradio-free helpers, profiling, VC prompts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.infer.gradio_app import parse_speechtypes_text
from f5e_tts_tpu.train import finetune_gradio as ftg


def test_parse_speechtypes():
    segs = parse_speechtypes_text("{Regular} Hello. {Shouting} HEY! {Regular} ok")
    assert [(s["name"], s["text"]) for s in segs] == [
        ("Regular", "Hello."), ("Shouting", "HEY!"), ("Regular", "ok")]
    assert all(s["seed"] == -1 and s["speed"] == 1.0 for s in segs)
    # untagged prefix defaults to Regular
    segs = parse_speechtypes_text("plain text")
    assert [(s["name"], s["text"]) for s in segs] == [("Regular", "plain text")]
    # JSON markers carry seed/speed and stay sticky (reference
    # infer_gradio.py:334-366)
    segs = parse_speechtypes_text(
        '{"name": "Whisper", "seed": 7, "speed": 0.8} soft. then more.')
    assert segs == [{"name": "Whisper", "seed": 7, "speed": 0.8,
                     "text": "soft. then more."}]


def test_slice_audio():
    sr = 8000
    sil = np.zeros(sr)
    tone = 0.5 * np.sin(2 * np.pi * 220 * np.arange(6 * sr) / sr)
    wav = np.concatenate([tone, sil, tone]).astype(np.float32)
    segs = ftg.slice_audio(wav, sr, min_length_ms=2000)
    assert len(segs) >= 2
    assert sum(len(s) for s in segs) <= len(wav) + sr


def test_vocab_tools(tmp_path):
    vpath = str(tmp_path / "vocab.txt")
    with open(vpath, "w") as f:
        f.write(" \na\nb\n")
    from f5e_tts_tpu.utils.text import load_vocab_file

    vocab = load_vocab_file(vpath)
    missing = ftg.vocab_check(["abc", "abd"], vocab, tokenizer="char")
    assert missing == ["c", "d"]
    out = str(tmp_path / "vocab2.txt")
    n = ftg.vocab_extend(vpath, missing, out)
    assert n == 5
    v2 = load_vocab_file(out)
    assert "c" in v2 and v2[" "] == 0


def test_ckpt_prune_and_expand(tmp_path):
    from safetensors.numpy import save_file

    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.utils.torch_ckpt import dit_from_torch, dit_to_torch, load_torch_state_dict

    cfg = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=8,
                    text_dim=16, conv_layers=0, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), cfg, 10)
    sd = dit_to_torch(params, state, cfg)
    src = str(tmp_path / "in.safetensors")
    save_file({f"ema_model.{k}": v for k, v in sd.items()}, src)

    pruned = str(tmp_path / "pruned.safetensors")
    ftg.prune_checkpoint(src, pruned)
    sd2 = load_torch_state_dict(pruned, use_ema=True)
    assert set(sd2.keys()) == set(sd.keys())

    expanded = str(tmp_path / "exp.safetensors")
    added = ftg.expand_embeddings_for_vocab(src, expanded, new_vocab_size=15)
    assert added == 5
    sd3 = load_torch_state_dict(expanded, use_ema=True)
    p3, _ = dit_from_torch(sd3, cfg)
    assert p3["text_embed"]["embed"]["w"].shape[0] == 16


def test_profiling_stats():
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.utils.profiling import count_params, report_model_stats

    cfg = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=8,
                    text_dim=16, conv_layers=0, dropout=0.0)
    stats = report_model_stats(cfg, vocab_size=10, seconds=1.0)
    assert stats["params_m"] > 0
    assert stats["gflops_fwd"] > 0


def test_vc_prompts(tmp_path, rng):
    """VC prompt building with a tiny conformer PPG extractor."""
    from f5e_tts_tpu.config import MelConfig
    from f5e_tts_tpu.eval.harness import get_seedtts_metainfo
    from f5e_tts_tpu.eval.vc import get_vc_inference_prompts
    from f5e_tts_tpu.infer.audio import write_wav
    from f5e_tts_tpu.models import conformer as fconf

    mel_cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                        target_sample_rate=8000)
    # 80-dim input as the kaldi frontend emits
    ccfg = fconf.ConformerConfig(input_dim=80, output_size=16, attention_heads=2,
                                 linear_units=32, num_blocks=1, cnn_module_kernel=7)
    ext = fconf.PPGExtractor(params=fconf.init_conformer(jax.random.PRNGKey(0), ccfg),
                             cfg=ccfg)

    lines = []
    for i in range(2):
        w = (0.2 * np.sin(2 * np.pi * 220 * np.arange(16000) / 8000)).astype(np.float32)
        p = tmp_path / f"p{i}.wav"
        g = tmp_path / f"g{i}.wav"
        write_wav(str(p), w, 8000)
        write_wav(str(g), w[:8000], 8000)
        lines.append(f"utt{i}|prompt|{p}|gt|{g}")
    meta = tmp_path / "meta.lst"
    meta.write_text("\n".join(lines) + "\n")

    info = get_seedtts_metainfo(str(meta))
    out = get_vc_inference_prompts(info, ext, mel_cfg, min_secs=0.5, max_secs=30,
                                   num_buckets=5)
    assert len(out) == 2
    batch, ppg, ppg_lens = out[0]
    assert ppg.shape[0] == 1 and ppg.shape[2] == 16
    assert int(ppg_lens[0]) > 0


def test_hf_speech_dataset_interface():
    """HFSpeechDataset over a dict-backed hub-dataset stand-in (VERDICT #7;
    reference dataset.py:18-80)."""
    import numpy as np

    from f5e_tts_tpu.config import MelConfig
    from f5e_tts_tpu.data.dataset import HFSpeechDataset, load_speech_dataset

    mel = MelConfig()
    sr = 16000
    rows = [
        {"audio": {"array": np.zeros(sr, np.float32), "sampling_rate": sr},
         "text": "one second"},
        {"audio": {"array": np.zeros(sr // 100, np.float32), "sampling_rate": sr},
         "text": "too short"},  # 10 ms -> skipped forward
        {"audio": {"array": np.zeros(2 * sr, np.float32), "sampling_rate": sr},
         "text": "two seconds"},
    ]
    ds = HFSpeechDataset(rows, mel)
    assert len(ds) == 3
    # frame len scaled to the 24 kHz target rate (reference get_frame_len)
    assert ds.get_frame_len(0) == int(1.0 * mel.target_sample_rate / mel.hop_length)
    # short item skips forward to the next valid row (dataset.py:59-61)
    item = ds[1]
    assert item["text"] == "two seconds"
    # resampled to target rate
    assert len(ds[0]["audio"]) == mel.target_sample_rate

    # factory route
    ds2 = load_speech_dataset("x_y", dataset_type="HFDataset", hf_dataset=rows, mel=mel)
    assert isinstance(ds2, HFSpeechDataset)

    import pytest

    with pytest.raises(ValueError, match="unknown dataset_type"):
        load_speech_dataset("x", dataset_type="Bogus")
