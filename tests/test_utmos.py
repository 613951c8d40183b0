"""Native UTMOS parity vs torch twins (reference eval_utmos.py:18-20 scores
with tarepan/SpeechMOS utmos22_strong; its architecture = wav2vec2-base SSL +
domain/judge embeddings + BiLSTM + projection head).

The SSL stage is oracle-tested against the ACTUAL transformers
Wav2Vec2Model (randomly initialized — no downloads), the BiLSTM against
torch.nn.LSTM, and the full scorer against a torch twin assembled from both.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from f5e_tts_tpu.eval.utmos import (
    UTMOSConfig, W2V2Config, blstm, init_utmos, utmos_forward,
    utmos_from_torch, w2v2_encode, w2v2_from_hf,
)

TINY = W2V2Config(conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
                  conv_kernel=(10, 3, 3), conv_bias=False, hidden=32,
                  layers=2, heads=4, ff=64, pos_conv_kernel=16,
                  pos_conv_groups=4)


def _hf_model(cfg: W2V2Config, seed=0):
    torch.manual_seed(seed)
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim), conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel), conv_bias=cfg.conv_bias,
        hidden_size=cfg.hidden, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads, intermediate_size=cfg.ff,
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False)
    return transformers.Wav2Vec2Model(hf_cfg).eval()


def test_w2v2_matches_transformers():
    """Full wav2vec2 forward == transformers.Wav2Vec2Model (random weights
    through the converter — the same path real UTMOS SSL weights take)."""
    model = _hf_model(TINY)
    params = w2v2_from_hf(model.state_dict(), TINY)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 2000)).astype(np.float32)
    with torch.no_grad():
        ref = model(input_values=torch.from_numpy(wav)).last_hidden_state.numpy()
    out = np.asarray(w2v2_encode(params, TINY, jnp.asarray(wav)))
    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    assert err < 2e-4, err


def test_blstm_matches_torch():
    torch.manual_seed(1)
    m = torch.nn.LSTM(12, 8, batch_first=True, bidirectional=True).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = {"w_ih": sd["weight_ih_l0"], "w_hh": sd["weight_hh_l0"],
         "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"],
         "w_ih_r": sd["weight_ih_l0_reverse"], "w_hh_r": sd["weight_hh_l0_reverse"],
         "b_ih_r": sd["bias_ih_l0_reverse"], "b_hh_r": sd["bias_hh_l0_reverse"]}
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 17, 12)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    out = np.asarray(blstm(jax.tree.map(jnp.asarray, p), jnp.asarray(x)))
    err = np.abs(out - ref.numpy()).max()
    assert err < 1e-5, err


class _TorchUTMOS(torch.nn.Module):
    """Torch twin of the SpeechMOS utmos22_strong inference graph."""

    def __init__(self, ssl, cfg: UTMOSConfig, num_domains=3, num_judges=10):
        super().__init__()
        self.wav2vec2 = ssl
        self.domain_emb = torch.nn.Embedding(num_domains, cfg.domain_dim)
        self.judge_emb = torch.nn.Embedding(num_judges, cfg.judge_dim)
        in_dim = cfg.ssl.hidden + cfg.domain_dim + cfg.judge_dim
        self.blstm = torch.nn.LSTM(in_dim, cfg.blstm_hidden, batch_first=True,
                                   bidirectional=True)
        self.projection = torch.nn.Sequential(
            torch.nn.Linear(2 * cfg.blstm_hidden, cfg.proj_hidden),
            torch.nn.ReLU(),
            torch.nn.Linear(cfg.proj_hidden, 1))
        self.cfg = cfg

    def forward(self, wav):
        feat = self.wav2vec2(input_values=wav).last_hidden_state
        b, n, _ = feat.shape
        dom = self.domain_emb(torch.full((b, n), self.cfg.domain_id, dtype=torch.long))
        jud = self.judge_emb(torch.full((b, n), self.cfg.judge_id, dtype=torch.long))
        x = torch.cat([feat, dom, jud], dim=-1)
        x, _ = self.blstm(x)
        frame = self.projection(x)[..., 0]
        return frame.mean(dim=1) * self.cfg.score_scale + self.cfg.score_shift


def test_utmos_full_scorer_matches_torch_twin():
    cfg = UTMOSConfig(ssl=TINY, domain_dim=8, judge_dim=8, blstm_hidden=16,
                      proj_hidden=24, domain_id=1, judge_id=3)
    torch.manual_seed(3)
    twin = _TorchUTMOS(_hf_model(TINY, seed=3), cfg).eval()
    params = utmos_from_torch(twin.state_dict(), cfg)

    rng = np.random.default_rng(4)
    wav = rng.standard_normal((2, 3200)).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(wav)).numpy()
    out = np.asarray(utmos_forward(params, cfg, jnp.asarray(wav)))
    err = np.abs(out - ref).max()
    assert err < 2e-4, err


def test_native_scorer_file_path(tmp_path):
    """make_native_utmos_scorer: wav file -> resample 16k -> score (the
    eval_utmos.py per-file loop), and score_utmos aggregation over it."""
    from f5e_tts_tpu.eval.scorers import score_utmos
    from f5e_tts_tpu.eval.utmos import make_native_utmos_scorer
    from f5e_tts_tpu.infer.audio import write_wav

    cfg = UTMOSConfig(ssl=TINY, domain_dim=8, judge_dim=8, blstm_hidden=16,
                      proj_hidden=24, domain_id=0, judge_id=1)
    params = init_utmos(jax.random.PRNGKey(1), cfg, num_domains=2, num_judges=4)
    scorer = make_native_utmos_scorer(params, cfg)

    sr = 24_000
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, sr)
    res = score_utmos([p], scorer, results_path=str(tmp_path / "res.jsonl"))
    assert res["n"] == 1 and np.isfinite(res["utmos"])


def test_utmos_init_runs():
    cfg = UTMOSConfig(ssl=TINY, domain_dim=8, judge_dim=8, blstm_hidden=16,
                      proj_hidden=24, domain_id=0, judge_id=2)
    params = init_utmos(jax.random.PRNGKey(0), cfg, num_domains=3, num_judges=10)
    wav = jnp.asarray(np.random.default_rng(5).standard_normal((1, 2000)),
                      jnp.float32)
    s = np.asarray(utmos_forward(params, cfg, wav))
    assert s.shape == (1,) and np.isfinite(s).all()
