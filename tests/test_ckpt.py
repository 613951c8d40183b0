"""Checkpoint ingestion round-trip tests (torch-layout <-> pytree)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import DiTConfig, PPGConfig, CodebookConfig
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.utils import torch_ckpt as fckpt

pytestmark = pytest.mark.core

CFG = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                text_dim=32, conv_layers=2, dropout=0.0,
                ppg=PPGConfig(use_ppg=True, ppg_dim=12),
                codebook=CodebookConfig(use_codebook=True, num_vars=8, groups=2))
VOCAB = 20


def test_roundtrip_preserves_values():
    params, state = fdit.init_dit(jax.random.PRNGKey(0), CFG, VOCAB)
    sd = fckpt.dit_to_torch(params, state, CFG)
    params2, state2 = fckpt.dit_from_torch(sd, CFG)

    flat1, tree1 = jax.tree.flatten(params)
    flat2, tree2 = jax.tree.flatten(jax.tree.map(jnp.asarray, params2))
    assert str(tree1) == str(tree2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7)


def test_roundtrip_forward_equal(rng):
    params, state = fdit.init_dit(jax.random.PRNGKey(1), CFG, VOCAB)
    sd = fckpt.dit_to_torch(params, state, CFG)
    params2, state2 = fckpt.dit_from_torch(sd, CFG)
    params2 = jax.tree.map(jnp.asarray, params2)
    state2 = jax.tree.map(jnp.asarray, state2)

    b, n, nt = 2, 12, 6
    x = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    ppg = jnp.asarray(rng.standard_normal((b, n, CFG.ppg.ppg_dim)).astype(np.float32))
    time = jnp.asarray([0.2, 0.9], np.float32)
    f = jnp.zeros((b,), bool)

    def fwd(p, s):
        pred, _ = fdit.dit_forward(p, s, CFG, x=x, cond=cond, text_ids=text, time=time,
                                   drop_audio_cond=f, drop_text=f, drop_ppg=f, ppg=ppg,
                                   compute_dtype=jnp.float32)
        return np.asarray(pred)

    np.testing.assert_allclose(fwd(params2, state2), fwd(params, state), rtol=1e-5, atol=1e-6)


def test_ema_prefix_handling(tmp_path):
    """safetensors with ema_model.* keys unwrap correctly (utils_infer.py:204-218)."""
    from safetensors.numpy import save_file

    params, state = fdit.init_dit(jax.random.PRNGKey(2), CFG, VOCAB)
    sd = fckpt.dit_to_torch(params, state, CFG)
    ema_sd = {f"ema_model.{k}": v for k, v in sd.items()}
    path = str(tmp_path / "model.safetensors")
    save_file(ema_sd, path)

    loaded = fckpt.load_torch_state_dict(path, use_ema=True)
    assert set(loaded.keys()) == set(sd.keys())
    params2, _ = fckpt.dit_from_torch(loaded, CFG)
    np.testing.assert_allclose(np.asarray(params2["proj_out"]["w"]),
                               np.asarray(params["proj_out"]["w"]), rtol=1e-6)


def test_pt_checkpoint_loading(tmp_path):
    """.pt training dict {model_state_dict, ema_model_state_dict} loads both ways."""
    import torch

    params, state = fdit.init_dit(jax.random.PRNGKey(3), CFG, VOCAB)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in fckpt.dit_to_torch(params, state, CFG).items()}
    ema = {f"ema_model.{k}": v * 2 for k, v in sd.items()}
    ema["initted"] = torch.tensor(True)
    ema["step"] = torch.tensor(100)
    path = str(tmp_path / "model_last.pt")
    torch.save({"model_state_dict": sd, "ema_model_state_dict": ema, "update": 100}, path)

    raw = fckpt.load_torch_state_dict(path, use_ema=False)
    np.testing.assert_allclose(raw["transformer.proj_out.weight"],
                               np.asarray(params["proj_out"]["w"]).T, rtol=1e-6)
    emaed = fckpt.load_torch_state_dict(path, use_ema=True)
    np.testing.assert_allclose(emaed["transformer.proj_out.weight"],
                               np.asarray(params["proj_out"]["w"]).T * 2, rtol=1e-6)
    assert "initted" not in emaed and "step" not in emaed
