"""UNetT (E2-TTS) checkpoint roundtrip + forward equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import UNetTConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.utils.torch_ckpt import backbone_from_torch, unett_to_torch

CFG = UNetTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                  text_dim=None, conv_layers=1, pe_attn_head=1,
                  text_mask_padding=False, dropout=0.0)
VOCAB = 20


def test_unett_roundtrip_forward(rng):
    params, state = fbb.init_backbone(jax.random.PRNGKey(0), CFG, VOCAB)
    sd = unett_to_torch(params, state, CFG)
    assert any(k.endswith("layers.2.0.weight") for k in sd)  # skip_proj in later half
    assert not any(k.endswith("layers.0.0.weight") for k in sd)  # none in first half
    params2, state2 = backbone_from_torch(sd, CFG)
    params2 = jax.tree.map(jnp.asarray, params2)

    b, n, nt = 2, 16, 6
    x = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    time = jnp.asarray([0.2, 0.7], np.float32)
    f = jnp.zeros((b,), bool)

    def fwd(p, s):
        pred, _ = fbb.forward_train(p, s, CFG, x=x, cond=cond, text_ids=text, time=time,
                                    drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                    compute_dtype=jnp.float32)
        return np.asarray(pred)

    np.testing.assert_allclose(fwd(params2, state2), fwd(params, state),
                               rtol=1e-4, atol=1e-5)
