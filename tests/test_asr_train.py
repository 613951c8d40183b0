"""PPG ASR training subsystem tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from f5e_tts_tpu.models import conformer as fconf
from f5e_tts_tpu.models import conformer_train as ftrain

CFG = fconf.ConformerConfig(input_dim=20, output_size=16, attention_heads=2,
                            linear_units=32, num_blocks=1, cnn_module_kernel=7)
VOCAB = 11


def _batch(rng, b=2, t=41):
    feats = jnp.asarray(rng.standard_normal((b, t, 20)).astype(np.float32))
    feat_lens = jnp.asarray([t, t - 10])
    tp = (t - 1) // 2
    labels = jnp.asarray(rng.integers(0, VOCAB, (b, tp)).astype(np.int32))
    labels = labels.at[1, 12:].set(-1)
    ctc_labels = jnp.asarray(rng.integers(1, VOCAB, (b, 6)).astype(np.int32))
    ctc_lens = jnp.asarray([6, 4])
    return {"feats": feats, "feat_lens": feat_lens, "frame_labels": labels,
            "ctc_labels": ctc_labels, "ctc_label_lens": ctc_lens}


def test_asr_loss_finite(rng):
    enc = fconf.init_conformer(jax.random.PRNGKey(0), CFG)
    heads = ftrain.init_asr_heads(jax.random.PRNGKey(1), CFG, VOCAB)
    out = ftrain.asr_loss(enc, heads, CFG, **_batch(rng))
    assert np.isfinite(float(out.loss))
    assert float(out.ce_loss) > 0 and np.isfinite(float(out.ctc_loss))
    assert 0 <= float(out.acc) <= 1


def test_asr_train_step_reduces_loss(rng):
    enc = fconf.init_conformer(jax.random.PRNGKey(2), CFG)
    heads = ftrain.init_asr_heads(jax.random.PRNGKey(3), CFG, VOCAB)
    opt = optax.adam(3e-3)
    opt_state = opt.init((enc, heads))
    step = ftrain.make_asr_train_step(CFG, opt)
    batch = _batch(rng)
    losses = []
    for _ in range(8):
        enc, heads, opt_state, out = step(enc, heads, opt_state, batch)
        losses.append(float(out.loss))
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]  # overfits one batch
