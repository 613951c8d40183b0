"""PPG ASR training subsystem tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

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


def test_grad_reverse():
    from f5e_tts_tpu.models.conformer_train import grad_reverse

    f = lambda x: jnp.sum(grad_reverse(x, 0.5) * 3.0)
    g = jax.grad(f)(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -1.5 * np.ones(4))


def test_stats_pool_matches_truncated_torch_semantics(rng):
    import torch

    from f5e_tts_tpu.models.conformer_train import stats_pool

    x = rng.standard_normal((2, 10, 6)).astype(np.float32)
    lens = np.asarray([10, 7])
    # reference: truncate to min(lens), cat(mean, std) (asr_model.py:155-157)
    t = torch.from_numpy(x)[:, :7]
    ref = torch.cat([t.mean(dim=1), t.std(dim=1)], dim=1).numpy()
    got = np.asarray(stats_pool(jnp.asarray(x), jnp.asarray(lens)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sv_branch_and_margins(rng):
    from f5e_tts_tpu.models import conformer_train as ct
    from f5e_tts_tpu.models.conformer import ConformerConfig

    cfg = ConformerConfig(input_dim=20, output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1, cnn_module_kernel=7)
    content = jnp.asarray(rng.standard_normal((3, 12, 16)).astype(np.float32))
    lens = jnp.asarray([12, 10, 8])
    label = jnp.asarray([0, 1, 2])
    for kind in ("softmax", "arc_margin", "add_margin"):
        sv = ct.init_sv_branch(jax.random.PRNGKey(0), cfg, spk_num=5,
                               spk_dim=8, sv_loss=kind)
        loss, acc = ct.sv_loss_fn(sv, content, lens, label, sv_loss=kind)
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert 0.0 <= float(acc) <= 1.0
        # GRL: encoder-side grads point AWAY from the classifier's descent
        def enc_loss(c):
            l, _ = ct.sv_loss_fn(sv, c, lens, label, sv_loss=kind)
            return l
        g = jax.grad(enc_loss)(content)
        assert np.isfinite(np.asarray(g)).all()
    with pytest.raises(NotImplementedError):
        ct.init_sv_branch(jax.random.PRNGKey(0), cfg, 5, sv_loss="proto")


def test_asr_loss_with_sv(rng):
    from f5e_tts_tpu.models import conformer_train as ct
    from f5e_tts_tpu.models.conformer import ConformerConfig, init_conformer

    cfg = ConformerConfig(input_dim=20, output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1, cnn_module_kernel=7)
    enc = init_conformer(jax.random.PRNGKey(0), cfg)
    heads = ct.init_asr_heads(jax.random.PRNGKey(1), cfg, vocab_size=9)
    sv = ct.init_sv_branch(jax.random.PRNGKey(2), cfg, spk_num=4)
    feats = jnp.asarray(rng.standard_normal((2, 32, 20)).astype(np.float32))
    feat_lens = jnp.asarray([32, 24])
    frame_labels = jnp.asarray(rng.integers(0, 9, (2, 16)))
    out = ct.asr_loss(enc, heads, cfg, feats, feat_lens,
                      frame_labels=frame_labels, sv_params=sv,
                      spk_label=jnp.asarray([0, 3]), sv_weight=0.3)
    assert np.isfinite(float(out.loss))
    assert float(out.sv_loss) > 0
    np.testing.assert_allclose(float(out.loss),
                               float(out.ce_loss) + 0.3 * float(out.sv_loss),
                               rtol=1e-5)


def test_center_loss(rng):
    from f5e_tts_tpu.models import conformer_train as ct

    p = ct.init_center_loss(jax.random.PRNGKey(0), num_classes=4, feat_dim=6)
    feats = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
    labels = jnp.asarray([[0, 1, 2, -1, -1], [3, 3, -1, -1, -1]])
    loss = ct.center_loss_fn(p, feats, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # features at their centers -> zero loss
    f0 = p["centers"][jnp.maximum(labels, 0)]
    assert float(ct.center_loss_fn(p, f0, labels)) < 1e-10


def test_ctc_forced_align():
    from f5e_tts_tpu.models.conformer_train import ctc_forced_align

    # frames strongly voting: a a _ b b
    v = 4  # blank=0, tokens 1..3
    lp = np.full((5, v), -10.0)
    for t, tok in enumerate([1, 1, 0, 2, 2]):
        lp[t, tok] = 0.0
    path = ctc_forced_align(lp, [1, 2])
    assert path == [1, 1, 0, 2, 2]
    # repeated token needs a blank between
    lp = np.full((5, v), -10.0)
    for t, tok in enumerate([1, 0, 1, 1, 0]):
        lp[t, tok] = 0.0
    path = ctc_forced_align(lp, [1, 1])
    assert path.count(1) >= 2 and 0 in path
    # alignment covers every frame and only emits label tokens/blank
    assert set(path) <= {0, 1}
