"""GumbelVectorQuantizer tests vs torch.nn.functional.gumbel_softmax semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.config import CodebookConfig
from f5e_tts_tpu.ops import vq as fvq

CB = CodebookConfig(use_codebook=True, num_vars=8, groups=2, combine_groups=False)
DIM = 16


def test_eval_mode_is_argmax_lookup(rng):
    params = fvq.gumbel_vq_init(jax.random.PRNGKey(0), CB, DIM)
    x = jnp.asarray(rng.standard_normal((2, 5, DIM)).astype(np.float32))
    res = fvq.gumbel_vq_apply(params, CB, x, training=False, temperature=2.0)
    assert res.x.shape == (2, 5, DIM)
    # manual argmax lookup
    w = np.asarray(params["weight_proj"]["layer_0"]["w"])
    b = np.asarray(params["weight_proj"]["layer_0"]["b"])
    logits = np.asarray(x).reshape(-1, DIM) @ w + b  # (10, G*V)
    logits = logits.reshape(10 * CB.groups, CB.num_vars)
    k = logits.argmax(-1)
    vars_ = np.asarray(params["vars"])[0]  # (G*V, var_dim)
    var_dim = DIM // CB.groups
    expected = np.zeros((10, CB.groups, var_dim), np.float32)
    for i in range(10):
        for g in range(CB.groups):
            expected[i, g] = vars_[g * CB.num_vars + k[i * CB.groups + g]]
    expected = expected.reshape(2, 5, DIM)
    np.testing.assert_allclose(np.asarray(res.x), expected, rtol=1e-4, atol=1e-5)


def test_perplexity_bounds(rng):
    params = fvq.gumbel_vq_init(jax.random.PRNGKey(1), CB, DIM)
    x = jnp.asarray(rng.standard_normal((4, 32, DIM)).astype(np.float32))
    res = fvq.gumbel_vq_apply(params, CB, x, training=False, temperature=2.0)
    # perplexity per group in [1, num_vars]; summed over groups
    assert CB.groups * 1.0 <= float(res.prob_perplexity) <= CB.groups * CB.num_vars + 1e-4
    assert CB.groups * 1.0 <= float(res.code_perplexity) <= CB.groups * CB.num_vars + 1e-4


def test_training_straight_through(rng):
    """Training output is a hard one-hot lookup; gradient flows to weight_proj."""
    params = fvq.gumbel_vq_init(jax.random.PRNGKey(2), CB, DIM)
    x = jnp.asarray(rng.standard_normal((1, 4, DIM)).astype(np.float32))

    def f(p):
        res = fvq.gumbel_vq_apply(p, CB, x, training=True, temperature=2.0,
                                  rng=jax.random.PRNGKey(3))
        return jnp.sum(res.x), res

    (val, res), grads = jax.value_and_grad(f, has_aux=True)(params)
    # output rows must be exact codebook entries (hard ST forward)
    vars_ = np.asarray(params["vars"])[0]
    var_dim = DIM // CB.groups
    out = np.asarray(res.x).reshape(-1, CB.groups, var_dim)
    for row in out.reshape(-1, var_dim):
        dists = np.abs(vars_ - row[None, :]).max(axis=1)
        assert dists.min() < 1e-5
    g = np.asarray(grads["weight_proj"]["layer_0"]["w"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_temperature_decay():
    cb = CodebookConfig(temp_start=2.0, temp_stop=0.5, temp_decay=0.9)
    assert float(fvq.decayed_temperature(cb, 0)) == 2.0
    assert abs(float(fvq.decayed_temperature(cb, 1)) - 1.8) < 1e-6
    assert float(fvq.decayed_temperature(cb, 1000)) == 0.5
