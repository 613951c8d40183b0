"""CFM sampler + loss tests (tiny model, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.models import dit as fdit

pytestmark = pytest.mark.core

TINY = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                 text_dim=32, conv_layers=1, dropout=0.0)
CFM = CFMConfig()
VOCAB = 20


@pytest.fixture(scope="module")
def model(rng_factory=np.random.default_rng):
    params, state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
    # perturb proj_out so the flow is nonzero
    r = rng_factory(7)
    params["proj_out"] = {
        "w": jnp.asarray(r.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.05,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }
    return params, state


def test_sway_timesteps():
    """reference cfm.py:467-469: t <- t + s(cos(pi/2 t) - 1 + t)."""
    ts = fcfm.sway_timesteps(8, -1.0)
    assert ts.shape == (9,)
    assert ts[0] == 0.0 and abs(ts[-1] - 1.0) < 1e-6
    lin = np.linspace(0, 1, 9)
    ref = lin + (-1.0) * (np.cos(np.pi / 2 * lin) - 1 + lin)
    np.testing.assert_allclose(ts, ref, rtol=1e-5, atol=1e-6)
    # sway -1 front-loads steps
    assert ts[1] < lin[1]


def _mk_inputs(rng, b=2, n=24, nt=6):
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    lens = jnp.asarray([8, 10])
    duration = jnp.asarray([20, 24])
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    return fcfm.prepare_inputs(cond, lens, duration, n, text_ids=text)


def test_sample_shapes_and_prompt_region(model, rng):
    params, state = model
    inputs = _mk_inputs(rng)
    out, traj = fcfm.sample(params, state, TINY, CFM, inputs, jax.random.PRNGKey(1),
                            steps=4, cfg_strength=2.0, sway_coef=-1.0,
                            compute_dtype=jnp.float32)
    assert out.shape == (2, 24, TINY.mel_dim)
    assert traj.shape == (5, 2, 24, TINY.mel_dim)
    # prompt region overwritten with cond (reference cfm.py:476)
    out_np = np.asarray(out)
    cond_np = np.asarray(inputs.cond)
    mask_np = np.asarray(inputs.cond_mask)
    np.testing.assert_allclose(out_np[mask_np], cond_np[mask_np], atol=1e-6)


def test_batch_invariance(model, rng):
    """Per-sample fold_in noise: sample 0 alone == sample 0 in a batch."""
    params, state = model
    inputs = _mk_inputs(rng)
    key = jax.random.PRNGKey(3)
    out_b, _ = fcfm.sample(params, state, TINY, CFM, inputs, key, steps=2,
                           cfg_strength=1.0, compute_dtype=jnp.float32)
    single = fcfm.SamplerInputs(
        cond=inputs.cond[:1], cond_mask=inputs.cond_mask[:1],
        duration=inputs.duration[:1], text_ids=inputs.text_ids[:1], ppg=None)
    out_s, _ = fcfm.sample(params, state, TINY, CFM, single, key, steps=2,
                           cfg_strength=1.0, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_b[0]), rtol=1e-4, atol=1e-5)


def test_cfg_fold_equals_two_calls(model, rng):
    """Folded 2B-batch CFG == two separate branch evaluations combined."""
    params, state = model
    inputs = _mk_inputs(rng)
    b, n, _ = inputs.cond.shape
    mask = None

    # manual: two separate forwards
    te_c = fdit.text_embed_fn(params, TINY, inputs.text_ids, b, n, jnp.zeros((b,), bool), jnp.float32)
    te_u = fdit.text_embed_fn(params, TINY, inputs.text_ids, b, n, jnp.ones((b,), bool), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    t = jnp.full((b,), 0.4, jnp.float32)
    pred_c = fdit.dit_sample_step(params, state, TINY, x=x, cond=inputs.cond, text_embed=te_c,
                                  time=t, drop_audio_cond=jnp.zeros((b,), bool),
                                  compute_dtype=jnp.float32)
    pred_u = fdit.dit_sample_step(params, state, TINY, x=x, cond=jnp.zeros_like(inputs.cond),
                                  text_embed=te_u, time=t, drop_audio_cond=jnp.ones((b,), bool),
                                  compute_dtype=jnp.float32)
    cfg = 2.0
    ref = pred_c + (pred_c - pred_u) * cfg

    step_fn = fcfm._folded_cfg_flow(
        params, state, TINY, inputs,
        [dict(drop_audio=False, drop_text=False, drop_ppg=False),
         dict(drop_audio=True, drop_text=True, drop_ppg=True)],
        [1.0 + cfg, -cfg], mask, jnp.float32)
    ours = step_fn(jnp.asarray(0.4), x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=1e-5)


def test_sample_tts_weights():
    """Branch weights reproduce a_spk*(s-t) + a_txt*(t-n) + n."""
    a_spk, a_txt = 2.5, 3.0
    w = np.array([1.0 - a_txt, a_txt - a_spk, a_spk])
    flows = np.random.default_rng(0).standard_normal((3, 4))
    null, txt, spk = flows
    ref = a_spk * (spk - txt) + a_txt * (txt - null) + null
    np.testing.assert_allclose(w @ flows, ref, rtol=1e-6)


def test_masked_unmasked_equivalence(model, rng):
    """SURVEY hard-part: the reference skips the attention mask for batch=1
    (cfm.py:425-428); masked and unmasked paths must agree for a full-length
    batch so that behavior is a pure optimization."""
    params, state = model
    b, n = 1, 24
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, 6)).astype(np.int32))
    inputs = fcfm.prepare_inputs(cond, jnp.asarray([10]), jnp.asarray([n]), n, text_ids=text)
    key = jax.random.PRNGKey(11)
    out_m, _ = fcfm.sample(params, state, TINY, CFM, inputs, key, steps=2,
                           cfg_strength=2.0, use_mask=True, compute_dtype=jnp.float32)
    out_u, _ = fcfm.sample(params, state, TINY, CFM, inputs, key, steps=2,
                           cfg_strength=2.0, use_mask=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_u), rtol=1e-4, atol=1e-5)


def test_duplicate_test_probe(model, rng):
    """duplicate_test: start the ODE at t_inter from a shifted copy of the
    ground truth (reference cfm.py:151-152, 410-412)."""
    params, state = model
    inputs = _mk_inputs(rng)
    test_cond = jnp.asarray(rng.standard_normal((2, 24, TINY.mel_dim)).astype(np.float32))
    out, traj = fcfm.sample(params, state, TINY, CFM, inputs, jax.random.PRNGKey(2),
                            steps=2, cfg_strength=1.0, t_start=0.1, test_cond=test_cond,
                            compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    # trajectory starts from the mixed state, not pure noise
    y0 = np.asarray(traj[0])
    pure_noise = np.asarray(fcfm.noise_like(jax.random.PRNGKey(2), 2, 24, TINY.mel_dim,
                                            inputs.duration))
    assert np.abs(y0 - pure_noise).max() > 1e-6


def test_cfm_loss(model, rng):
    params, state = model
    b, n, nt = 2, 24, 6
    mel = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    out = fcfm.cfm_loss(params, state, TINY, CFM,
                        mel=mel, mel_lens=jnp.asarray([20, 24]), text_ids=text,
                        rng=jax.random.PRNGKey(5), training=False,
                        compute_dtype=jnp.float32)
    assert np.isfinite(float(out.loss))
    assert float(out.loss) > 0
    # cond zeros out the masked span
    cond = np.asarray(out.cond)
    assert (cond == 0).any()


def test_cfm_loss_grads(model, rng):
    params, state = model
    b, n, nt = 2, 16, 4
    mel = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))

    def loss_fn(p):
        return fcfm.cfm_loss(p, state, TINY, CFM, mel=mel, mel_lens=jnp.asarray([16, 12]),
                             text_ids=text, rng=jax.random.PRNGKey(6), training=False,
                             compute_dtype=jnp.float32).loss

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.tree.flatten(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_ode_unroll_bitwise_identical(model, rng):
    """CFMConfig.ode_unroll is a pure scheduling lever: unroll=2/3 must be
    BITWISE identical to unroll=1 for both euler and midpoint (same op
    sequence, only the loop structure changes)."""
    import dataclasses

    params, state = model
    inputs = _mk_inputs(rng)
    for method in ("euler", "midpoint"):
        outs = {}
        for unroll in (1, 2, 3):
            cfg = dataclasses.replace(CFM, ode_method=method, ode_unroll=unroll)
            out, traj = fcfm.sample(params, state, TINY, cfg, inputs,
                                    jax.random.PRNGKey(1), steps=4,
                                    cfg_strength=2.0, sway_coef=-1.0,
                                    compute_dtype=jnp.float32)
            outs[unroll] = (np.asarray(out), np.asarray(traj))
        for unroll in (2, 3):
            np.testing.assert_array_equal(outs[unroll][0], outs[1][0],
                                          err_msg=f"{method} unroll={unroll}")
            np.testing.assert_array_equal(outs[unroll][1], outs[1][1])


def test_pruned_timesteps_epss(model, rng):
    """EPSS custom-grid support (arXiv 2505.19931): (a) the full keep-set
    reproduces the sway path bitwise, (b) a pruned grid runs the ODE in
    len(keep)-1 steps with the prompt region preserved, (c) bad keep-sets
    are rejected."""
    params, state = model
    inputs = _mk_inputs(rng)

    full = fcfm.pruned_sway_timesteps(range(5), base_steps=4, sway_coef=-1.0)
    np.testing.assert_array_equal(np.asarray(full, np.float32),
                                  fcfm.sway_timesteps(4, -1.0))
    out_sway, _ = fcfm.sample(params, state, TINY, CFM, inputs, jax.random.PRNGKey(1),
                              steps=4, cfg_strength=2.0, sway_coef=-1.0,
                              compute_dtype=jnp.float32)
    out_full, _ = fcfm.sample(params, state, TINY, CFM, inputs, jax.random.PRNGKey(1),
                              steps=4, cfg_strength=2.0, sway_coef=-1.0,
                              timesteps=full, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_sway))

    pruned = fcfm.pruned_sway_timesteps((0, 2, 4), base_steps=4, sway_coef=-1.0)
    out_p, traj_p = fcfm.sample(params, state, TINY, CFM, inputs, jax.random.PRNGKey(1),
                                steps=4, cfg_strength=2.0, sway_coef=-1.0,
                                timesteps=pruned, compute_dtype=jnp.float32)
    assert traj_p.shape[0] == 3  # 2 ODE steps + y0
    out_np, cond_np = np.asarray(out_p), np.asarray(inputs.cond)
    mask_np = np.asarray(inputs.cond_mask)
    assert np.isfinite(out_np).all()
    np.testing.assert_allclose(out_np[mask_np], cond_np[mask_np], atol=1e-6)

    for bad in ((1, 2, 4), (0, 2), (0, 2, 2, 4), (0, 4, 2)):
        with pytest.raises(ValueError):
            fcfm.pruned_sway_timesteps(bad, base_steps=4)


def test_depth_scan_unroll_equivalent(rng):
    """DiTConfig.scan_unroll (depth-axis analogue of ode_unroll) is a pure
    scheduling lever: sampling outputs AND training gradients match at
    unroll 1/2/3 (incl. the non-divisible depth=3 case) to ulp-level
    tolerance — unlike ode_unroll it is NOT bitwise, XLA re-fuses across
    unrolled blocks (measured max|err| ~4e-9 fp32)."""
    import dataclasses

    base = dataclasses.replace(TINY, depth=3)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), base, VOCAB)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((base.dim, base.mel_dim)).astype(np.float32)) * 0.05,
        "b": jnp.zeros((base.mel_dim,), jnp.float32),
    }
    inputs = _mk_inputs(rng)
    mel = jnp.asarray(rng.standard_normal((2, 24, base.mel_dim)).astype(np.float32))
    mel_lens = jnp.asarray([24, 20])
    ids = jnp.asarray(rng.integers(0, VOCAB, (2, 6)).astype(np.int32))

    outs, grads = {}, {}
    for unroll in (1, 2, 3):
        cfg = dataclasses.replace(base, scan_unroll=unroll)
        out, _ = fcfm.sample(params, state, cfg, CFM, inputs,
                             jax.random.PRNGKey(1), steps=4, cfg_strength=2.0,
                             sway_coef=-1.0, compute_dtype=jnp.float32)
        outs[unroll] = np.asarray(out)

        def loss_fn(p):
            return fcfm.cfm_loss(p, state, cfg, CFM, mel=mel, mel_lens=mel_lens,
                                 text_ids=ids, rng=jax.random.PRNGKey(2),
                                 training=True,
                                 compute_dtype=jnp.float32).loss

        grads[unroll] = jax.tree.map(np.asarray, jax.grad(loss_fn)(params))

    def close(a, b):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    for unroll in (2, 3):
        close(outs[unroll], outs[1])
        jax.tree.map(close, grads[unroll], grads[1])
