"""8-bit AdamW (block-wise int8 moments, the bnb AdamW8bit equivalent)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from f5e_tts_tpu.train.adamw8bit import (_QTensor, _decode, _encode, adamw8bit,
                                         state_bytes)


def test_encode_decode_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((100, 130)).astype(np.float32))
    qt = _encode(x, 256, signed=True)
    assert qt.codes.dtype == jnp.int8
    y = _decode(qt, x.shape, signed=True)
    # per-block absmax int8: worst-case error = absmax/254 per block
    err = np.abs(np.asarray(y - x))
    assert err.max() <= float(jnp.abs(x).max()) / 254 + 1e-7

    v = jnp.square(x)  # non-negative, sqrt-domain quantization
    qt = _encode(v, 256, signed=False)
    y = _decode(qt, v.shape, signed=False)
    assert float(jnp.max(jnp.abs(jnp.sqrt(y) - jnp.sqrt(v)))) <= float(
        jnp.sqrt(v).max()) / 254 + 1e-7


def test_adamw8bit_tracks_fp32_adamw(rng):
    """On a quadratic, the 8-bit trajectory must stay close to fp32 AdamW."""
    target = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    p0 = {"w": jnp.zeros((64, 128), jnp.float32),
          "b": jnp.zeros((32,), jnp.float32)}  # small leaf stays fp32

    def loss(p):
        return jnp.mean(jnp.square(p["w"] - target)) + jnp.mean(jnp.square(p["b"] - 1.0))

    def run(opt, steps=150):
        p = jax.tree.map(jnp.copy, p0)
        st = opt.init(p)

        @jax.jit
        def step(p, st):
            g = jax.grad(loss)(p)
            up, st = opt.update(g, st, p)
            return optax.apply_updates(p, up), st

        for _ in range(steps):
            p, st = step(p, st)
        return p, st

    p8, st8 = run(adamw8bit(1e-2, min_quantize_size=4096))
    p32, _ = run(optax.adamw(1e-2, weight_decay=0.0))

    l8, l32 = float(loss(p8)), float(loss(p32))
    assert l8 < 0.1 * float(loss(p0))  # actually optimizes
    assert l8 < max(l32 * 2.0, l32 + 1e-3)  # within 2x of fp32 loss

    # big leaf quantized, small leaf passthrough
    mu = st8.mu
    assert isinstance(mu["w"], _QTensor) and mu["w"].codes.dtype == jnp.int8
    assert not isinstance(mu["b"], _QTensor) and mu["b"].dtype == jnp.float32


def test_adamw8bit_memory_footprint():
    p = {"w": jnp.zeros((1024, 1024), jnp.float32)}
    st8 = adamw8bit(1e-3).init(p)
    st32 = optax.adamw(1e-3).init(p)
    b8, b32 = state_bytes(st8), state_bytes(st32)
    # 2 moments: 8 bytes/param fp32 vs ~2.03 bytes/param int8+scales
    assert b32 >= 8 * 1024 * 1024
    assert b8 < 0.3 * b32


def test_weight_decay_applied(rng):
    p = {"w": jnp.ones((128, 64), jnp.float32)}
    opt = adamw8bit(1e-2, weight_decay=0.1, min_quantize_size=1)
    st = opt.init(p)
    g = {"w": jnp.zeros((128, 64), jnp.float32)}
    up, _ = opt.update(g, st, p)
    # zero grad => update is pure decay: -lr * wd * w
    np.testing.assert_allclose(np.asarray(up["w"]), -1e-2 * 0.1, rtol=1e-5)


def test_train_step_with_bnb_optimizer(rng):
    """Full jitted CFM train step with the 8-bit optimizer via TrainConfig."""
    from f5e_tts_tpu.config import CFMConfig, DiTConfig, TrainConfig
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.train import step as fstep

    arch = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
                     text_dim=32, conv_layers=1, dropout=0.0)
    params, model_state = fdit.init_dit(jax.random.PRNGKey(0), arch, 16)
    train = TrainConfig(learning_rate=1e-4, num_warmup_updates=2,
                        max_grad_norm=1.0, bnb_optimizer=True)
    opt = fstep.make_optimizer(train, total_updates=10)
    ts = fstep.init_train_state(params, model_state, opt)

    b, n, nt = 2, 32, 8
    batch = {"mel": jnp.asarray(rng.standard_normal((b, n, 8)).astype(np.float32)),
             "mel_lens": jnp.full((b,), n, jnp.int32),
             "text_ids": jnp.zeros((b, nt), jnp.int32)}
    step = jax.jit(lambda ts, batch, rng: fstep.train_step(
        ts, batch, rng, arch=arch, cfm=CFMConfig(), optimizer=opt,
        compute_dtype=jnp.float32))
    ts1, m1 = step(ts, batch, jax.random.PRNGKey(1))
    ts2, m2 = step(ts1, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1.loss)) and np.isfinite(float(m2.loss))
    assert int(ts2.update) == 2
    # params actually moved
    d = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                        jax.tree.map(lambda a, b: a - b, ts2.params, ts.params), 0.0)
    assert d > 0
