"""Fused gated-residual AdaLN kernel: interpret-mode parity + gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.ops.pallas_norm import (_gated_adaln_bwd_impl, _gated_adaln_fwd_impl,
                                         _reference_gated_adaln, gated_adaln)


def test_fused_matches_reference(rng):
    b, n, d = 2, 256, 64
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)) * 0.1
    shift = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)) * 0.1

    nx1, o1 = _gated_adaln_fwd_impl(x, y, gate, scale, shift, block_n=128, interpret=True)
    nx2, o2 = _reference_gated_adaln(x, y, gate, scale, shift)
    np.testing.assert_allclose(np.asarray(nx1), np.asarray(nx2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-4)


def test_non_256_multiple_lengths(rng):
    """Batches padded to 128-multiples that are NOT 256-multiples (384/640/896)
    must not trip the kernel's divisibility assert (round-1 advisor high)."""
    b, d = 2, 64
    for n in (384, 640, 896):
        x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        gate = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
        scale = jnp.zeros((b, d), jnp.float32)
        shift = jnp.zeros((b, d), jnp.float32)
        block_n = 256 if n % 256 == 0 else 128  # dispatch rule in gated_adaln
        assert n % block_n == 0
        nx1, o1 = _gated_adaln_fwd_impl(x, y, gate, scale, shift,
                                        block_n=block_n, interpret=True)
        nx2, o2 = _reference_gated_adaln(x, y, gate, scale, shift)
        np.testing.assert_allclose(np.asarray(nx1), np.asarray(nx2), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-4)


def test_gradients(rng):
    b, n, d = 1, 128, 32
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    scale = jnp.zeros((b, d), jnp.float32)
    shift = jnp.zeros((b, d), jnp.float32)

    def loss(x, y, gate):
        nx, o = gated_adaln(x, y, gate, scale, shift)
        return jnp.sum(o**2) + jnp.sum(nx**2)

    def loss_ref(x, y, gate):
        nx, o = _reference_gated_adaln(x, y, gate, scale, shift)
        return jnp.sum(o**2) + jnp.sum(nx**2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(x, y, gate)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, y, gate)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_pallas_bwd_matches_vjp(rng):
    """The fused Pallas VJP kernel must match jax.vjp of the reference on
    every input's gradient, including the scratch-accumulated row grads."""
    b, n, d = 3, 384, 128
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)) * 0.1
    shift = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)) * 0.1
    g_newx = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    g_out = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))

    _, vjp = jax.vjp(_reference_gated_adaln, x, y, gate, scale, shift)
    ref = vjp((g_newx, g_out))
    got = _gated_adaln_bwd_impl(x, y, gate, scale, g_newx, g_out,
                                block_n=128, interpret=True)
    for a, b_, name in zip(got, ref, ("dx", "dy", "dgate", "dscale", "dshift")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_bwd_bf16_io(rng):
    """bf16 primals/cotangents (the training dtype) round through the kernel
    with fp32 internal math; grads stay finite and close to the fp32 path."""
    b, n, d = 2, 256, 64
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x, y, gnx, gout = (mk(b, n, d).astype(jnp.bfloat16) for _ in range(4))
    gate, scale = (mk(b, d).astype(jnp.bfloat16) for _ in range(2))
    got = _gated_adaln_bwd_impl(x, y, gate, scale, gnx, gout,
                                block_n=128, interpret=True)
    _, vjp = jax.vjp(_reference_gated_adaln,
                     x.astype(jnp.float32), y.astype(jnp.float32),
                     gate.astype(jnp.float32), scale.astype(jnp.float32),
                     jnp.zeros((b, d), jnp.float32))
    ref = vjp((gnx.astype(jnp.float32), gout.astype(jnp.float32)))
    for a, b_, name in zip(got, ref, ("dx", "dy", "dgate", "dscale", "dshift")):
        a = np.asarray(a, np.float32)
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, np.asarray(b_), rtol=0.1, atol=0.1,
                                   err_msg=name)
