"""Fused gated-residual AdaLN kernel: interpret-mode parity + gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from f5e_tts_tpu.ops.pallas_norm import (_gated_adaln_fwd_impl, _reference_gated_adaln,
                                         gated_adaln)


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
