"""Ring attention (context parallelism over 'seq'): sharded-K/V online-softmax
ring must equal full attention, on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import MeshConfig
from f5e_tts_tpu.ops.ring_attention import ring_attention
from f5e_tts_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=1, seq=4))


def _ref(q, k, v, kv_lens):
    mask = jnp.arange(k.shape[1])[None, :] < kv_lens[:, None]
    return jax.nn.dot_product_attention(q, k, v, mask=mask[:, None, None, :])


def test_ring_matches_full_attention(mesh, rng):
    b, n, h, dh = 2, 256, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 150], jnp.int32)

    out = ring_attention(q, k, v, kv_lens, mesh)
    ref = _ref(q, k, v, kv_lens)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0],
                               rtol=2e-5, atol=2e-5)
    # padded rows of item 1 get uniform attention in the XLA reference but are
    # caller-masked downstream; compare the valid region
    np.testing.assert_allclose(np.asarray(out)[1, :150], np.asarray(ref)[1, :150],
                               rtol=2e-5, atol=2e-5)


def test_ring_rope_matches_full(mesh, rng):
    from f5e_tts_tpu.ops.rope import apply_rotary_half, rotary_cos_sin_half

    b, n, h, dh = 2, 128, 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([n, 100], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    out = ring_attention(q, k, v, kv_lens, mesh, rope_cos=cos, rope_sin=sin)
    qr = apply_rotary_half(q, cos[None, :, None, :], sin[None, :, None, :])
    kr = apply_rotary_half(k, cos[None, :, None, :], sin[None, :, None, :])
    ref = _ref(qr, kr, v, kv_lens)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[1, :100], np.asarray(ref)[1, :100],
                               rtol=2e-5, atol=2e-5)


def test_dit_forward_via_ring_matches_replicated(mesh, rng):
    """Full DiT forward with set_sp_context routing attention through the
    ring must equal the replicated forward (the GSPMD all-gather path)."""
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.ops.attention import set_sp_context

    arch = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=8, text_dim=32, conv_layers=1, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), arch, 16)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((arch.dim, arch.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((arch.mel_dim,), jnp.float32),
    }
    b, n, nt = 2, 64, 8
    x = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 16, (b, nt)).astype(np.int32))
    time = jnp.full((b,), 0.4, jnp.float32)
    f = jnp.zeros((b,), bool)

    def fwd(p, x, cond, text):
        pred, _ = fdit.dit_forward(p, state, arch, x=x, cond=cond, text_ids=text,
                                   time=time, drop_audio_cond=f, drop_text=f,
                                   drop_ppg=f, compute_dtype=jnp.float32)
        return pred

    ref = np.asarray(jax.jit(fwd)(params, x, cond, text))
    set_sp_context(mesh, min_seq=n)
    try:
        with mesh:
            out = np.asarray(jax.jit(fwd)(params, x, cond, text))
    finally:
        set_sp_context(None)
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)


def test_ring_differentiable(mesh, rng):
    b, n, h, dh = 1, 128, 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([n], jnp.int32)

    g_ring = jax.grad(lambda q, k, v: jnp.sum(
        ring_attention(q, k, v, kv_lens, mesh) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        _ref(q, k, v, kv_lens) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=5e-5, atol=5e-5)
