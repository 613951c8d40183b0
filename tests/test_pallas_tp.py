"""Tensor-parallel Pallas attention: `shard_heads_call` splits heads over the
mesh 'model' axis (attention is independent per head, so zero collectives).
Validated on the 8-device virtual CPU mesh with the kernel in interpret mode
and against the pure-XLA oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from f5e_tts_tpu.ops.attention import set_tp_context, shard_heads_call
from f5e_tts_tpu.ops.pallas_attention import _reference_rope_attn, mha_fullkv_rope

B, N, H, DH = 2, 256, 8, 64
TP = 4


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[: 2 * TP]).reshape(2, TP)
    return Mesh(devs, ("data", "model"))


@pytest.fixture
def qkv(rng):
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, H, DH)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kv_lens = jnp.asarray([N, N - 37], jnp.int32)
    cos = jnp.asarray(rng.standard_normal((N, DH)).astype(np.float32) * 0.1 + 1.0)
    sin = jnp.asarray(rng.standard_normal((N, DH)).astype(np.float32) * 0.1)
    return q, k, v, kv_lens, cos, sin


def test_shard_heads_pallas_interpret_matches_oracle(mesh, qkv):
    q, k, v, kv_lens, cos, sin = qkv
    local = H // TP

    out = shard_heads_call(
        lambda qq, kk, vv, ll, cc, ss: mha_fullkv_rope(
            qq, kk, vv, ll, cc, ss, rope_heads=local, interpret=True),
        q, k, v, kv_lens, cos, sin, mesh=mesh, axis="model")
    ref = _reference_rope_attn(q, k, v, kv_lens, cos, sin, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_shard_heads_call_differentiable(mesh, qkv):
    """The wrapper itself must compose with grad (kernel custom VJPs plug in
    on TPU); checked here with the XLA oracle as the body."""
    q, k, v, kv_lens, cos, sin = qkv

    def loss_sharded(q, k, v):
        o = shard_heads_call(
            lambda qq, kk, vv, ll, cc, ss: _reference_rope_attn(qq, kk, vv, ll, cc, ss,
                                                                qq.shape[2]),
            q, k, v, kv_lens, cos, sin, mesh=mesh, axis="model")
        return jnp.sum(o * o)

    def loss_plain(q, k, v):
        o = _reference_rope_attn(q, k, v, kv_lens, cos, sin, H)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_shard_heads_call_under_jit_with_sharded_inputs(mesh, qkv):
    """Same path the trainer takes: inputs laid out with heads sharded on the
    model axis, wrapper called inside jit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v, kv_lens, cos, sin = qkv
    hsharding = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(a, hsharding) for a in (q, k, v))

    @jax.jit
    def f(q, k, v):
        return shard_heads_call(
            lambda qq, kk, vv, ll, cc, ss: _reference_rope_attn(qq, kk, vv, ll, cc, ss,
                                                                qq.shape[2]),
            q, k, v, kv_lens, cos, sin, mesh=mesh, axis="model")

    out = f(qs, ks, vs)
    ref = _reference_rope_attn(q, k, v, kv_lens, cos, sin, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tp_context_roundtrip(mesh):
    from f5e_tts_tpu.ops import attention as fattn

    set_tp_context(mesh)
    assert fattn._tp_shards() == TP
    set_tp_context(None)
    assert fattn._tp_shards() == 1
