"""Ring attention over the 'seq' mesh axis (context parallelism).

The GSPMD default for sequence-sharded attention is an all-gather of K/V onto
every device — O(N) memory per device regardless of the shard count. Ring
attention keeps K/V sharded: each of the S devices holds an N/S block, and
blocks rotate around the ring via ppermute while every device accumulates
online-softmax partial results for its local queries. Peak memory per device
is O(N/S) and the transfers ride the ICI neighbor links (the scaling-book
collective pattern; reference capability: TRT-LLM --cp_size context
parallelism, convert_checkpoint.py:189).

Numerically this is the standard safe online softmax: finite -1e30 masks, a
running row max, correction factors on the accumulator, masked columns zeroed
explicitly so fully-masked steps contribute nothing.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG = -1e30


def _shard_map(f, mesh, in_specs, out_specs):
    try:  # moved out of experimental in newer jax
        from jax import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kv_lens: Optional[jnp.ndarray], mesh, axis: str = "seq",
                   rope_cos: Optional[jnp.ndarray] = None,
                   rope_sin: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, N, H, dh) attention with q/k/v sharded over `axis` on dim 1.

    kv_lens: (B,) key-validity prefix lengths (None = all valid). Optional
    half-split rope tables (N, dh) are applied to q/k inside the shard (global
    positions recovered from the device's ring index), so callers pass
    UN-rotated q/k. Returns the same (B, N, H, dh) layout/sharding.
    """
    s = int(mesh.shape[axis])
    b, n, h, dh = q.shape
    assert n % s == 0, (n, s)
    sm_scale = 1.0 / math.sqrt(dh)

    if kv_lens is None:
        kv_lens = jnp.full((b,), n, jnp.int32)

    def body(q, k, v, kv_lens, cos, sin):
        idx = jax.lax.axis_index(axis)
        nb = q.shape[1]
        dtype = q.dtype

        if cos is not None:
            # rope with GLOBAL positions: this device's rows start at idx*nb
            from f5e_tts_tpu.ops.rope import apply_rotary_half

            pos = jax.lax.dynamic_slice_in_dim(cos, idx * nb, nb, axis=0)
            psn = jax.lax.dynamic_slice_in_dim(sin, idx * nb, nb, axis=0)
            q = apply_rotary_half(q, pos[None, :, None, :], psn[None, :, None, :]).astype(dtype)
            k = apply_rotary_half(k, pos[None, :, None, :], psn[None, :, None, :]).astype(dtype)

        m = jnp.full((b, h, nb), _NEG, jnp.float32)
        l = jnp.zeros((b, h, nb), jnp.float32)
        acc = jnp.zeros((b, h, nb, dh), jnp.float32)
        perm = [(i, (i + 1) % s) for i in range(s)]

        def step(t, carry):
            k, v, m, l, acc = carry
            # the block on this device at ring step t originated on idx - t
            src = jax.lax.rem(idx - t + s, s)
            cols = src * nb + jnp.arange(nb)
            valid = cols[None, :] < kv_lens[:, None]  # (b, nb_k)

            sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * sm_scale
            sc = jnp.where(valid[:, None, None, :], sc, _NEG)
            m_new = jnp.maximum(m, jnp.max(sc, axis=-1))
            p = jnp.exp(sc - m_new[..., None])
            p = jnp.where(valid[:, None, None, :], p, 0.0)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            return k, v, m_new, l, acc

        k, v, m, l, acc = jax.lax.fori_loop(0, s, step, (k, v, m, l, acc))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return jnp.transpose(out, (0, 2, 1, 3)).astype(dtype)

    shard = P(None, axis, None, None)
    table = P(None, None)
    if rope_cos is None:
        f = _shard_map(lambda q, k, v, kl: body(q, k, v, kl, None, None),
                       mesh, (shard, shard, shard, P(None)), shard)
        return f(q, k, v, kv_lens)
    f = _shard_map(body, mesh, (shard, shard, shard, P(None), table, table), shard)
    return f(q, k, v, kv_lens, rope_cos.astype(jnp.float32),
             rope_sin.astype(jnp.float32))
