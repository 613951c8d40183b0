"""Multi-head attention core.

TPU default: the custom fused rope+attention Pallas kernel
(ops/pallas_attention.py, full K/V in VMEM — see BENCHMARKS.md for why the
stock flash kernel and the XLA path both lose here). CPU / unsupported shapes
fall back to `jax.nn.dot_product_attention`. Heads-last (B, N, H, Dh) layout
throughout. Training differentiates through a custom VJP (XLA-recompute bwd).

reference semantics: src/f5_tts/model/modules.py:435-503 (AttnProcessor) —
non-causal SDPA, optional qk RMSNorm per head, RoPE applied to q/k (optionally
only the first `pe_attn_head` heads), padding mask on keys, masked fill of the
output rows.

Tensor parallelism: pallas_call has no GSPMD partitioning rule, so under a
sharded 'model' axis XLA would replicate the kernel. Registering the mesh via
`set_tp_context(mesh)` makes the Pallas paths run under `shard_map` with heads
split over the TP axis — attention is embarrassingly parallel over heads, so
each device runs the kernel on its local head slice with zero collectives
(Megatron-style head sharding, matching parallel/mesh.py's param specs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from f5e_tts_tpu.ops import nn as fnn
from jax.ad_checkpoint import checkpoint_name

from f5e_tts_tpu.ops.rope import apply_rotary_half as apply_rotary


import os

# Measured on v5e-lite (DiT Base, B=2, H=16, N=1536, dh=64): the Pallas flash
# kernel REGRESSED end-to-end RTF 0.078 -> 0.138 vs XLA's fused attention
# (dh=64 pads to 128 inside the kernel; small batch). Off by default; set
# F5E_FLASH_ATTENTION=1 for long-sequence regimes where score materialization
# dominates.
_USE_FLASH = os.environ.get("F5E_FLASH_ATTENTION", "0") == "1"


def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _flash_ok(q, k) -> bool:
    """Stock Pallas flash kernel constraints."""
    if not _USE_FLASH or not _backend_is_tpu():
        return False
    n, m = q.shape[1], k.shape[1]
    return n == m and n % 128 == 0 and q.shape[-1] in (64, 128, 256)


_USE_PALLAS_FULLKV = os.environ.get("F5E_PALLAS_ATTENTION", "1") != "0"

# Tensor-parallel context: set by the trainer / server when the mesh has a
# model axis > 1 so Pallas attention shards over heads instead of replicating.
_TP = {"mesh": None, "axis": "model"}


def set_tp_context(mesh, axis: str = "model") -> None:
    """Register the device mesh for head-sharded Pallas attention.

    Call with `None` to clear. Only takes effect when `mesh.shape[axis] > 1`
    and the head count divides evenly; otherwise the unsharded path is used.
    """
    _TP["mesh"] = mesh
    _TP["axis"] = axis


def _tp_shards() -> int:
    mesh = _TP["mesh"]
    if mesh is None or _TP["axis"] not in mesh.shape:
        return 1
    return int(mesh.shape[_TP["axis"]])


# Sequence-parallel context: with a 'seq' mesh axis > 1, long sequences route
# to ring attention (ops/ring_attention.py) — K/V stay sharded and rotate via
# ppermute instead of GSPMD's all-gather. min_seq keeps short sequences on
# the all-gather path where a single collective beats S ring steps.
_SP = {"mesh": None, "axis": "seq", "min_seq": 2048}


def set_sp_context(mesh, axis: str = "seq", min_seq: int = 2048) -> None:
    """Register the mesh for ring-attention context parallelism (None clears)."""
    _SP["mesh"] = mesh
    _SP["axis"] = axis
    _SP["min_seq"] = min_seq


def _sp_shards(n: int) -> int:
    mesh = _SP["mesh"]
    if mesh is None or _SP["axis"] not in mesh.shape:
        return 1
    s = int(mesh.shape[_SP["axis"]])
    if s <= 1 or n < _SP["min_seq"] or n % s:
        return 1
    return s


def shard_heads_call(fn, q, k, v, kv_lens, *tables, mesh=None, axis=None):
    """Run a (B, N, H, dh)-layout attention kernel under shard_map with heads
    split over the TP mesh axis.

    `fn(q, k, v, kv_lens, *tables)` sees per-device arrays with H/tp heads;
    kv_lens and rope tables are replicated. No collectives are needed —
    softmax(qK^T)V is independent per head. Differentiable (shard_map
    composes with the kernels' custom VJPs).
    """
    from jax.sharding import PartitionSpec as P

    try:  # moved out of experimental in newer jax
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    mesh = mesh if mesh is not None else _TP["mesh"]
    axis = axis if axis is not None else _TP["axis"]
    hspec = P(None, None, axis, None)
    in_specs = (hspec, hspec, hspec, P(None)) + tuple(P(None, None) for _ in tables)
    f = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=hspec)
    return f(q, k, v, kv_lens, *tables)


def sdpa(
    q: jnp.ndarray,  # (B, N, H, Dh)
    k: jnp.ndarray,  # (B, M, H, Dh)
    v: jnp.ndarray,  # (B, M, H, Dh)
    mask: Optional[jnp.ndarray] = None,  # (B, M) True=keep, key padding mask
    prefix_mask: bool = True,
) -> jnp.ndarray:
    """Fused scaled-dot-product attention, (B, N, H, Dh) out.

    TPU default: the custom full-K-in-VMEM Pallas kernel
    (ops/pallas_attention.py) — scores never touch HBM, the dominant cost of
    the XLA path at these shapes. Stock flash kernel available behind
    F5E_FLASH_ATTENTION=1 (measured slower here); XLA fallback elsewhere.

    NOTE on masks: the kernel takes key-validity LENGTHS, i.e. it requires the
    padding mask to be a length prefix (True...False...) — what lens_to_mask
    produces. Callers whose mask is NOT a prefix (e.g. joint attention's
    audio-prefix + all-True text tail) must pass prefix_mask=False so the
    Pallas length path is skipped; the flash/XLA paths handle arbitrary masks.
    """
    if _USE_PALLAS_FULLKV and _backend_is_tpu() and (mask is None or prefix_mask):
        from f5e_tts_tpu.ops.pallas_attention import mha_fullkv_ad, supported

        if supported(q, k):
            if mask is not None:
                kv_lens = jnp.sum(mask.astype(jnp.int32), axis=-1)
            else:
                kv_lens = jnp.full((q.shape[0],), k.shape[1], jnp.int32)
            tp = _tp_shards()
            if tp > 1 and q.shape[2] % tp == 0:
                return shard_heads_call(mha_fullkv_ad, q, k, v, kv_lens)
            return mha_fullkv_ad(q, k, v, kv_lens)
    if _flash_ok(q, k):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)

        qT = jnp.transpose(q, (0, 2, 1, 3))
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))
        seg = None
        if mask is not None:
            ids = mask.astype(jnp.int32) + 1  # valid=2, pad=1 (any distinct ids)
            pad_ids = jnp.where(mask, ids, 0)
            seg = SegmentIds(q=pad_ids, kv=pad_ids)
        o = flash_attention(qT, kT, vT, segment_ids=seg, causal=False,
                            sm_scale=float(1.0 / (q.shape[-1] ** 0.5)))
        return jnp.transpose(o, (0, 2, 1, 3))
    if mask is not None:
        attn_mask = mask[:, None, None, :]
    else:
        attn_mask = None
    return jax.nn.dot_product_attention(q, k, v, mask=attn_mask)


def attention(
    p: dict,
    x: jnp.ndarray,  # (B, N, D)
    heads: int,
    mask: Optional[jnp.ndarray] = None,  # (B, N) True=keep
    rope_cos: Optional[jnp.ndarray] = None,  # (N, Dh)
    rope_sin: Optional[jnp.ndarray] = None,
    pe_attn_head: Optional[int] = None,
    qk_norm: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Self-attention block matching the reference AttnProcessor.

    p: {to_q, to_k, to_v, to_out: linear params, [q_norm, k_norm: rmsnorm params]}
    """
    b, n, _ = x.shape
    if "to_qkv" in p:
        # fused projection (weights concatenated [q|k|v] by the caller)
        h = fnn.linear(p["to_qkv"], x, compute_dtype)
        q, k, v = jnp.split(h, 3, axis=-1)
    else:
        q = fnn.linear(p["to_q"], x, compute_dtype)
        k = fnn.linear(p["to_k"], x, compute_dtype)
        v = fnn.linear(p["to_v"], x, compute_dtype)
    dh = q.shape[-1] // heads
    q = q.reshape(b, n, heads, dh)
    k = k.reshape(b, n, heads, dh)
    v = v.reshape(b, n, heads, dh)

    if qk_norm == "rms_norm":
        q = fnn.rmsnorm(p["q_norm"], q)
        k = fnn.rmsnorm(p["k_norm"], k)

    # context-parallel ring attention: under a 'seq' mesh axis with long
    # sequences, keep K/V sharded and rotate blocks over ICI instead of
    # letting GSPMD all-gather them (full-heads rope only — partial
    # pe_attn_head rope stays on the gather path)
    sp = _sp_shards(n)
    if sp > 1 and (pe_attn_head is None or rope_cos is None):
        from f5e_tts_tpu.ops.ring_attention import ring_attention

        kv_lens = (jnp.sum(mask.astype(jnp.int32), axis=-1) if mask is not None
                   else None)
        o = ring_attention(q, k, v, kv_lens, _SP["mesh"], axis=_SP["axis"],
                           rope_cos=None if rope_cos is None else rope_cos[:n],
                           rope_sin=None if rope_sin is None else rope_sin[:n])
        o = checkpoint_name(o, "attn_out")
        o = o.reshape(b, n, heads * dh)
        o = fnn.linear(p["to_out"], o, compute_dtype)
        if mask is not None:
            o = jnp.where(mask[:, :, None], o, 0.0).astype(o.dtype)
        return o

    # fused rope+attention fast path (Pallas): rotation on VMEM tiles
    if (_USE_PALLAS_FULLKV and rope_cos is not None and _backend_is_tpu()):
        from f5e_tts_tpu.ops.pallas_attention import mha_fullkv_rope_ad, supported

        if supported(q, k, rope=True):
            if mask is not None:
                kv_lens = jnp.sum(mask.astype(jnp.int32), axis=-1)
            else:
                kv_lens = jnp.full((b,), n, jnp.int32)
            rope_heads = pe_attn_head if pe_attn_head is not None else heads
            tp = _tp_shards()
            if tp > 1 and heads % tp == 0 and rope_heads == heads:
                # per-shard head ids restart at 0, so partial-rope
                # (pe_attn_head < heads) can't shard; all-heads rope can.
                local = heads // tp
                o = shard_heads_call(
                    lambda qq, kk, vv, ll, cc, ss: mha_fullkv_rope_ad(
                        qq, kk, vv, ll, cc, ss, local),
                    q, k, v, kv_lens, rope_cos[:n], rope_sin[:n])
            else:
                o = mha_fullkv_rope_ad(q, k, v, kv_lens, rope_cos[:n], rope_sin[:n],
                                       rope_heads)
            o = checkpoint_name(o, "attn_out")
            o = o.reshape(b, n, heads * dh)
            o = fnn.linear(p["to_out"], o, compute_dtype)
            if mask is not None:
                o = jnp.where(mask[:, :, None], o, 0.0).astype(o.dtype)
            return o

    if rope_cos is not None:
        cos = rope_cos[None, :n, None, :]
        sin = rope_sin[None, :n, None, :]
        if pe_attn_head is not None:
            # rope only on the first pe_attn_head heads
            # (reference: src/f5_tts/model/modules.py:474-477)
            pn = pe_attn_head
            q = jnp.concatenate([apply_rotary(q[:, :, :pn], cos, sin), q[:, :, pn:]], axis=2)
            k = jnp.concatenate([apply_rotary(k[:, :, :pn], cos, sin), k[:, :, pn:]], axis=2)
        else:
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)

    o = sdpa(q, k, v, mask=mask)
    o = checkpoint_name(o, "attn_out")
    o = o.reshape(b, n, heads * dh)
    o = fnn.linear(p["to_out"], o, compute_dtype)
    if mask is not None:
        o = jnp.where(mask[:, :, None], o, 0.0).astype(o.dtype)
    return o


def attention_init(key, dim: int, heads: int, dim_head: int, qk_norm: Optional[str] = None):
    ks = jax.random.split(key, 4)
    inner = heads * dim_head
    p = {
        "to_q": fnn.linear_init(ks[0], dim, inner),
        "to_k": fnn.linear_init(ks[1], dim, inner),
        "to_v": fnn.linear_init(ks[2], dim, inner),
        "to_out": fnn.linear_init(ks[3], inner, dim),
    }
    if qk_norm == "rms_norm":
        p["q_norm"] = fnn.rmsnorm_init(dim_head)
        p["k_norm"] = fnn.rmsnorm_init(dim_head)
    return p


def joint_attention(
    p: dict,
    x: jnp.ndarray,  # (B, N, D) audio stream
    c: jnp.ndarray,  # (B, Nt, Dc) text/context stream
    heads: int,
    mask: Optional[jnp.ndarray] = None,  # (B, N) audio padding mask
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    c_rope_cos: Optional[jnp.ndarray] = None,
    c_rope_sin: Optional[jnp.ndarray] = None,
    context_pre_only: bool = False,
    qk_norm: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
):
    """Joint (MMDiT) attention: concat audio+context kv, split outputs.

    reference: src/f5_tts/model/modules.py:510-604 (JointAttnProcessor).
    Returns (x_out, c_out); c_out is None when context_pre_only.
    """
    b, n, _ = x.shape
    nt = c.shape[1]
    dh = None

    def proj(pp, y, length):
        nonlocal dh
        t = fnn.linear(pp, y, compute_dtype)
        dh = t.shape[-1] // heads
        return t.reshape(b, length, heads, dh)

    q = proj(p["to_q"], x, n)
    k = proj(p["to_k"], x, n)
    v = proj(p["to_v"], x, n)
    cq = proj(p["to_q_c"], c, nt)
    ck = proj(p["to_k_c"], c, nt)
    cv = proj(p["to_v_c"], c, nt)

    if qk_norm == "rms_norm":
        q = fnn.rmsnorm(p["q_norm"], q)
        k = fnn.rmsnorm(p["k_norm"], k)
        cq = fnn.rmsnorm(p["c_q_norm"], cq)
        ck = fnn.rmsnorm(p["c_k_norm"], ck)

    if rope_cos is not None:
        q = apply_rotary(q, rope_cos[None, :n, None, :], rope_sin[None, :n, None, :])
        k = apply_rotary(k, rope_cos[None, :n, None, :], rope_sin[None, :n, None, :])
    if c_rope_cos is not None:
        cq = apply_rotary(cq, c_rope_cos[None, :nt, None, :], c_rope_sin[None, :nt, None, :])
        ck = apply_rotary(ck, c_rope_cos[None, :nt, None, :], c_rope_sin[None, :nt, None, :])

    q = jnp.concatenate([q, cq], axis=1)
    k = jnp.concatenate([k, ck], axis=1)
    v = jnp.concatenate([v, cv], axis=1)

    if mask is not None:
        full_mask = jnp.concatenate([mask, jnp.ones((b, nt), dtype=bool)], axis=1)
    else:
        full_mask = None

    # full_mask = [audio prefix | all-True text] is NOT a length prefix when
    # any audio position is padded — the plain kv_lens Pallas path would
    # attend padded audio and mask the valid text tail (round-1 advisor
    # high). The dedicated joint kernel takes (audio_lens, n_audio) and keeps
    # the text tail always-valid; flash/XLA otherwise.
    o = None
    if _USE_PALLAS_FULLKV and mask is not None and _backend_is_tpu():
        from f5e_tts_tpu.ops.pallas_attention import (mha_fullkv_joint_ad,
                                                      supported)

        if supported(q, k, block_q=256) and _tp_shards() == 1:
            audio_lens = jnp.sum(mask.astype(jnp.int32), axis=-1)
            o = mha_fullkv_joint_ad(q, k, v, audio_lens, n)
    if o is None:
        o = sdpa(q, k, v, mask=full_mask, prefix_mask=False)
    o = o.reshape(b, n + nt, heads * dh)
    xo, co = o[:, :n], o[:, n:]
    xo = fnn.linear(p["to_out"], xo, compute_dtype)
    if not context_pre_only:
        co = fnn.linear(p["to_out_c"], co, compute_dtype)
    else:
        co = None
    if mask is not None:
        xo = jnp.where(mask[:, :, None], xo, 0.0).astype(xo.dtype)
    return xo, co


def joint_attention_init(key, dim: int, context_dim: int, heads: int, dim_head: int,
                         context_pre_only: bool = False, qk_norm: Optional[str] = None):
    ks = jax.random.split(key, 8)
    inner = heads * dim_head
    p = {
        "to_q": fnn.linear_init(ks[0], dim, inner),
        "to_k": fnn.linear_init(ks[1], dim, inner),
        "to_v": fnn.linear_init(ks[2], dim, inner),
        "to_q_c": fnn.linear_init(ks[3], context_dim, inner),
        "to_k_c": fnn.linear_init(ks[4], context_dim, inner),
        "to_v_c": fnn.linear_init(ks[5], context_dim, inner),
        "to_out": fnn.linear_init(ks[6], inner, dim),
    }
    if not context_pre_only:
        p["to_out_c"] = fnn.linear_init(ks[7], inner, context_dim)
    if qk_norm == "rms_norm":
        p["q_norm"] = fnn.rmsnorm_init(dim_head)
        p["k_norm"] = fnn.rmsnorm_init(dim_head)
        p["c_q_norm"] = fnn.rmsnorm_init(dim_head)
        p["c_k_norm"] = fnn.rmsnorm_init(dim_head)
    return p
