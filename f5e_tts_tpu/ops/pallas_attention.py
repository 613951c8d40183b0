"""Custom Pallas TPU attention kernel for the DiT's shape regime.

Why not the stock flash kernel: profiled on the real sampler (dh=64, H=16,
N<=4096, non-causal, bf16), `jax.experimental.pallas.ops.tpu.flash_attention`
ran 2.2x SLOWER than XLA's score-materializing path (1376 ms vs 615 ms per
32-step synth) — its online-softmax machinery and 128-padded head tiles don't
pay off here. XLA's path in turn is HBM-bound writing/reading the fp32
(B,H,N,N) score tensor (~300 MB per layer-step).

This kernel exploits the actual regime: K/V for one head fit entirely in VMEM
(N<=4096: 2 x 4096x64 bf16 = 1 MB), so each (head, q-block) grid cell computes
softmax(q K^T) V in one pass — no online softmax, no score HBM traffic at all.

Padding mask: key-validity lengths enter via scalar prefetch; invalid columns
get -inf before the softmax. Rows beyond the valid q length produce uniform
attention (harmless — the caller masks output rows).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fit_block_q(n: int, block_q: int) -> int:
    """Largest block <= block_q that divides n, preferring multiples of 16
    (the bf16 sublane tile). Non-power-of-two divisors matter: training
    buckets like n=1664 = 128*13 would otherwise drop to block_q=128 (13 grid
    cells per head), while 416 divides it with 4x fewer cells. Always returns
    a divisor of n — for tiny/odd n with no 16-multiple divisor it falls back
    to halving (the pre-round-3 behavior), so callers' `n % block_q == 0`
    asserts hold for any input."""
    block_q = min(block_q, n)
    for cand in range(block_q - block_q % 16, 15, -16):
        if n % cand == 0:
            return cand
    while n % block_q:
        block_q //= 2
    return block_q


def _attn_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                 heads: int, block_q: int, n: int):
    """One (batch*head, q-block) cell: softmax(q K^T) V with full K in VMEM."""
    # fold sm_scale into the (block_q, dh) q tile instead of scaling the
    # (block_q, n) score tile — n/dh x less VPU work (fp32 upcast keeps the
    # fold exact-enough for non-power-of-two scales, i.e. dh=128)
    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0]  # (n, dh)
    v = v_ref[0]  # (n, dh)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, n)

    bh = pl.program_id(0)
    b = bh // heads
    kv_len = kv_len_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    # normalize AFTER p@v: one (block_q, dh) divide instead of (block_q, n) —
    # the softmax is the kernel's VPU bottleneck (exp/reduces over n^2), and
    # the fp32-accumulate-then-divide is also slightly more accurate than
    # dividing in bf16 before the matmul
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def mha_fullkv(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               kv_lens: jnp.ndarray, block_q: int = 512) -> jnp.ndarray:
    """(B, N, H, dh) attention with key-padding lengths (B,). Returns same layout.

    Constraints: N % block_q == 0, dh a multiple of 64 tiling (64/128 fine),
    N*dh*2 (K+V per head) must fit VMEM alongside the (block_q, N) f32 scores.
    """
    b, n, h, dh = q.shape
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    # (B, N, H, dh) -> (B*H, N, dh)
    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)

    grid = (b * h, n // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale, heads=h,
                          block_q=block_q, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, kv_len_ref: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, kv_len_ref: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, kv_len_ref: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, kv_len_ref: (bh, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(kv_lens.astype(jnp.int32), qh, kh, vh)

    return jnp.transpose(out.reshape(b, h, n, dh), (0, 2, 1, 3))


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _attn_rope_kernel(kv_len_ref, q_ref, k_ref, v_ref, cos_q_ref, sin_q_ref,
                      cos_k_ref, sin_k_ref, o_ref, krot_ref, *, sm_scale: float,
                      heads: int, rope_heads: int, n: int):
    """Fused rope + attention: rotation happens on VMEM-resident tiles, saving
    the HBM round-trips of a standalone rope op (profiled ~142 ms/synth).

    The full-K rotation is hoisted into a VMEM scratch written once per
    (batch*head) at iq == 0 — without it every q-block cell re-rotated the
    whole (n, dh) K (13 redundant rotations per head at n=1664/block_q=128,
    ~1 ms/layer of pure VPU waste at Base training shapes). sm_scale is folded
    into the small q tile (exact for power-of-two scales, i.e. dh=64)."""
    bh = pl.program_id(0)
    h_idx = bh % heads
    use_rope = h_idx < rope_heads

    @pl.when(pl.program_id(1) == 0)
    def _rotate_k():
        kf = k_ref[0].astype(jnp.float32)  # (n, dh)
        kr = kf * cos_k_ref[...] + _rot_half(kf) * sin_k_ref[...]
        krot_ref[...] = jnp.where(use_rope, kr, kf).astype(krot_ref.dtype)

    q = q_ref[0].astype(jnp.float32)  # (block_q, dh)
    v = v_ref[0]

    qr = q * cos_q_ref[...] + _rot_half(q) * sin_q_ref[...]
    q = (jnp.where(use_rope, qr, q) * sm_scale).astype(v.dtype)
    k = krot_ref[...]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    kv_len = kv_len_ref[bh // heads]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    # normalize AFTER p@v (see header): one (block_q, dh) divide instead of
    # (block_q, n) — the VPU softmax passes dominate this kernel's time
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "rope_heads", "interpret"))
def mha_fullkv_rope(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    kv_lens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                    rope_heads: int, block_q: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """Like mha_fullkv, with half-split rotary fused in.

    cos/sin: (N, dh) fp32 half-split tables; rope applies to the first
    `rope_heads` heads (pe_attn_head semantics; pass heads for all).
    """
    b, n, h, dh = q.shape
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)

    out = pl.pallas_call(
        functools.partial(_attn_rope_kernel, sm_scale=sm_scale, heads=h,
                          rope_heads=rope_heads, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0)),
                pl.BlockSpec((block_q, dh), lambda bh, iq, s_: (iq, 0)),
                pl.BlockSpec((block_q, dh), lambda bh, iq, s_: (iq, 0)),
                pl.BlockSpec((n, dh), lambda bh, iq, s_: (0, 0)),
                pl.BlockSpec((n, dh), lambda bh, iq, s_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0)),
            scratch_shapes=[pltpu.VMEM((n, dh), q.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # iq must run in grid order: the rotated-K scratch is written at
            # iq == 0 and read by the later q-blocks of the same head
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), to_bh(q), to_bh(k), to_bh(v),
      cos.astype(jnp.float32), sin.astype(jnp.float32),
      cos.astype(jnp.float32), sin.astype(jnp.float32))

    return jnp.transpose(out.reshape(b, h, n, dh), (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# packed-heads variants: all heads of one batch row per grid cell.
#
# The per-(batch*head) kernels above need q/k/v transposed to (b*h, n, dh) —
# at Base training shapes (b32 n1664 h16 dh64) those relayouts plus the fp32
# dK/dV converts cost ~130 ms of a 1.65 s step (round-5 trace: eleven
# (32,1664,16,64) copies at ~6.5 ms each + two 22 ms converts). The packed
# kernels instead take the arrays exactly as the qkv projection produces
# them — (b, n, h*dh), a FREE reshape — and slice heads on the lane dim
# inside VMEM (static 64-lane slices, a cheap relayout). Zero HBM-level
# transposes in either direction; bf16 outputs everywhere.
#
# MXU work per head is identical (the dh=64 contraction cap is unchanged);
# this is purely a memory-system win. VMEM: the whole row's K/V/Krot plus
# fp32 dK/dV accumulators live per cell (~43 MB at Base bwd with bq=416),
# hence the explicit vmem_limit_bytes — v5e/v6e have 128 MB.
# ---------------------------------------------------------------------------


def _packed_rope_kernel(kv_len_ref, q_ref, k_ref, v_ref, cos_q_ref, sin_q_ref,
                        cos_k_ref, sin_k_ref, o_ref, krot_ref, *,
                        sm_scale: float, heads: int, dh: int, rope_heads: int,
                        iq_axis: int = 1):
    """One (batch, q-block) cell: softmax(q_h K_h^T) V_h for ALL heads h.

    Head slices are static lane slices of the (rows, heads*dh) VMEM tiles;
    rope gating per head is a *Python* conditional (head index is static in
    the unrolled loop), so non-rope heads pay zero where-penalty.

    The head-chunked variant (mha_chunked_rope) reuses this body with
    heads=head_chunk and a 3D (batch, head-chunk, q-block) grid (iq_axis=2)."""
    ib = pl.program_id(0)
    iq = pl.program_id(iq_axis)
    kv_len = kv_len_ref[ib]
    dtype = q_ref.dtype

    cos_k, sin_k = cos_k_ref[...], sin_k_ref[...]

    @pl.when(iq == 0)
    def _rotate_k():
        kf = k_ref[0].astype(jnp.float32)           # (n, heads*dh)
        cols = []
        for h in range(heads):
            kh = kf[:, h * dh:(h + 1) * dh]
            cols.append(kh * cos_k + _rot_half(kh) * sin_k
                        if h < rope_heads else kh)
        krot_ref[...] = jnp.concatenate(cols, axis=-1).astype(dtype)

    qf = q_ref[0].astype(jnp.float32)               # (block_q, heads*dh)
    v = v_ref[0]                                    # (n, heads*dh)
    cos_q, sin_q = cos_q_ref[...], sin_q_ref[...]

    outs = []
    col = None
    for h in range(heads):
        qh = qf[:, h * dh:(h + 1) * dh]
        if h < rope_heads:
            qh = qh * cos_q + _rot_half(qh) * sin_q
        qh = (qh * sm_scale).astype(dtype)
        kh = krot_ref[:, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (block_q, n)
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(dtype), v[:, h * dh:(h + 1) * dh],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)
        outs.append(o)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(dtype)


@functools.partial(jax.jit, static_argnames=("rope_heads", "block_q", "interpret"))
def mha_packed_rope(q, k, v, kv_lens, cos, sin, rope_heads: int,
                    block_q: int = 512, interpret: bool = False):
    """Packed-heads fused rope+attention. Same contract as mha_fullkv_rope
    ((B, N, H, dh) in and out) but with zero HBM transposes: the (B, N, H*dh)
    view is a free reshape on both sides."""
    b, n, h, dh = q.shape
    hd = h * dh
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    spec_q = pl.BlockSpec((1, block_q, hd), lambda ib, iq, s_: (ib, iq, 0))
    spec_full = pl.BlockSpec((1, n, hd), lambda ib, iq, s_: (ib, 0, 0))
    rope_q = pl.BlockSpec((block_q, dh), lambda ib, iq, s_: (iq, 0))
    rope_k = pl.BlockSpec((n, dh), lambda ib, iq, s_: (0, 0))
    out = pl.pallas_call(
        functools.partial(_packed_rope_kernel, sm_scale=sm_scale, heads=h,
                          dh=dh, rope_heads=rope_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n // block_q),
            in_specs=[spec_q, spec_full, spec_full,
                      rope_q, rope_q, rope_k, rope_k],
            out_specs=spec_q,
            scratch_shapes=[pltpu.VMEM((n, hd), q.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q.reshape(b, n, hd), k.reshape(b, n, hd),
      v.reshape(b, n, hd), cos.astype(jnp.float32), sin.astype(jnp.float32),
      cos.astype(jnp.float32), sin.astype(jnp.float32))
    return out.reshape(b, n, h, dh)


def _packed_rope_bwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref,
                            cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,
                            dq_ref, dk_ref, dv_ref, krot_ref, dk_acc, dv_acc,
                            *, sm_scale: float, heads: int, dh: int,
                            rope_heads: int, iq_axis: int = 1):
    """Packed-heads attention backward: one (batch, q-block) cell recomputes
    softmax and forms dQ/dK/dV for all heads. dK/dV accumulate in fp32 VMEM
    scratch over the sequential q-block dim; the rope adjoint applies once at
    the last q-block and everything flushes to bf16 outputs.

    The head-chunked variant (mha_chunked_rope_bwd) reuses this body with
    heads=head_chunk and a 3D (batch, head-chunk, q-block) grid (iq_axis=2)."""
    ib = pl.program_id(0)
    iq = pl.program_id(iq_axis)
    kv_len = kv_len_ref[ib]
    dtype = q_ref.dtype

    cos_k, sin_k = cos_k_ref[...], sin_k_ref[...]

    @pl.when(iq == 0)
    def _rotate_k():
        kf = k_ref[0].astype(jnp.float32)
        cols = []
        for h in range(heads):
            kh = kf[:, h * dh:(h + 1) * dh]
            cols.append(kh * cos_k + _rot_half(kh) * sin_k
                        if h < rope_heads else kh)
        krot_ref[...] = jnp.concatenate(cols, axis=-1).astype(dtype)

    qf = q_ref[0].astype(jnp.float32)
    v = v_ref[0]
    do = do_ref[0]
    cos_q, sin_q = cos_q_ref[...], sin_q_ref[...]

    dqs, dks, dvs = [], [], []
    col = None
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = qf[:, sl]
        if h < rope_heads:
            qh = qh * cos_q + _rot_half(qh) * sin_q
        qh = (qh * sm_scale).astype(dtype)          # q' = sm_scale * q_rot
        kh = krot_ref[:, sl]
        doh = do[:, sl]

        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        pt = jnp.exp(s - m)                         # unnormalized p~
        linv = 1.0 / jnp.maximum(jnp.sum(pt, axis=-1, keepdims=True), 1e-30)

        dp = jax.lax.dot_general(
            doh, v[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = linv * jnp.sum(pt * dp, axis=-1, keepdims=True)
        ds = (pt * (dp - delta) * linv).astype(dtype)
        pb = pt.astype(dtype)
        dol = (doh.astype(jnp.float32) * linv).astype(dtype)

        dqr = jax.lax.dot_general(
            ds, kh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        if h < rope_heads:
            dqr = dqr * cos_q - _rot_half(dqr * sin_q)
        dqs.append(dqr)
        dks.append(jax.lax.dot_general(
            ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                                          # rotated frame; adjoint at flush
        dvs.append(jax.lax.dot_general(
            pb, dol, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dtype)
    dk_c = jnp.concatenate(dks, axis=-1)
    dv_c = jnp.concatenate(dvs, axis=-1)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = dk_c
        dv_acc[...] = dv_c

    @pl.when(iq > 0)
    def _accum():
        dk_acc[...] += dk_c
        dv_acc[...] += dv_c

    @pl.when(iq == pl.num_programs(iq_axis) - 1)
    def _flush():
        acc = dk_acc[...]
        cols = []
        for h in range(heads):
            ah = acc[:, h * dh:(h + 1) * dh]
            cols.append(ah * cos_k - _rot_half(ah * sin_k)
                        if h < rope_heads else ah)
        dk_ref[0] = jnp.concatenate(cols, axis=-1).astype(dtype)
        dv_ref[0] = dv_acc[...].astype(dtype)


@functools.partial(jax.jit, static_argnames=("rope_heads", "block_q", "interpret"))
def mha_packed_rope_bwd(q, k, v, kv_lens, cos, sin, g, rope_heads: int,
                        block_q: int = 256, interpret: bool = False):
    """Packed-heads backward of mha_packed_rope: (dq, dk, dv), (B, N, H, dh),
    zero HBM transposes and bf16 outputs."""
    b, n, h, dh = q.shape
    hd = h * dh
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    spec_q = pl.BlockSpec((1, block_q, hd), lambda ib, iq, s_: (ib, iq, 0))
    spec_full = pl.BlockSpec((1, n, hd), lambda ib, iq, s_: (ib, 0, 0))
    rope_q = pl.BlockSpec((block_q, dh), lambda ib, iq, s_: (iq, 0))
    rope_k = pl.BlockSpec((n, dh), lambda ib, iq, s_: (0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_rope_bwd_kernel, sm_scale=sm_scale, heads=h,
                          dh=dh, rope_heads=rope_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n // block_q),
            in_specs=[spec_q, spec_full, spec_full, spec_q,
                      rope_q, rope_q, rope_k, rope_k],
            out_specs=[spec_q, spec_full, spec_full],
            scratch_shapes=[pltpu.VMEM((n, hd), q.dtype),
                            pltpu.VMEM((n, hd), jnp.float32),
                            pltpu.VMEM((n, hd), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, n, hd), k.dtype),
            jax.ShapeDtypeStruct((b, n, hd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q.reshape(b, n, hd), k.reshape(b, n, hd),
      v.reshape(b, n, hd), g.reshape(b, n, hd),
      cos.astype(jnp.float32), sin.astype(jnp.float32),
      cos.astype(jnp.float32), sin.astype(jnp.float32))

    def unpack(x):
        return x.reshape(b, n, h, dh)

    return unpack(dq), unpack(dk), unpack(dv)


# ---------------------------------------------------------------------------
# Head-CHUNKED packed kernels: the middle ground between per-head (16 grid
# cells/batch, but ~80 ms/step of HBM (b,n,h,dh)<->(b,h,n,dh) transposes at
# Base train shape) and fully packed (zero transposes, but a 16-dot in-kernel
# head loop that schedules ~5% worse, measured end-to-end neutral). A chunk of
# `head_chunk` heads per grid cell keeps the operands in the projections'
# native (b, n, h*dh) layout — zero HBM transposes, the lane window is
# head_chunk*dh wide (128-multiple, the Mosaic constraint that rules out
# single-head dh=64 windows) — while the grid still exposes b*h/head_chunk
# parallel cells. Reuses the packed kernel bodies with heads=head_chunk.
# Restriction: rope all-or-none (rope_heads in {0, h}) — the chunk's rope
# gate must be static, and which chunk a cell handles is a runtime id.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("rope_heads", "head_chunk",
                                             "block_q", "interpret"))
def mha_chunked_rope(q, k, v, kv_lens, cos, sin, rope_heads: int,
                     head_chunk: int = 2, block_q: int = 512,
                     interpret: bool = False):
    """Head-chunked fused rope+attention. Same contract as mha_fullkv_rope
    ((B, N, H, dh) in/out); operands stay in the packed (B, N, H*dh) layout."""
    b, n, h, dh = q.shape
    hc = head_chunk
    assert rope_heads in (0, h), (rope_heads, h)
    assert h % hc == 0 and (hc * dh) % 128 == 0, (h, hc, dh)
    hd, cd = h * dh, hc * dh
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    spec_q = pl.BlockSpec((1, block_q, cd), lambda ib, ih, iq, s_: (ib, iq, ih))
    spec_full = pl.BlockSpec((1, n, cd), lambda ib, ih, iq, s_: (ib, 0, ih))
    rope_q = pl.BlockSpec((block_q, dh), lambda ib, ih, iq, s_: (iq, 0))
    rope_k = pl.BlockSpec((n, dh), lambda ib, ih, iq, s_: (0, 0))
    out = pl.pallas_call(
        functools.partial(_packed_rope_kernel, sm_scale=sm_scale, heads=hc,
                          dh=dh, rope_heads=(hc if rope_heads else 0),
                          iq_axis=2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hc, n // block_q),
            in_specs=[spec_q, spec_full, spec_full,
                      rope_q, rope_q, rope_k, rope_k],
            out_specs=spec_q,
            scratch_shapes=[pltpu.VMEM((n, cd), q.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q.reshape(b, n, hd), k.reshape(b, n, hd),
      v.reshape(b, n, hd), cos.astype(jnp.float32), sin.astype(jnp.float32),
      cos.astype(jnp.float32), sin.astype(jnp.float32))
    return out.reshape(b, n, h, dh)


@functools.partial(jax.jit, static_argnames=("rope_heads", "head_chunk",
                                             "block_q", "interpret"))
def mha_chunked_rope_bwd(q, k, v, kv_lens, cos, sin, g, rope_heads: int,
                         head_chunk: int = 2, block_q: int = 512,
                         interpret: bool = False):
    """Head-chunked backward of mha_chunked_rope: (dq, dk, dv), (B, N, H, dh),
    zero HBM transposes and bf16 outputs."""
    b, n, h, dh = q.shape
    hc = head_chunk
    assert rope_heads in (0, h), (rope_heads, h)
    assert h % hc == 0 and (hc * dh) % 128 == 0, (h, hc, dh)
    hd, cd = h * dh, hc * dh
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    spec_q = pl.BlockSpec((1, block_q, cd), lambda ib, ih, iq, s_: (ib, iq, ih))
    spec_full = pl.BlockSpec((1, n, cd), lambda ib, ih, iq, s_: (ib, 0, ih))
    rope_q = pl.BlockSpec((block_q, dh), lambda ib, ih, iq, s_: (iq, 0))
    rope_k = pl.BlockSpec((n, dh), lambda ib, ih, iq, s_: (0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_rope_bwd_kernel, sm_scale=sm_scale, heads=hc,
                          dh=dh, rope_heads=(hc if rope_heads else 0),
                          iq_axis=2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hc, n // block_q),
            in_specs=[spec_q, spec_full, spec_full, spec_q,
                      rope_q, rope_q, rope_k, rope_k],
            out_specs=[spec_q, spec_full, spec_full],
            scratch_shapes=[pltpu.VMEM((n, cd), q.dtype),
                            pltpu.VMEM((n, cd), jnp.float32),
                            pltpu.VMEM((n, cd), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, n, hd), k.dtype),
            jax.ShapeDtypeStruct((b, n, hd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q.reshape(b, n, hd), k.reshape(b, n, hd),
      v.reshape(b, n, hd), g.reshape(b, n, hd),
      cos.astype(jnp.float32), sin.astype(jnp.float32),
      cos.astype(jnp.float32), sin.astype(jnp.float32))

    def unpack(x):
        return x.reshape(b, n, h, dh)

    return unpack(dq), unpack(dk), unpack(dv)


def chunked_supported(q, rope_heads: int, head_chunk: int,
                      block_q: int = 512, bwd: bool = False) -> bool:
    """VMEM + shape gate for the head-chunked kernels."""
    b, n, h, dh = q.shape
    if (n % 128 or dh not in (64, 128) or head_chunk < 1 or h % head_chunk
            or (head_chunk * dh) % 128 or rope_heads not in (0, h)):
        return False
    cd = head_chunk * dh
    block_q = _fit_block_q(n, block_q)
    vmem = (3 * n * cd * 2              # K, V, Krot scratch bf16
            + 2 * block_q * n * 4       # s/p, dp fp32 transients
            + 4 * block_q * cd * 2)     # q, o/do blocks (double-buffered)
    if bwd:
        vmem += (2 * n * cd * 4         # dK/dV fp32 accumulators
                 + 2 * n * cd * 2       # dK/dV bf16 output blocks
                 + 2 * block_q * n * 4)  # ds + one more score-sized transient
    return vmem < 96 * 1024 * 1024


def _head_chunk() -> int:
    """Head-chunked dispatch knob: F5E_ATTN_HEAD_CHUNK=<int>, 0 = per-head.

    Default 4 — the round-5 on-chip sweep at Base shapes: train step 1.381 vs
    1.496 s/update per-head (30.7% vs 28.3% MFU), sampler RTF 0.0353 vs
    0.0369-0.0375 bracketing runs, numerics bitwise-equal. hc=2/8 are worse
    (1.445 at 8); unsupported shapes (partial rope, h % hc, 64-lane windows)
    fall back to per-head automatically via chunked_supported()."""
    import os

    return int(os.environ.get("F5E_ATTN_HEAD_CHUNK", "4"))


def packed_supported(q, rope: bool = True, block_q: int = 256,
                     bwd: bool = False) -> bool:
    """VMEM gate for the packed-heads kernels: the whole row's K/V/Krot (and
    in the backward, fp32 dK/dV accumulators) live in one cell."""
    b, n, h, dh = q.shape
    if n % 128 or dh not in (64, 128):
        return False
    hd = h * dh
    block_q = _fit_block_q(n, block_q)
    vmem = (3 * n * hd * 2              # K, V, Krot scratch bf16
            + 2 * block_q * n * 4       # s/p, dp fp32 transients
            + 4 * block_q * hd * 2)     # q, o/do blocks (double-buffered)
    if bwd:
        vmem += (2 * n * hd * 4         # dK/dV fp32 accumulators
                 + 2 * n * hd * 2       # dK/dV bf16 output blocks
                 + 2 * block_q * n * 4)  # ds + one more score-sized transient
    if rope:
        vmem += 2 * (n + block_q) * dh * 4
    return vmem < 96 * 1024 * 1024


def _use_packed() -> bool:
    """Packed-heads dispatch toggle: F5E_ATTN_PACKED=1 enables (still behind
    the VMEM gate), unset/0 = off. Round-5 on-chip verdict: bitwise-equal to
    the per-head kernels, but END-TO-END NEUTRAL — the Base b32x1664 train
    step measured 1.530 s/update packed vs 1.521 per-head (tie inside run
    noise), and isolated kernels were ~4-7% slower (the 16-dot in-kernel
    head loop schedules worse than 16 grid cells, offsetting the transpose
    savings). Default stays per-head; the knob remains for future shapes
    (more heads / larger dh) where the transpose share is bigger."""
    import os

    return os.environ.get("F5E_ATTN_PACKED", "0") == "1"


def _attn_bwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                     *, sm_scale: float, heads: int):
    """One (batch*head, q-block) cell of the attention backward.

    Recomputes p = softmax(q K^T) for the block, then
      dV += p^T dO;  dP = dO V^T;  dS = p ∘ (dP − rowsum(p ∘ dP)) · scale;
      dQ = dS K;     dK += dS^T q.
    dK/dV accumulate in fp32 VMEM *scratch* across the (sequential) q-block
    dim and are written ONCE to bf16 output refs at the last q-block — the
    HBM flush and the downstream convert run at half the fp32-output cost
    (round-5 trace: the two fp32->bf16 converts alone were 44 ms/step at
    Base b32). Masked-out key columns have p = dS = 0 so they contribute
    nothing.
    """
    iq = pl.program_id(1)
    bh = pl.program_id(0)
    kv_len = kv_len_ref[bh // heads]

    # sm_scale folds into the small q tile: with q' = sm_scale*q the chain
    # rule gives dk = dS^T q' directly, and dq = (dS k) * sm_scale post-scaled
    # on the small dq tile — no (bq, n)-sized scale pass.
    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0]                     # (n, dh)
    v = v_ref[0]                     # (n, dh)
    do = do_ref[0]                   # (bq, dh)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                # (bq, n) fp32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    pt = jnp.exp(s - m)              # unnormalized p~; p = p~ / l
    linv = 1.0 / jnp.maximum(jnp.sum(pt, axis=-1, keepdims=True), 1e-30)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                # (bq, n) fp32
    # delta = rowsum(p ∘ dp) = linv * rowsum(p~ ∘ dp); the explicit p = p~/l
    # divide pass over (bq, n) is gone — 1/l folds into the row-broadcast
    # factors of the single fused dS pass and the small dO tile below.
    delta = linv * jnp.sum(pt * dp, axis=-1, keepdims=True)
    ds = (pt * (dp - delta) * linv).astype(q.dtype)
    pb = pt.astype(q.dtype)
    dol = (do.astype(jnp.float32) * linv).astype(do.dtype)

    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_c = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                # (n, dh) fp32
    # dv = p^T dO = (p~ linv)^T dO = p~^T (dO ∘ linv): row-scale the small
    # (bq, dh) dO tile instead of the (bq, n) score tile
    dv_c = jax.lax.dot_general(
        pb, dol, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = dk_c
        dv_acc[...] = dv_c

    @pl.when(iq > 0)
    def _accum():
        dk_acc[...] += dk_c
        dv_acc[...] += dv_c

    @pl.when(iq == pl.num_programs(1) - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def mha_fullkv_bwd(q, k, v, kv_lens, g, block_q: int = 128,
                   interpret: bool = False):
    """Pallas backward of mha_fullkv: returns (dq, dk, dv), (B, N, H, dh)."""
    b, n, h, dh = q.shape
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)

    grid = (b * h, n // block_q)
    bh_spec_q = pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0))
    bh_spec_full = pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, sm_scale=sm_scale, heads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[bh_spec_q, bh_spec_full, bh_spec_full, bh_spec_q],
            out_specs=[bh_spec_q, bh_spec_full, bh_spec_full],
            scratch_shapes=[pltpu.VMEM((n, dh), jnp.float32),
                            pltpu.VMEM((n, dh), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, dh), k.dtype),
            jax.ShapeDtypeStruct((b * h, n, dh), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # same lift as the rope bwd: block_q > 512 exceeds the 16 MB
            # default scoped-vmem cap; bwd_supported() is the real gate
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), to_bh(q), to_bh(k), to_bh(v), to_bh(g))

    def from_bh(x, dtype):
        return jnp.transpose(x.reshape(b, h, n, dh), (0, 2, 1, 3)).astype(dtype)

    return from_bh(dq, q.dtype), from_bh(dk, k.dtype), from_bh(dv, v.dtype)


def _attn_bwd_rope_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref,
                          cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,
                          dq_ref, dk_ref, dv_ref, krot_ref, dk_acc, dv_acc,
                          *, sm_scale: float, heads: int, rope_heads: int):
    """Backward with rope fused: rotate q/k on entry (same as the fwd kernel),
    run the standard backward on rotated tensors, then pull dq/dk back through
    the rotation adjoint: f(x) = cos∘x + sin∘rot_half(x) has
    f^T(g) = cos∘g − rot_half(sin∘g).

    Same VPU-economy moves as the fwd kernel: the full-K rotation is hoisted
    into scratch (written once per head at iq == 0), sm_scale folds into the
    small q tile (dk = dS^T q' is then directly correct; dq post-scales), the
    explicit p-normalize pass is replaced by folding 1/l into the dS pass and
    the small dO tile, and the dK rope adjoint is applied ONCE to the fp32
    accumulator at the last q-block instead of per cell."""
    iq = pl.program_id(1)
    bh = pl.program_id(0)
    h_idx = bh % heads
    kv_len = kv_len_ref[bh // heads]
    use_rope = h_idx < rope_heads
    dtype = q_ref.dtype

    cos_q, sin_q = cos_q_ref[...], sin_q_ref[...]

    @pl.when(iq == 0)
    def _rotate_k():
        kf = k_ref[0].astype(jnp.float32)
        kr = kf * cos_k_ref[...] + _rot_half(kf) * sin_k_ref[...]
        krot_ref[...] = jnp.where(use_rope, kr, kf).astype(krot_ref.dtype)

    qf = q_ref[0].astype(jnp.float32)
    qr = jnp.where(use_rope, qf * cos_q + _rot_half(qf) * sin_q, qf)
    q = (qr * sm_scale).astype(dtype)
    k = krot_ref[...]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    pt = jnp.exp(s - m)              # unnormalized p~; p = p~ / l
    linv = 1.0 / jnp.maximum(jnp.sum(pt, axis=-1, keepdims=True), 1e-30)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = linv * jnp.sum(pt * dp, axis=-1, keepdims=True)
    ds = (pt * (dp - delta) * linv).astype(dtype)
    pb = pt.astype(dtype)
    dol = (do.astype(jnp.float32) * linv).astype(do.dtype)

    dqr = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    dkr = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_c = jax.lax.dot_general(
        pb, dol, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dq = jnp.where(use_rope, dqr * cos_q - _rot_half(dqr * sin_q), dqr)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = dkr        # rotated-frame accumulation; adjoint below
        dv_acc[...] = dv_c

    @pl.when(iq > 0)
    def _accum():
        dk_acc[...] += dkr
        dv_acc[...] += dv_c

    @pl.when(iq == pl.num_programs(1) - 1)
    def _flush():
        acc = dk_acc[...]
        cos_k, sin_k = cos_k_ref[...], sin_k_ref[...]
        adj = jnp.where(use_rope, acc * cos_k - _rot_half(acc * sin_k), acc)
        dk_ref[0] = adj.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rope_heads", "block_q", "interpret"))
def mha_fullkv_rope_bwd(q, k, v, kv_lens, cos, sin, g, rope_heads: int,
                        block_q: int = 128, interpret: bool = False):
    """Pallas backward of mha_fullkv_rope: returns (dq, dk, dv)."""
    b, n, h, dh = q.shape
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)

    bh_spec_q = pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0))
    bh_spec_full = pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0))
    rope_q = pl.BlockSpec((block_q, dh), lambda bh, iq, s_: (iq, 0))
    rope_k = pl.BlockSpec((n, dh), lambda bh, iq, s_: (0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_rope_kernel, sm_scale=sm_scale, heads=h,
                          rope_heads=rope_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[bh_spec_q, bh_spec_full, bh_spec_full, bh_spec_q,
                      rope_q, rope_q, rope_k, rope_k],
            out_specs=[bh_spec_q, bh_spec_full, bh_spec_full],
            scratch_shapes=[pltpu.VMEM((n, dh), q.dtype),
                            pltpu.VMEM((n, dh), jnp.float32),
                            pltpu.VMEM((n, dh), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, dh), k.dtype),
            jax.ShapeDtypeStruct((b * h, n, dh), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # block_q > 512 puts the three (block_q, n) fp32 score tiles past
            # the 16 MB default scoped-vmem budget; bwd_supported() is the
            # real gate, so lift the compiler cap to the hardware's ballpark
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), to_bh(q), to_bh(k), to_bh(v), to_bh(g),
      cos.astype(jnp.float32), sin.astype(jnp.float32),
      cos.astype(jnp.float32), sin.astype(jnp.float32))

    def from_bh(x, dtype):
        return jnp.transpose(x.reshape(b, h, n, dh), (0, 2, 1, 3)).astype(dtype)

    return from_bh(dq, q.dtype), from_bh(dk, k.dtype), from_bh(dv, v.dtype)


def bwd_supported(q: jnp.ndarray, k: jnp.ndarray, block_q: int = 128,
                  rope: bool = False) -> bool:
    """VMEM gate for the Pallas backward (three fp32 score-sized buffers +
    fp32 dK/dV accumulators live alongside K/V)."""
    b, n, h, dh = q.shape
    if k.shape != q.shape or n % 128 or dh not in (64, 128):
        return False
    block_q = _fit_block_q(n, block_q)
    vmem = (2 * n * dh * 2            # K, V bf16
            + 3 * block_q * n * 4     # s/p, dp, ds fp32
            + 2 * n * dh * 4          # dK, dV fp32 scratch accumulators
            + 2 * n * dh * 2          # dK, dV bf16 output blocks
            + 3 * block_q * dh * 4)   # q, dO, dq
    if rope:
        vmem += 2 * (n + block_q) * dh * 4 + n * dh * 2  # cos/sin + K scratch
    return vmem < 24 * 1024 * 1024


_BWD_HEAD_CHUNK = 4  # bounds the (B, Hc, N, N) fp32 score tensors in the bwd


def _reference_attn(q, k, v, kv_lens):
    mask = jnp.arange(k.shape[1])[None, :] < kv_lens[:, None]
    return jax.nn.dot_product_attention(q, k, v, mask=mask[:, None, None, :])


def _reference_rope_attn(q, k, v, kv_lens, cos, sin, rope_heads):
    """Pure-XLA attention with per-head rope gating (matches the kernel)."""
    from f5e_tts_tpu.ops.rope import apply_rotary_half

    h = q.shape[2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    flag = (jnp.arange(h) < rope_heads)[None, None, :, None]
    qr = jnp.where(flag, apply_rotary_half(q, c, s), q)
    kr = jnp.where(flag, apply_rotary_half(k, c, s), k)
    return _reference_attn(qr, kr, v, kv_lens)


def _chunked_attn_bwd(ref_fn, q, k, v, g):
    """Backward of ref_fn(q, k, v) chunked over the (independent) head axis,
    bounding the fp32 score materialization to _BWD_HEAD_CHUNK heads at a time.
    All tensors (B, N, H, dh); g is the output cotangent."""
    h = q.shape[2]
    chunk = max(1, min(h, _BWD_HEAD_CHUNK))
    if h % chunk:
        chunk = 1

    def split(x):
        b, n, _, dh = x.shape
        return jnp.moveaxis(x.reshape(b, n, h // chunk, chunk, dh), 2, 0)

    def one(args):
        qc, kc, vc, gc = args
        _, vjp = jax.vjp(ref_fn, qc, kc, vc)
        return vjp(gc)

    dq, dk, dv = jax.lax.map(one, (split(q), split(k), split(v), split(g)))

    def merge(x):
        b, n = x.shape[1], x.shape[2]
        return jnp.moveaxis(x, 0, 2).reshape(b, n, h, -1)

    return merge(dq), merge(dk), merge(dv)


@jax.custom_vjp
def mha_fullkv_ad(q, k, v, kv_lens):
    return mha_fullkv(q, k, v, kv_lens)


def _fullkv_fwd(q, k, v, kv_lens):
    return mha_fullkv(q, k, v, kv_lens), (q, k, v, kv_lens)


def _bwd_block_q(q, k, rope: bool):
    """Largest VMEM-fitting backward block request. The 512 request fits to
    the largest <=512 divisor of n (416 at n=1664 — round-5 on-chip sweep;
    the earlier 256-request fit of 208 measured ~10% faster than block 128:
    6.50 -> 5.87 ms/layer); falls back down the ladder for long buckets
    where the three (block_q, n) fp32 buffers won't fit. Override with
    F5E_ATTN_BWD_BLOCK=<int> for sweeps. Returns None (-> chunked XLA
    fallback) off-TPU: Mosaic kernels only compile for the TPU backend."""
    if jax.default_backend() != "tpu":
        return None
    import os

    env = os.environ.get("F5E_ATTN_BWD_BLOCK")
    ladder = (int(env),) if env else (512, 256, 128)
    for bq in ladder:
        if bwd_supported(q, k, block_q=bq, rope=rope):
            return bq
    return None


def _fullkv_bwd(res, g):
    q, k, v, kv_lens = res
    bq = _bwd_block_q(q, k, rope=False)
    if bq is not None:
        dq, dk, dv = mha_fullkv_bwd(q, k, v, kv_lens, g, block_q=bq)
    else:
        dq, dk, dv = _chunked_attn_bwd(
            lambda q_, k_, v_: _reference_attn(q_, k_, v_, kv_lens), q, k, v, g)
    return dq, dk, dv, None


mha_fullkv_ad.defvjp(_fullkv_fwd, _fullkv_bwd)


def _fwd_block_q() -> int:
    """Forward block request (fits down via _fit_block_q). 512 measured best
    at sampler shapes; override with F5E_ATTN_FWD_BLOCK=<int> for sweeps."""
    import os

    return int(os.environ.get("F5E_ATTN_FWD_BLOCK", "512"))


def _rope_primal(q, k, v, kv_lens, cos, sin, rope_heads):
    """Fused rope+attention forward: head-chunked (no HBM transposes, see the
    chunked section) when enabled and supported, else packed-heads when
    enabled, else per-(batch*head)."""
    bq = _fwd_block_q()
    hc = _head_chunk()
    if (hc and jax.default_backend() == "tpu"
            and chunked_supported(q, rope_heads, hc, block_q=bq)):
        return mha_chunked_rope(q, k, v, kv_lens, cos, sin, rope_heads,
                                head_chunk=hc, block_q=bq)
    if (_use_packed() and jax.default_backend() == "tpu"
            and packed_supported(q, block_q=bq)):
        return mha_packed_rope(q, k, v, kv_lens, cos, sin, rope_heads,
                               block_q=bq)
    return mha_fullkv_rope(q, k, v, kv_lens, cos, sin, rope_heads, block_q=bq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def mha_fullkv_rope_ad(q, k, v, kv_lens, cos, sin, rope_heads):
    return _rope_primal(q, k, v, kv_lens, cos, sin, rope_heads)


def _rope_fwd(q, k, v, kv_lens, cos, sin, rope_heads):
    return (_rope_primal(q, k, v, kv_lens, cos, sin, rope_heads),
            (q, k, v, kv_lens, cos, sin))


def _rope_bwd(rope_heads, res, g):
    q, k, v, kv_lens, cos, sin = res
    hc = _head_chunk()
    if hc and jax.default_backend() == "tpu":
        import os

        bq = int(os.environ.get("F5E_ATTN_BWD_BLOCK", "512"))
        if chunked_supported(q, rope_heads, hc, block_q=bq, bwd=True):
            dq, dk, dv = mha_chunked_rope_bwd(q, k, v, kv_lens, cos, sin, g,
                                              rope_heads, head_chunk=hc,
                                              block_q=bq)
            return dq, dk, dv, None, None, None
    if _use_packed() and jax.default_backend() == "tpu":
        import os

        bq = int(os.environ.get("F5E_ATTN_BWD_BLOCK", "256"))
        if packed_supported(q, bwd=True, block_q=bq):
            dq, dk, dv = mha_packed_rope_bwd(q, k, v, kv_lens, cos, sin, g,
                                             rope_heads, block_q=bq)
            return dq, dk, dv, None, None, None
    bq = _bwd_block_q(q, k, rope=True)
    if bq is not None:
        dq, dk, dv = mha_fullkv_rope_bwd(q, k, v, kv_lens, cos, sin, g,
                                         rope_heads, block_q=bq)
        return dq, dk, dv, None, None, None
    h = q.shape[2]
    chunk = max(1, min(h, _BWD_HEAD_CHUNK))
    if h % chunk:
        chunk = 1
    # per-chunk rope flags depend on absolute head indices — fold them into a
    # per-head boolean array sliced alongside the tensors
    flags = jnp.arange(h) < rope_heads

    def split(x):
        b, n, _, dh = x.shape
        return jnp.moveaxis(x.reshape(b, n, h // chunk, chunk, dh), 2, 0)

    from f5e_tts_tpu.ops.rope import apply_rotary_half

    def one(args):
        qc, kc, vc, gc, fc = args

        def ref(qc, kc, vc):
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            fl = fc[None, None, :, None]
            qr = jnp.where(fl, apply_rotary_half(qc, c, s), qc)
            kr = jnp.where(fl, apply_rotary_half(kc, c, s), kc)
            return _reference_attn(qr, kr, vc, kv_lens)

        _, vjp = jax.vjp(ref, qc, kc, vc)
        return vjp(gc)

    dq, dk, dv = jax.lax.map(one, (split(q), split(k), split(v), split(g),
                                   flags.reshape(h // chunk, chunk)))

    def merge(x):
        b, n = x.shape[1], x.shape[2]
        return jnp.moveaxis(x, 0, 2).reshape(b, n, h, -1)

    return merge(dq), merge(dk), merge(dv), None, None, None


mha_fullkv_rope_ad.defvjp(_rope_fwd, _rope_bwd)


def _attn_joint_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *,
                       sm_scale: float, heads: int, n_audio: int):
    """Joint (MMDiT) attention cell: keys are [audio | text] where audio
    validity is a length prefix and the text tail is always valid — the
    non-prefix mask that keeps joint_attention off the plain kv_lens kernel
    (round-1 advisor high). Column validity: col < audio_len OR col >= n_audio."""
    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    audio_len = lens_ref[pl.program_id(0) // heads]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (col < audio_len) | (col >= n_audio)
    s = jnp.where(valid, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    # normalize AFTER p@v (see header): one (block_q, dh) divide instead of
    # (block_q, n) — the VPU softmax passes dominate this kernel's time
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_audio", "block_q", "interpret"))
def mha_fullkv_joint(q, k, v, audio_lens, n_audio: int, block_q: int = 256,
                     interpret: bool = False):
    """(B, N, H, dh) joint attention over [audio | text] keys: audio columns
    masked beyond audio_lens (B,), text columns (>= n_audio) always valid."""
    b, n, h, dh = q.shape
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)

    out = pl.pallas_call(
        functools.partial(_attn_joint_kernel, sm_scale=sm_scale, heads=h,
                          n_audio=n_audio),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(audio_lens.astype(jnp.int32), to_bh(q), to_bh(k), to_bh(v))

    return jnp.transpose(out.reshape(b, h, n, dh), (0, 2, 1, 3))


def _attn_joint_bwd_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref,
                           dq_ref, dk_ref, dv_ref, *, sm_scale: float,
                           heads: int, n_audio: int):
    """Joint-mask backward cell: same divide-free structure as
    _attn_bwd_kernel with the MMDiT column validity
    (col < audio_len OR col >= n_audio) in place of the prefix mask."""
    iq = pl.program_id(1)
    bh = pl.program_id(0)
    audio_len = lens_ref[bh // heads]

    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (col < audio_len) | (col >= n_audio)
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    pt = jnp.exp(s - m)
    linv = 1.0 / jnp.maximum(jnp.sum(pt, axis=-1, keepdims=True), 1e-30)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = linv * jnp.sum(pt * dp, axis=-1, keepdims=True)
    ds = (pt * (dp - delta) * linv).astype(q.dtype)
    pb = pt.astype(q.dtype)
    dol = (do.astype(jnp.float32) * linv).astype(do.dtype)

    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_c = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_c = jax.lax.dot_general(
        pb, dol, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == 0)
    def _init():
        dk_ref[0] = dk_c
        dv_ref[0] = dv_c

    @pl.when(iq > 0)
    def _accum():
        dk_ref[0] += dk_c
        dv_ref[0] += dv_c


@functools.partial(jax.jit, static_argnames=("n_audio", "block_q", "interpret"))
def mha_fullkv_joint_bwd(q, k, v, audio_lens, g, n_audio: int,
                         block_q: int = 128, interpret: bool = False):
    """Pallas backward of mha_fullkv_joint: returns (dq, dk, dv)."""
    b, n, h, dh = q.shape
    block_q = _fit_block_q(n, block_q)
    assert n % block_q == 0, (n, block_q)
    sm_scale = 1.0 / math.sqrt(dh)

    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)

    bh_spec_q = pl.BlockSpec((1, block_q, dh), lambda bh, iq, s_: (bh, iq, 0))
    bh_spec_full = pl.BlockSpec((1, n, dh), lambda bh, iq, s_: (bh, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_joint_bwd_kernel, sm_scale=sm_scale, heads=h,
                          n_audio=n_audio),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[bh_spec_q, bh_spec_full, bh_spec_full, bh_spec_q],
            out_specs=[bh_spec_q, bh_spec_full, bh_spec_full],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, dh), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(audio_lens.astype(jnp.int32), to_bh(q), to_bh(k), to_bh(v), to_bh(g))

    def from_bh(x, dtype):
        return jnp.transpose(x.reshape(b, h, n, dh), (0, 2, 1, 3)).astype(dtype)

    return from_bh(dq, q.dtype), from_bh(dk, k.dtype), from_bh(dv, v.dtype)


def _reference_joint_attn(q, k, v, audio_lens, n_audio: int):
    col = jnp.arange(k.shape[1])
    mask = (col[None, :] < audio_lens[:, None]) | (col >= n_audio)[None, :]
    return jax.nn.dot_product_attention(q, k, v, mask=mask[:, None, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def mha_fullkv_joint_ad(q, k, v, audio_lens, n_audio):
    return mha_fullkv_joint(q, k, v, audio_lens, n_audio)


def _joint_fwd(q, k, v, audio_lens, n_audio):
    return mha_fullkv_joint(q, k, v, audio_lens, n_audio), (q, k, v, audio_lens)


def _joint_bwd(n_audio, res, g):
    q, k, v, audio_lens = res
    bq = _bwd_block_q(q, k, rope=False)
    if bq is not None:
        dq, dk, dv = mha_fullkv_joint_bwd(q, k, v, audio_lens, g, n_audio,
                                          block_q=bq)
    else:
        dq, dk, dv = _chunked_attn_bwd(
            lambda q_, k_, v_: _reference_joint_attn(q_, k_, v_, audio_lens,
                                                     n_audio),
            q, k, v, g)
    return dq, dk, dv, None


mha_fullkv_joint_ad.defvjp(_joint_fwd, _joint_bwd)


def supported(q: jnp.ndarray, k: jnp.ndarray, block_q: int = 512,
              rope: bool = False) -> bool:
    """Shape gate: same q/kv length (a 128 multiple), dh in {64, 128},
    K+V+scores within a conservative VMEM budget. The kernels shrink block_q
    to the largest <=block_q multiple-of-16 divisor of n (_fit_block_q).

    rope=True accounts for the fused-rope kernel's extra residents: the
    fp32 cos/sin tables (2*(n+block_q)*dh*4) and the rotated-K scratch
    (n*dh*2). With them counted, the budget is 14 MB of the ~16 MB VMEM —
    the max-duration serving shape (n=4096, dh=64, rope) sums to ~12.6 MB
    and is verified compiling + numerically correct on chip; n=4096/dh=128
    with rope (~16.8 MB) correctly falls back to XLA."""
    b, n, h, dh = q.shape
    if k.shape != q.shape or n % 128 or dh not in (64, 128):
        return False
    block_q = _fit_block_q(n, block_q)
    vmem = n * dh * 2 * 2 + block_q * n * 4 + block_q * dh * 8
    if rope:
        vmem += 2 * (n + block_q) * dh * 4 + n * dh * 2
        return vmem < 14 * 1024 * 1024
    return vmem < 12 * 1024 * 1024
