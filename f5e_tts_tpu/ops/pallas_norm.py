"""Fused gated-residual + LayerNorm + AdaLN-modulation Pallas kernel.

Each DiT block does (modules.py:627-641):
    x = x + gate * branch_out
    norm = LayerNorm(x) * (1 + scale) + shift
twice per block. In XLA these lower to several HBM round-trips over the
(B, N, D) activation; this kernel computes both outputs in one pass over
VMEM-resident tiles (read x, y once; write new_x, modulated once).

Backward recomputes in XLA via custom_vjp (cheap: elementwise + row-stats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gated_adaln_kernel(x_ref, y_ref, gate_ref, scale_ref, shift_ref,
                        newx_ref, out_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (block_n, D)
    y = y_ref[0].astype(jnp.float32)
    g = gate_ref[0].astype(jnp.float32)  # (1, D) per-sample row
    new_x = x + g * y
    mean = jnp.mean(new_x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(new_x - mean), axis=-1, keepdims=True)
    norm = (new_x - mean) * jax.lax.rsqrt(var + eps)
    out = norm * (1.0 + scale_ref[0].astype(jnp.float32)) + shift_ref[0].astype(jnp.float32)
    newx_ref[0] = new_x.astype(newx_ref.dtype)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _gated_adaln_fwd_impl(x, y, gate, scale, shift, block_n: int = 256,
                          interpret: bool = False):
    b, n, d = x.shape
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)
    grid = (b, n // block_n)
    newx, out = pl.pallas_call(
        functools.partial(_gated_adaln_kernel, eps=1e-6),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, y, gate[:, None, :], scale[:, None, :], shift[:, None, :])
    return newx, out


def _reference_gated_adaln(x, y, gate, scale, shift):
    xf = x.astype(jnp.float32)
    new_x = xf + gate.astype(jnp.float32)[:, None, :] * y.astype(jnp.float32)
    mean = jnp.mean(new_x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(new_x - mean), axis=-1, keepdims=True)
    norm = (new_x - mean) * jax.lax.rsqrt(var + 1e-6)
    out = norm * (1.0 + scale.astype(jnp.float32)[:, None, :]) + shift.astype(jnp.float32)[:, None, :]
    return new_x.astype(x.dtype), out.astype(x.dtype)


@jax.custom_vjp
def gated_adaln(x, y, gate, scale, shift):
    """(new_x, modulated) = fused x + gate*y; LN; *(1+scale)+shift.

    x, y: (B, N, D); gate/scale/shift: (B, D). TPU: pallas kernel; elsewhere
    the XLA reference implementation.
    """
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    n = x.shape[1]
    # block_n must divide n exactly (the kernel asserts); training batches are
    # padded to multiples of 128, so 384/640/896-frame batches need block 128.
    block_n = 256 if n % 256 == 0 else 128
    if on_tpu and n % block_n == 0:
        return _gated_adaln_fwd_impl(x, y, gate, scale, shift, block_n=block_n)
    return _reference_gated_adaln(x, y, gate, scale, shift)


def _gated_adaln_fwd(x, y, gate, scale, shift):
    return gated_adaln(x, y, gate, scale, shift), (x, y, gate, scale, shift)


def _gated_adaln_bwd_kernel(x_ref, y_ref, gate_ref, scale_ref,
                            gnx_ref, gout_ref,
                            dx_ref, dy_ref, dgate_ref, dscale_ref, dshift_ref,
                            acc_g, acc_s, acc_sh, *, eps: float):
    """Fused VJP: one pass over the four (block_n, D) tiles.

    Recomputes row stats from x/y (they're read anyway), emits dx/dy in place
    and accumulates the (1, D) per-sample grads in fp32 VMEM scratch, flushed
    once per batch row (same pattern as the attention-bwd dK/dV flush).
    """
    ni = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)      # (block_n, D)
    y = y_ref[0].astype(jnp.float32)
    g = gate_ref[0].astype(jnp.float32)   # (1, D)
    s = scale_ref[0].astype(jnp.float32)
    gnx = gnx_ref[0].astype(jnp.float32)
    gout = gout_ref[0].astype(jnp.float32)

    new_x = x + g * y
    mean = jnp.mean(new_x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(new_x - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = (new_x - mean) * r

    dxh = gout * (1.0 + s)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dnx = r * (dxh - m1 - xhat * m2) + gnx
    dx_ref[0] = dnx.astype(dx_ref.dtype)
    dy_ref[0] = (dnx * g).astype(dy_ref.dtype)

    pg = jnp.sum(dnx * y, axis=0, keepdims=True)    # (1, D)
    ps = jnp.sum(gout * xhat, axis=0, keepdims=True)
    psh = jnp.sum(gout, axis=0, keepdims=True)

    @pl.when(ni == 0)
    def _init():
        acc_g[...] = pg
        acc_s[...] = ps
        acc_sh[...] = psh

    @pl.when(ni > 0)
    def _accum():
        acc_g[...] += pg
        acc_s[...] += ps
        acc_sh[...] += psh

    @pl.when(ni == pl.num_programs(1) - 1)
    def _flush():
        dgate_ref[0] = acc_g[...].astype(dgate_ref.dtype)
        dscale_ref[0] = acc_s[...].astype(dscale_ref.dtype)
        dshift_ref[0] = acc_sh[...].astype(dshift_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _gated_adaln_bwd_impl(x, y, gate, scale, g_newx, g_out,
                          block_n: int = 256, interpret: bool = False):
    b, n, d = x.shape
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)
    grid = (b, n // block_n)
    big = pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0))
    row = pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0))
    dx, dy, dgate, dscale, dshift = pl.pallas_call(
        functools.partial(_gated_adaln_bwd_kernel, eps=1e-6),
        grid=grid,
        in_specs=[big, big, row, row, big, big],
        out_specs=(big, big, row, row, row),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, d), y.dtype),
            jax.ShapeDtypeStruct((b, 1, d), gate.dtype),
            jax.ShapeDtypeStruct((b, 1, d), scale.dtype),
            jax.ShapeDtypeStruct((b, 1, d), scale.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32),
                        pltpu.VMEM((1, d), jnp.float32),
                        pltpu.VMEM((1, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, y, gate[:, None, :], scale[:, None, :], g_newx, g_out)
    return dx, dy, dgate[:, 0, :], dscale[:, 0, :], dshift[:, 0, :]


def _gated_adaln_bwd(res, gs):
    x, y, gate, scale, shift = res
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    n = x.shape[1]
    block_n = 256 if n % 256 == 0 else 128
    if on_tpu and n % block_n == 0:
        g_newx, g_out = gs
        dx, dy, dgate, dscale, dshift = _gated_adaln_bwd_impl(
            x, y, gate, scale, g_newx, g_out, block_n=block_n)
        return dx, dy, dgate, dscale, dshift
    _, vjp = jax.vjp(_reference_gated_adaln, x, y, gate, scale, shift)
    return vjp(gs)


gated_adaln.defvjp(_gated_adaln_fwd, _gated_adaln_bwd)
