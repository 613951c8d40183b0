"""Monotonic alignment search (MAS) as a jittable batched DP.

TPU-native replacement for the reference's numba CPU kernel
(reference: src/f5_tts/durpred/monotonic_align/core.py:14-46, wrapper
__init__.py:7-16). The reference round-trips GPU->CPU->numba->GPU per call; we
run the whole Viterbi-style DP + backtrack on-device as two `lax.scan`s over
rows, vectorized across the batch and the row dimension (each scan step is one
VPU sweep over (B, T_x)).

Convention (matches the reference wrapper): `value` is (B, T_y, T_x) with
y = dim 1 (e.g. PPG frames), x = dim 2 (e.g. text tokens); `t_ys`/`t_xs` are
per-sample valid lengths. The returned path is (B, T_y, T_x) one-hot per valid
row, monotonic non-decreasing in x, ending at (t_y-1, t_x-1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e9


@functools.partial(jax.jit, static_argnames=())
def maximum_path(value: jnp.ndarray, t_ys: jnp.ndarray, t_xs: jnp.ndarray) -> jnp.ndarray:
    """Batched monotonic maximum path.

    value: (B, T_y, T_x) float32 log-prob grid
    t_ys, t_xs: (B,) int32 valid lengths
    returns: (B, T_y, T_x) float32 {0,1} path
    """
    b, t_y, t_x = value.shape
    value = value.astype(jnp.float32)
    t_ys = t_ys.astype(jnp.int32)
    t_xs = t_xs.astype(jnp.int32)

    xs = jnp.arange(t_x)

    # ---- forward DP: row scan --------------------------------------------
    # numba recurrence (core.py:26-39): for valid (y, x) in the band
    #   max(0, t_x + y - t_y) <= x <= min(t_x - 1, y):
    #   v_cur  = value[y-1, x]      unless x == y  -> -inf
    #   v_prev = value[y-1, x-1]    unless x == 0  -> (0 if y == 0 else -inf)
    #   value[y, x] += max(v_prev, v_cur)
    def fwd_step(prev_row, row_value):
        y, row = row_value  # row: (B, T_x)
        v_cur = jnp.where(xs[None, :] == y, _NEG, prev_row)
        v_prev = jnp.roll(prev_row, 1, axis=-1)
        v_prev = v_prev.at[:, 0].set(jnp.where(y == 0, 0.0, _NEG))
        in_band = (xs[None, :] >= jnp.maximum(0, t_xs[:, None] + y - t_ys[:, None])) & (
            xs[None, :] < jnp.minimum(t_xs[:, None], y + 1)
        )
        new_row = jnp.where(in_band, row + jnp.maximum(v_prev, v_cur), row)
        return new_row, new_row

    init = jnp.full((b, t_x), _NEG, jnp.float32)
    _, cum = jax.lax.scan(fwd_step, init, (jnp.arange(t_y), jnp.moveaxis(value, 1, 0)))
    cum = jnp.moveaxis(cum, 0, 1)  # (B, T_y, T_x) accumulated values

    # ---- backtrack (core.py:41-46) ---------------------------------------
    # index starts at t_x - 1; scanning y downward:
    #   path[y, index] = 1
    #   if index != 0 and (index == y or cum[y-1, index] < cum[y-1, index-1]):
    #       index -= 1
    def bwd_step(index, y):
        onehot = (xs[None, :] == index[:, None]).astype(jnp.float32)
        prev_row = jnp.where(y > 0, cum[:, jnp.maximum(y - 1, 0), :], 0.0)  # (B, T_x)
        at_idx = jnp.take_along_axis(prev_row, index[:, None], axis=1)[:, 0]
        at_idx_m1 = jnp.take_along_axis(prev_row, jnp.maximum(index - 1, 0)[:, None], axis=1)[:, 0]
        dec = (index != 0) & ((index == y) | (at_idx < at_idx_m1))
        new_index = jnp.where(dec, index - 1, index)
        # rows >= t_y are invalid: keep index pinned, emit zero row
        valid = y < t_ys
        onehot = jnp.where(valid[:, None], onehot, 0.0)
        new_index = jnp.where(valid, new_index, index)
        return new_index, onehot

    ys_rev = jnp.arange(t_y - 1, -1, -1)
    _, path_rev = jax.lax.scan(bwd_step, t_xs - 1, ys_rev)
    path = jnp.moveaxis(path_rev[::-1], 0, 1)  # (B, T_y, T_x)
    return path


def neg_cent_grid(text_embed: jnp.ndarray, ppg_embed: jnp.ndarray) -> jnp.ndarray:
    """Gaussian log-likelihood grid between two embedding streams.

    reference: src/f5_tts/model/backbones/dit.py:319-325 — with unit variance:
    neg_cent[b, t(ppg), s(text)] = sum_d [ -0.5 log(2π) - 0.5 ppg² + ppg·text - 0.5 text² ]
    """
    import math

    d = text_embed.shape[-1]
    tf = text_embed.astype(jnp.float32)
    pf = ppg_embed.astype(jnp.float32)
    n1 = -0.5 * math.log(2 * math.pi) * d
    n2 = jnp.sum(-0.5 * jnp.square(pf), axis=-1)[:, :, None]  # (b, t, 1)
    n3 = jnp.einsum("btd,bsd->bts", pf, tf, precision=jax.lax.Precision.HIGHEST)
    n4 = jnp.sum(-0.5 * jnp.square(tf), axis=-1)[:, None, :]  # (b, 1, s)
    return n1 + n2 + n3 + n4
