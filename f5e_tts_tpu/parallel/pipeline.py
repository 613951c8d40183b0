"""Pipeline parallelism (GPipe) over the depth-stacked transformer blocks.

The DiT trunk is a `lax.scan` over depth-stacked block params
(models/dit.py). Pipeline parallelism splits that depth across a 'pipe'
mesh axis: stage s holds depth/S consecutive blocks, the batch is split
into M microbatches, and activations flow stage-to-stage via
`lax.ppermute` on a skewed schedule (microbatch m occupies stage s at tick
m + s). The classic bubble fraction is (S-1)/(M+S-1) — pick n_micro >= S.

The torch reference has no pipeline parallelism (its TRT-LLM serving
engine is single-GPU and training is pure DDP, trainer.py:63-68); this is
a TPU-native scale-out path for chips whose HBM cannot hold all layers.

Semantics: numerically identical to the plain `lax.scan` when the body is
deterministic. Bodies that draw batch-shaped randomness (dropout) see a
split batch, so draws differ from the unpipelined run — bit-different but
unbiased PROVIDED each microbatch gets independent draws: pass
`fold_scanned` to fold the microbatch index into any rngs riding in
`scanned` (without it, every microbatch would reuse the same per-layer rng
slice and rows i and i+B/M of the batch would share dropout masks). Tests
pin the dropout=0 case bitwise and check per-microbatch rng independence.

Composition: TP inside a pipeline stage is not supported (the attention
head-sharding shard_map cannot nest inside the pipe shard_map) — gate PP
to tp==1. FSDP-sharded block params are all-gathered at the shard_map
boundary (in_specs pin only the leading depth axis to 'pipe').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_vma vs check_rep kwarg) — same
    compat shim as ops/ring_attention.py."""
    try:
        from jax import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


_PP = {"mesh": None, "axis": "pipe", "n_micro": None}


def set_pp_context(mesh: Optional[Mesh], axis: str = "pipe",
                   n_micro: Optional[int] = None) -> None:
    """Install (or clear, with mesh=None) the pipeline-parallel context the
    DiT trunk consults — mirrors set_tp_context/set_sp_context."""
    _PP["mesh"] = mesh
    _PP["axis"] = axis
    _PP["n_micro"] = n_micro


def pp_shards() -> int:
    mesh = _PP["mesh"]
    if mesh is None or _PP["axis"] not in mesh.shape:
        return 1
    return int(mesh.shape[_PP["axis"]])


def pp_context():
    return _PP["mesh"], _PP["axis"], _PP["n_micro"]


def gpipe_scan(body, h0, scanned, mesh: Mesh, *, axis: str = "pipe",
               n_micro: Optional[int] = None, batched=(), const=(),
               batch_axes=None, fold_scanned=None):
    """Pipeline-parallel equivalent of
    `lax.scan(lambda h, sl: (body(h, sl, *batched, *const), None), h0, scanned)[0]`.

    body(h_micro, scanned_slice, *batched_micro, *const) -> h_micro.

    - h0: (B, ...) carry entering block 0; B % n_micro == 0.
    - scanned: pytree with leading depth axis; depth % pipe_size == 0.
      Stage s receives the contiguous slice [s*depth/S, (s+1)*depth/S).
    - batched: pytree of per-batch tensors (leading B axis) split into
      microbatches alongside h0 (e.g. t_emb, padding mask).
    - const: pytree replicated to every stage/microbatch (e.g. rope tables).
    - batch_axes: optional mesh axis (or tuple of axes) the leading batch
      dim of h0/batched is ALREADY sharded over (data parallelism). The
      pipeline then runs on the local batch shard per data replica instead
      of all-gathering it; n_micro divides the LOCAL batch.
    - fold_scanned: optional (scanned_slice, m) -> scanned_slice applied per
      microbatch index m before the stage body runs. Use it to fold m into
      per-layer dropout rngs so microbatches draw INDEPENDENT masks (the
      slice is otherwise reused verbatim for all M microbatches). Not
      applied on the S==1 fallback, which is the sequential scan itself.

    Returns the (B, ...) output of the final block, identical to the
    sequential scan (up to body-internal randomness over batch shape).
    """
    S = int(mesh.shape[axis])
    if S == 1:
        def step(h, sl):
            return body(h, sl, *batched, *const), None

        return jax.lax.scan(step, h0, scanned)[0]

    depth = jax.tree.leaves(scanned)[0].shape[0]
    assert depth % S == 0, f"depth {depth} not divisible by pipe size {S}"
    axes = ((batch_axes,) if isinstance(batch_axes, str) else
            tuple(batch_axes or ()))
    dp = 1
    for a in axes:
        dp *= int(mesh.shape[a])
    local_b = h0.shape[0] // dp
    M = n_micro or S
    assert local_b % M == 0, (
        f"local batch {local_b} not divisible by n_micro {M}")

    def to_micro(x):
        return x.reshape(M, x.shape[0] // M, *x.shape[1:])

    def local(scanned_local, h_all, batched_all, const_all):
        s = jax.lax.axis_index(axis)
        hs = to_micro(h_all)
        bm = jax.tree.map(to_micro, batched_all)
        T = M + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def run_stage(h, b_micro, scanned_m):
            def step(c, sl):
                return body(c, sl, *b_micro, *const_all), None

            return jax.lax.scan(step, h, scanned_m)[0]

        def tick(buf, t):
            m_in = jnp.clip(t, 0, M - 1)            # microbatch entering stage 0
            m_here = jnp.clip(t - s, 0, M - 1)      # microbatch at THIS stage
            inp = jnp.where(s == 0, hs[m_in], buf)
            b_micro = jax.tree.map(lambda a: a[m_here], bm)
            scanned_m = (scanned_local if fold_scanned is None
                         else fold_scanned(scanned_local, m_here))
            y = run_stage(inp, b_micro, scanned_m)
            nxt = jax.lax.ppermute(y, axis, perm)
            return nxt, y

        buf0 = jnp.zeros_like(hs[0])
        _, ys = jax.lax.scan(tick, buf0, jnp.arange(T))
        # the LAST stage's y at tick t is microbatch t-(S-1); ticks
        # S-1..T-1 cover microbatches 0..M-1 in order. Other stages' rows
        # (and the last stage's warm-up ticks) are discarded.
        outs = jnp.where(s == S - 1, ys[S - 1:], jnp.zeros_like(ys[S - 1:]))
        outs = jax.lax.psum(outs, axis)  # broadcast the final activations
        return outs.reshape(h_all.shape)

    def bspec_for(x):
        return P(axes, *([None] * (x.ndim - 1))) if axes else P()

    specs_scanned = jax.tree.map(lambda _: P(axis), scanned)
    fn = _shard_map(local, mesh,
                    in_specs=(specs_scanned, bspec_for(h0),
                              jax.tree.map(bspec_for, batched),
                              jax.tree.map(lambda _: P(), const)),
                    out_specs=bspec_for(h0))
    return fn(scanned, h0, batched, const)
