"""On-chip validation + A/B for the packed-heads attention kernels (round 5).

1. numerics: packed fwd/bwd vs the per-(batch*head) kernels and the XLA
   reference at the Base training shape (b32 n1664 h16 dh64, bf16).
2. timing: loop-difference micro-bench of fwd and bwd, per-head vs packed,
   with a block_q sweep for the backward.

Run: python scripts/validate_packed.py [--batch 32] [--len 1664]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.ops import pallas_attention as pa
from f5e_tts_tpu.ops.rope import rotary_cos_sin_half


def timeit(fn, args, iters=20):
    """fn must take its arrays as ARGUMENTS (closed-over arrays inline into
    the program and 413 the remote-compile tunnel)."""
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--len", type=int, dest="length", default=1664)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    b, n, h, dh = args.batch, args.length, args.heads, args.dh
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, dh)).astype(np.float32) * 0.5,
                             jnp.bfloat16)
    q, k, v, g = mk(), mk(), mk(), mk()
    kv_lens = jnp.asarray([n - 128 * (i % 3) for i in range(b)], jnp.int32)
    cos, sin = rotary_cos_sin_half(dh, n)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    rope_heads = h

    # ---- numerics ----
    o_ph = jax.jit(pa.mha_fullkv_rope, static_argnames=("rope_heads",))(
        q, k, v, kv_lens, cos, sin, rope_heads=rope_heads)
    o_pk = jax.jit(pa.mha_packed_rope, static_argnames=("rope_heads",))(
        q, k, v, kv_lens, cos, sin, rope_heads=rope_heads)
    row = jnp.arange(n)[None, :, None, None] < kv_lens[:, None, None, None]
    dfwd = float(jnp.max(jnp.abs(jnp.where(row, o_ph.astype(jnp.float32)
                                           - o_pk.astype(jnp.float32), 0.0))))
    print(f"fwd  max|packed - perhead| on valid rows: {dfwd:.3e}")

    d_ph = pa.mha_fullkv_rope_bwd(q, k, v, kv_lens, cos, sin, g, rope_heads,
                                  block_q=256)
    d_pk = pa.mha_packed_rope_bwd(q, k, v, kv_lens, cos, sin, g, rope_heads,
                                  block_q=256)
    for name, a, bb in zip(("dq", "dk", "dv"), d_ph, d_pk):
        m = float(jnp.max(jnp.abs(jnp.where(
            row, a.astype(jnp.float32) - bb.astype(jnp.float32), 0.0))))
        cosim = float(jnp.sum(a.astype(jnp.float32) * bb.astype(jnp.float32))
                      / (jnp.linalg.norm(a.astype(jnp.float32))
                         * jnp.linalg.norm(bb.astype(jnp.float32)) + 1e-30))
        print(f"bwd  {name}: max|diff|={m:.3e}  cos={cosim:.6f}")
        assert cosim > 0.999, (name, cosim)
    assert dfwd < 3e-2, dfwd

    # ---- timing ----
    xs = (q, k, v, kv_lens, cos, sin)
    fwd_ph = jax.jit(lambda q, k, v, l, c, s: pa.mha_fullkv_rope(
        q, k, v, l, c, s, rope_heads=rope_heads))
    fwd_pk = jax.jit(lambda q, k, v, l, c, s: pa.mha_packed_rope(
        q, k, v, l, c, s, rope_heads=rope_heads))
    t_ph = timeit(fwd_ph, xs, args.iters)
    t_pk = timeit(fwd_pk, xs, args.iters)
    print(f"fwd  per-head {t_ph*1e3:8.3f} ms   packed {t_pk*1e3:8.3f} ms   "
          f"ratio {t_pk/t_ph:.3f}")

    xg = (q, k, v, kv_lens, cos, sin, g)
    for bq in (128, 256, 512):
        ok_ph = pa.bwd_supported(q, k, block_q=bq, rope=True)
        ok_pk = pa.packed_supported(q, bwd=True, block_q=bq)
        t1 = t2 = float("nan")
        if ok_ph:
            f1 = jax.jit(lambda q, k, v, l, c, s, g, bq=bq: pa.mha_fullkv_rope_bwd(
                q, k, v, l, c, s, g, rope_heads, block_q=bq))
            t1 = timeit(f1, xg, args.iters)
        if ok_pk:
            f2 = jax.jit(lambda q, k, v, l, c, s, g, bq=bq: pa.mha_packed_rope_bwd(
                q, k, v, l, c, s, g, rope_heads, block_q=bq))
            t2 = timeit(f2, xg, args.iters)
        fit = pa._fit_block_q(n, bq)
        print(f"bwd  block_q={bq:4d} (fit {fit:4d})  per-head "
              f"{t1*1e3:8.3f} ms   packed {t2*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
