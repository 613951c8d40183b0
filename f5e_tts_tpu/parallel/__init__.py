"""GSPMD parallelism: mesh construction and sharding rules.

The reference's distributed story is NCCL DDP (training), TRT-LLM TP/CP
(serving), and process pools (metrics) — SURVEY.md §2.7. Here all of it is one
mechanism: a `jax.sharding.Mesh` with axes (data, model, seq) plus NamedSharding
annotations; the XLA SPMD partitioner inserts the ICI collectives.
"""

from f5e_tts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_dit_params,
    dit_param_spec,
)
