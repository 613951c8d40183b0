"""F5E-TTS-TPU: a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

A from-scratch rebuild of the capabilities of F5E-TTS (non-autoregressive
flow-matching mel-infilling TTS with PPG conditioning and a shared VQ codebook),
designed TPU-first:

- pure-functional model core over parameter pytrees (no module objects),
- the full NFE-step ODE sampler compiled as one `jax.jit(lax.scan)` graph with
  classifier-free-guidance passes folded into a single batched forward,
- GSPMD parallelism via `jax.sharding.Mesh` + NamedSharding (DP/TP/SP),
- static bucketed shapes everywhere so XLA compiles once per bucket,
- bf16 matmul compute with fp32 normalization/accumulation.

Reference behavior parity targets are cited per-function as
``reference: src/f5_tts/<file>:<lines>`` against the upstream repo.
"""

__version__ = "0.1.0"
