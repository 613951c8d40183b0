"""Sequence/context parallelism: mel-frame axis sharded over the 'seq' mesh
axis (the TRT-LLM --cp_size equivalent, SURVEY §2.7). GSPMD inserts the
attention all-gathers."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from f5e_tts_tpu.config import DiTConfig, MeshConfig
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.parallel import make_mesh
from f5e_tts_tpu.parallel.multihost import split_between_processes

TINY = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
                 text_dim=32, conv_layers=1, dropout=0.0)
VOCAB = 16


def test_seq_sharded_forward_matches_replicated(rng):
    mesh = make_mesh(MeshConfig(data=2, model=1, seq=4))
    params, state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }
    b, n, nt = 2, 32, 8  # n divisible by seq axis
    x = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    time = jnp.full((b,), 0.4, jnp.float32)
    f = jnp.zeros((b,), bool)

    def fwd(p, x, cond, text):
        pred, _ = fdit.dit_forward(p, state, TINY, x=x, cond=cond, text_ids=text,
                                   time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                   compute_dtype=jnp.float32)
        return pred

    ref = np.asarray(jax.jit(fwd)(params, x, cond, text))

    with mesh:
        sp = lambda *s: NamedSharding(mesh, P(*s))
        ps = jax.device_put(params, sp())
        xs = jax.device_put(x, sp("data", "seq", None))
        cs = jax.device_put(cond, sp("data", "seq", None))
        ts = jax.device_put(text, sp("data", None))
        out = np.asarray(jax.jit(fwd)(ps, xs, cs, ts))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)


def test_split_between_processes():
    items = list(range(7))
    # single-host: everything
    assert split_between_processes(items) == items
