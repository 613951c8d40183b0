"""GSPMD sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from f5e_tts_tpu.config import CFMConfig, DiTConfig, MeshConfig, TrainConfig
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.parallel import make_mesh
from f5e_tts_tpu.parallel.mesh import dit_param_spec, tree_map_with_spec
from f5e_tts_tpu.train import step as fstep

TINY = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
                 text_dim=32, conv_layers=1, dropout=0.0)
VOCAB = 16


def test_eight_devices():
    assert jax.device_count() == 8


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    assert mesh.shape == {"data": 4, "fsdp": 1, "model": 2, "seq": 1, "pipe": 1}
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape["data"] == 4
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2, "seq": 1, "pipe": 1}
    mesh = make_mesh(MeshConfig(data=2, pipe=4))
    assert mesh.shape == {"data": 2, "fsdp": 1, "model": 1, "seq": 1, "pipe": 4}


def test_tp_sharded_forward_matches_replicated(rng):
    """DiT forward with TP=2 sharded params == replicated forward."""
    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    params, state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }

    b, n, nt = 4, 16, 8
    x = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, nt)).astype(np.int32))
    time = jnp.full((b,), 0.4, jnp.float32)
    f = jnp.zeros((b,), bool)

    def fwd(p, x, cond, text, time):
        pred, _ = fdit.dit_forward(p, state, TINY, x=x, cond=cond, text_ids=text,
                                   time=time, drop_audio_cond=f, drop_text=f, drop_ppg=f,
                                   compute_dtype=jnp.float32)
        return pred

    ref = np.asarray(jax.jit(fwd)(params, x, cond, text, time))

    sharded = tree_map_with_spec(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, dit_param_spec(TINY))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    conds = jax.device_put(cond, NamedSharding(mesh, P("data", None, None)))
    texts = jax.device_put(text, NamedSharding(mesh, P("data", None)))
    times = jax.device_put(time, NamedSharding(mesh, P("data")))
    with mesh:
        out = np.asarray(jax.jit(fwd)(sharded, xs, conds, texts, times))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)


def test_train_step_dp_tp(rng):
    """Full jitted train step over a dp=4 x tp=2 mesh updates and stays finite."""
    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    params, model_state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
    params = tree_map_with_spec(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, dit_param_spec(TINY))

    train = TrainConfig(learning_rate=1e-3, num_warmup_updates=2)
    optimizer = fstep.make_optimizer(train, total_updates=10)
    ts = fstep.init_train_state(params, model_state, optimizer)

    b, n, nt = 8, 16, 8
    batch = {
        "mel": jax.device_put(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32),
                              NamedSharding(mesh, P("data", None, None))),
        "mel_lens": jax.device_put(np.full((b,), n, np.int32), NamedSharding(mesh, P("data"))),
        "text_ids": jax.device_put(rng.integers(0, VOCAB, (b, nt)).astype(np.int32),
                                   NamedSharding(mesh, P("data", None))),
    }
    step = jax.jit(
        lambda ts, batch, rng_: fstep.train_step(
            ts, batch, rng_, arch=TINY, cfm=CFMConfig(), optimizer=optimizer,
            compute_dtype=jnp.float32),
        donate_argnums=(0,))
    with mesh:
        ts1, m1 = step(ts, batch, jax.random.PRNGKey(1))
        loss1 = float(m1.loss)
        ts2, m2 = step(ts1, batch, jax.random.PRNGKey(1))
        loss2 = float(m2.loss)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert int(ts2.update) == 2
    assert int(ts2.skipped) == 0
    assert float(m1.grad_norm) > 0


def test_train_step_fsdp(rng):
    """ZeRO-3 mesh (dp=2 x fsdp=2 x tp=2): params/opt-state shard over the
    fsdp axis, per-shard arrays shrink accordingly, and the step's loss
    matches the plain-DP run on identical inputs (GSPMD all-gather/
    reduce-scatter is a layout change, not a math change)."""
    b, n, nt = 8, 16, 8
    np_batch = {
        "mel": rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32),
        "mel_lens": np.full((b,), n, np.int32),
        "text_ids": rng.integers(0, VOCAB, (b, nt)).astype(np.int32),
    }
    train = TrainConfig(learning_rate=1e-3, num_warmup_updates=2)

    def run(mesh_cfg, fsdp):
        mesh = make_mesh(mesh_cfg)
        params, model_state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
        params = tree_map_with_spec(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            params, dit_param_spec(TINY, fsdp=fsdp))
        optimizer = fstep.make_optimizer(train, total_updates=10)
        ts = fstep.init_train_state(params, model_state, optimizer)
        d = ("data", "fsdp")
        batch = {
            "mel": jax.device_put(np_batch["mel"], NamedSharding(mesh, P(d, None, None))),
            "mel_lens": jax.device_put(np_batch["mel_lens"], NamedSharding(mesh, P(d))),
            "text_ids": jax.device_put(np_batch["text_ids"], NamedSharding(mesh, P(d, None))),
        }
        step = jax.jit(
            lambda ts, batch, rng_: fstep.train_step(
                ts, batch, rng_, arch=TINY, cfm=CFMConfig(), optimizer=optimizer,
                compute_dtype=jnp.float32),
            donate_argnums=(0,))
        with mesh:
            ts1, m1 = step(ts, batch, jax.random.PRNGKey(1))
        return ts1, float(m1.loss)

    ts_dp, loss_dp = run(MeshConfig(data=8, fsdp=1, model=1), fsdp=False)
    ts_f, loss_f = run(MeshConfig(data=2, fsdp=2, model=2), fsdp=True)
    assert np.isfinite(loss_f)
    np.testing.assert_allclose(loss_f, loss_dp, rtol=2e-4)

    # params AND optimizer moments carry the fsdp axis with shrunken shards
    w = ts_f.params["blocks"]["attn"]["to_q"]["w"]
    assert "fsdp" in tuple(w.sharding.spec)
    shard = w.addressable_shards[0].data
    assert shard.shape[1] == w.shape[1] // 2 and shard.shape[2] == w.shape[2] // 2
    # adam mu/nu for this param, wherever they sit in the optax chain state
    moments = [x for x in jax.tree.leaves(ts_f.opt_state)
               if hasattr(x, "shape") and x.shape == w.shape]
    assert len(moments) >= 2  # mu and nu
    for m in moments:
        assert "fsdp" in tuple(m.sharding.spec)
        assert m.addressable_shards[0].data.shape == shard.shape
    ema = ts_f.ema_params["blocks"]["attn"]["to_q"]["w"]
    assert ema.addressable_shards[0].data.shape == shard.shape


def test_sampler_under_dp_mesh(rng):
    """The full folded-CFG sampler runs with a data-sharded batch on the mesh
    (serving-at-scale: prompt batches sharded over chips)."""
    from f5e_tts_tpu.config import CFMConfig
    from f5e_tts_tpu.models import cfm as fcfm

    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    params, state = fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)
    params["proj_out"] = {
        "w": jnp.asarray(rng.standard_normal((TINY.dim, TINY.mel_dim)).astype(np.float32)) * 0.02,
        "b": jnp.zeros((TINY.mel_dim,), jnp.float32),
    }
    b, n = 4, 32
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, 8)).astype(np.int32))
    inputs = fcfm.prepare_inputs(cond, jnp.full((b,), 12), jnp.full((b,), n), n,
                                 text_ids=text)
    key = jax.random.PRNGKey(5)
    ref, _ = fcfm.sample(params, state, TINY, CFMConfig(), inputs, key, steps=2,
                         cfg_strength=2.0, compute_dtype=jnp.float32)

    with mesh:
        sharded_params = tree_map_with_spec(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params,
            dit_param_spec(TINY))
        sh = lambda *s: NamedSharding(mesh, P(*s))
        inputs_s = fcfm.SamplerInputs(
            cond=jax.device_put(inputs.cond, sh("data", None, None)),
            cond_mask=jax.device_put(inputs.cond_mask, sh("data", None)),
            duration=jax.device_put(inputs.duration, sh("data")),
            text_ids=jax.device_put(inputs.text_ids, sh("data", None)),
            ppg=None)
        out, _ = fcfm.sample(sharded_params, state, TINY, CFMConfig(), inputs_s, key,
                             steps=2, cfg_strength=2.0, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-5)


def test_dryrun_multichip_entry():
    """The driver-facing dryrun runs on the 8-device CPU mesh.

    Runs in a FRESH subprocess — exactly how the driver invokes it, and it
    sidesteps an XLA:CPU instability observed on some VMs where a large
    GSPMD compile late in a long-lived pytest process (hundreds of compiled
    modules) segfaults inside backend_compile_and_load; the identical
    compile in a fresh process succeeds."""
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=root, capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": ""})
    assert proc.returncode == 0, proc.stderr[-4000:]
    for phase in ("train ok", "sampler ok", "ckpt ok", "fsdp ok"):
        assert phase in proc.stdout, (phase, proc.stdout[-2000:])
