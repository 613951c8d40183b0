"""GPipe pipeline parallelism: parity with the sequential lax.scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from f5e_tts_tpu.parallel.pipeline import gpipe_scan, pp_shards, set_pp_context


def _pipe_mesh(s):
    return Mesh(np.asarray(jax.devices()[:s]), axis_names=("pipe",))


def _body(h, sl, t_emb, mask):
    # nonlinear block with per-batch conditioning + boolean mask, so stage
    # order, microbatch routing, and batched-arg slicing all matter
    w, b = sl["w"], sl["b"]
    y = jnp.tanh(h @ w + b + t_emb[:, None, :])
    return jnp.where(mask[:, :, None], y, h)


def _make(depth=8, B=8, N=16, D=32, seed=0):
    rng = np.random.default_rng(seed)
    scanned = {
        "w": jnp.asarray(rng.standard_normal((depth, D, D)).astype(np.float32)) * 0.3,
        "b": jnp.asarray(rng.standard_normal((depth, D)).astype(np.float32)) * 0.1,
    }
    h0 = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    t_emb = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, (B, N)).astype(bool))
    return scanned, h0, t_emb, mask


def _seq_ref(scanned, h0, t_emb, mask):
    def step(h, sl):
        return _body(h, sl, t_emb, mask), None

    return jax.lax.scan(step, h0, scanned)[0]


@pytest.mark.parametrize("pipe,n_micro", [(2, 2), (4, 4), (4, 8), (8, 8)])
def test_gpipe_matches_scan(pipe, n_micro):
    scanned, h0, t_emb, mask = _make()
    ref = _seq_ref(scanned, h0, t_emb, mask)
    mesh = _pipe_mesh(pipe)
    out = gpipe_scan(_body, h0, scanned, mesh, n_micro=n_micro,
                     batched=(t_emb, mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_grads_match_scan():
    scanned, h0, t_emb, mask = _make()
    mesh = _pipe_mesh(4)

    def loss_seq(scanned, h0, t_emb):
        return jnp.sum(_seq_ref(scanned, h0, t_emb, mask) ** 2)

    def loss_pipe(scanned, h0, t_emb):
        out = gpipe_scan(_body, h0, scanned, mesh, n_micro=4,
                         batched=(t_emb, mask))
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_seq, argnums=(0, 1, 2))(scanned, h0, t_emb)
    g_pipe = jax.grad(loss_pipe, argnums=(0, 1, 2))(scanned, h0, t_emb)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_gpipe_size_one_is_plain_scan():
    scanned, h0, t_emb, mask = _make()
    mesh = _pipe_mesh(1)
    out = gpipe_scan(_body, h0, scanned, mesh, batched=(t_emb, mask))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(_seq_ref(scanned, h0, t_emb, mask)))


def test_dit_forward_under_pp_matches_plain(rng):
    """The DiT trunk routed through gpipe_scan (pipe=4, 2 blocks/stage)
    must reproduce the sequential forward bitwise-closely, with remat on."""
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models import dit as fdit

    cfg = DiTConfig(dim=64, depth=8, heads=2, dim_head=32, ff_mult=2,
                    mel_dim=8, text_dim=32, conv_layers=1, dropout=0.0,
                    checkpoint_activations=True)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), cfg, 16)
    b, n, nt = 8, 32, 8
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(r.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(r.integers(0, 16, (b, nt)).astype(np.int32))
    time = jnp.linspace(0.1, 0.9, b)
    f = jnp.zeros((b,), bool)

    def fwd():
        pred, _ = fdit.dit_forward(params, state, cfg, x=x, cond=cond,
                                   text_ids=text, time=time, drop_audio_cond=f,
                                   drop_text=f, drop_ppg=f,
                                   compute_dtype=jnp.float32)
        return np.asarray(pred)

    ref = fwd()
    set_pp_context(_pipe_mesh(4), n_micro=4)
    try:
        out = fwd()
    finally:
        set_pp_context(None)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_dit_grads_under_pp_match_plain(rng):
    """CFM-style scalar loss: grads w.r.t. params match the sequential run."""
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models import dit as fdit

    cfg = DiTConfig(dim=64, depth=8, heads=2, dim_head=32, ff_mult=2,
                    mel_dim=8, text_dim=32, conv_layers=1, dropout=0.0,
                    checkpoint_activations=True)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), cfg, 16)
    b, n, nt = 8, 32, 8
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(r.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(r.integers(0, 16, (b, nt)).astype(np.int32))
    time = jnp.linspace(0.1, 0.9, b)
    f = jnp.zeros((b,), bool)

    def loss(p):
        pred, _ = fdit.dit_forward(p, state, cfg, x=x, cond=cond,
                                   text_ids=text, time=time, drop_audio_cond=f,
                                   drop_text=f, drop_ppg=f,
                                   compute_dtype=jnp.float32)
        return jnp.mean(pred ** 2)

    g_ref = jax.grad(loss)(params)
    set_pp_context(_pipe_mesh(4), n_micro=4)
    try:
        g_pp = jax.grad(loss)(params)
    finally:
        set_pp_context(None)
    for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_pp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-6, err_msg=str(pa))


def test_trainer_step_under_dp_pp(rng):
    """Full Trainer step on a dp=2 x pipe=4 mesh: params pipe-sharded on the
    depth axis, loss matches the plain-DP run on identical inputs."""
    from f5e_tts_tpu.config import (CFMConfig, DiTConfig, MeshConfig,
                                    MelConfig, ModelConfig, TrainConfig)
    from f5e_tts_tpu.train.trainer import Trainer

    arch = DiTConfig(dim=64, depth=8, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=8, text_dim=32, conv_layers=1, dropout=0.0,
                     checkpoint_activations=True)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", tokenizer="custom",
                            tokenizer_path=None, arch=arch, mel=MelConfig(),
                            cfm=CFMConfig(), vocab_size=16)
    b, n, nt = 8, 32, 8
    r = np.random.default_rng(3)
    npb = {
        "mel": r.standard_normal((b, n, arch.mel_dim)).astype(np.float32),
        "mel_lens": np.full((b,), n, np.int32),
        "text_ids": r.integers(0, 16, (b, nt)).astype(np.int32),
    }

    def run(mesh_cfg):
        from f5e_tts_tpu.parallel.pipeline import set_pp_context

        tc = TrainConfig(learning_rate=1e-3, num_warmup_updates=2,
                         batch_size_per_device=b * n,
                         save_per_updates=10**9, last_per_updates=10**9,
                         save_dir="/tmp/pp_test_ckpts", seed=0,
                         compute_dtype="float32", mesh=mesh_cfg,
                         pp_microbatches=2)
        trainer = Trainer(model_cfg, tc, vocab_size=16,
                          tokenize=lambda ts: [[0] for _ in ts])
        try:
            ts = trainer.init_state(total_updates=10)
            step = trainer.make_step()
            sh = trainer.batch_shardings()
            batch = {k: jax.device_put(v, sh[k]) for k, v in npb.items()}
            with trainer.mesh:
                ts, metrics = step(ts, batch, jax.random.PRNGKey(1))
                loss = float(metrics.loss)
            return ts, loss
        finally:
            set_pp_context(None)

    ts_dp, loss_dp = run(MeshConfig(data=8))
    ts_pp, loss_pp = run(MeshConfig(data=2, pipe=4))
    assert np.isfinite(loss_pp)
    np.testing.assert_allclose(loss_pp, loss_dp, rtol=2e-4)
    w = ts_pp.params["blocks"]["attn"]["to_q"]["w"]
    assert "pipe" in tuple(w.sharding.spec)
    assert w.addressable_shards[0].data.shape[0] == arch.depth // 4


def test_pp_context_roundtrip():
    assert pp_shards() == 1
    mesh = _pipe_mesh(4)
    set_pp_context(mesh, n_micro=8)
    try:
        assert pp_shards() == 4
    finally:
        set_pp_context(None)
    assert pp_shards() == 1


def test_gpipe_fold_scanned_applies_microbatch_index():
    """fold_scanned must hand microbatch m a folded scanned slice; verify
    against a manual per-microbatch computation."""
    depth, B, N, D, S, M = 4, 8, 4, 8, 2, 4
    r = np.random.default_rng(7)
    w = jnp.asarray(r.standard_normal((depth, D, D)).astype(np.float32)) * 0.2
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(depth))

    def body(h, sl, t_emb, mask):
        wd, key = sl
        noise = jax.random.uniform(key, h.shape[1:])  # batch-shaped draw
        return jnp.tanh(h @ wd) + noise[None]

    def fold(sl, m):
        wd, keys = sl
        return wd, jax.vmap(lambda k: jax.random.fold_in(k, m))(keys)

    h0 = jnp.asarray(r.standard_normal((B, N, D)).astype(np.float32))
    t_emb = jnp.zeros((B, D), jnp.float32)
    mask = jnp.ones((B, N), bool)
    mesh = _pipe_mesh(S)
    out = gpipe_scan(body, h0, (w, rngs), mesh, n_micro=M,
                     batched=(t_emb, mask), fold_scanned=fold)

    # manual: microbatch m runs the full depth with fold_in(rng_d, m)
    mb = B // M
    expect = []
    for m in range(M):
        h = h0[m * mb:(m + 1) * mb]
        for d in range(depth):
            key = jax.random.fold_in(rngs[d], m)
            h = jnp.tanh(h @ w[d]) + jax.random.uniform(key, h.shape[1:])[None]
        expect.append(h)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.concatenate(expect)),
                               rtol=1e-5, atol=1e-6)


def test_dit_pp_dropout_masks_independent_across_microbatches():
    """Regression: rows i and i+B/M used to share every dropout mask because
    gpipe_scan reused the same per-layer rng slice for all microbatches.
    Duplicate inputs placed in different microbatches must now produce
    DIFFERENT training outputs (independent masks), while the same run stays
    deterministic end-to-end."""
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models import dit as fdit

    cfg = DiTConfig(dim=64, depth=8, heads=2, dim_head=32, ff_mult=2,
                    mel_dim=8, text_dim=32, conv_layers=1, dropout=0.3,
                    checkpoint_activations=False)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), cfg, 16)
    # init_dit uses AdaLN-Zero (dit.py: linear_zero_init for attn_norm), so a
    # fresh trunk is an IDENTITY map (gate_msa = gate_mlp = 0) and dropout is
    # gated out of the output entirely. Randomize the modulation weights so
    # dropout effects are observable.
    am = params["blocks"]["attn_norm"]
    params["blocks"]["attn_norm"] = {
        **am, "w": 0.1 * jax.random.normal(jax.random.PRNGKey(7),
                                           am["w"].shape, am["w"].dtype)}
    # proj_out is zero-init too -> pred would be all-zeros for ANY trunk
    po = params["proj_out"]
    params["proj_out"] = {
        **po, "w": 0.05 * jax.random.normal(jax.random.PRNGKey(8),
                                            po["w"].shape, po["w"].dtype)}
    b, n, nt = 8, 32, 8  # M=4 -> microbatch size 2; rows 0 and 2 duplicate
    r = np.random.default_rng(0)
    row_x = r.standard_normal((1, n, cfg.mel_dim)).astype(np.float32)
    row_c = r.standard_normal((1, n, cfg.mel_dim)).astype(np.float32)
    row_t = r.integers(0, 16, (1, nt)).astype(np.int32)
    x = jnp.asarray(np.repeat(row_x, b, 0))
    cond = jnp.asarray(np.repeat(row_c, b, 0))
    text = jnp.asarray(np.repeat(row_t, b, 0))
    time = jnp.full((b,), 0.5)
    f = jnp.zeros((b,), bool)

    def fwd(seed):
        pred, _ = fdit.dit_forward(params, state, cfg, x=x, cond=cond,
                                   text_ids=text, time=time, drop_audio_cond=f,
                                   drop_text=f, drop_ppg=f, training=True,
                                   rng=jax.random.PRNGKey(seed),
                                   compute_dtype=jnp.float32)
        return np.asarray(pred)

    set_pp_context(_pipe_mesh(4), n_micro=4)
    try:
        out = fwd(5)
        out2 = fwd(5)
    finally:
        set_pp_context(None)
    np.testing.assert_array_equal(out, out2)  # deterministic given the seed
    # rows 0/1 share a microbatch -> same mask draw shape but different rows
    # of the (mb, n, d) mask; the bug was across-microbatch: row0 == row2
    assert np.abs(out[0] - out[2]).max() > 1e-6, (
        "rows in different microbatches got identical dropout masks")


def test_pp_refuses_active_sp_context():
    """pipe>1 with an active seq>1 SP context must fail loudly (ring
    attention cannot nest inside the pipe shard_map)."""
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.ops.attention import set_sp_context

    cfg = DiTConfig(dim=64, depth=8, heads=2, dim_head=32, ff_mult=2,
                    mel_dim=8, text_dim=32, conv_layers=1, dropout=0.0)
    params, state = fdit.init_dit(jax.random.PRNGKey(0), cfg, 16)
    b, n, nt = 8, 32, 8
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(r.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(r.integers(0, 16, (b, nt)).astype(np.int32))
    time = jnp.linspace(0.1, 0.9, b)
    f = jnp.zeros((b,), bool)

    sp_mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("seq",))
    set_pp_context(_pipe_mesh(4), n_micro=4)
    set_sp_context(sp_mesh, min_seq=2)
    try:
        with pytest.raises(AssertionError, match="seq == 1"):
            fdit.dit_forward(params, state, cfg, x=x, cond=cond,
                             text_ids=text, time=time, drop_audio_cond=f,
                             drop_text=f, drop_ppg=f,
                             compute_dtype=jnp.float32)
    finally:
        set_pp_context(None)
        set_sp_context(None)
