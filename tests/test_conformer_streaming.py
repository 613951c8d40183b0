"""WeNet streaming chunk decode (encoder.py:210-355) and chunk masks
(mask.py:78-186): cache-carrying forward_chunk must reproduce the chunk-masked
full-utterance encode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.models import conformer as fc


def tiny_cfg(kernel=1, subsampling="conv2d"):
    return fc.ConformerConfig(input_dim=8, output_size=16, attention_heads=2,
                              linear_units=32, num_blocks=2,
                              cnn_module_kernel=kernel, subsampling=subsampling)


def test_subsequent_chunk_mask_matches_reference_example():
    # mask.py:99-103 docstring example
    m = fc.subsequent_chunk_mask_np(4, 2)
    exp = np.array([[1, 1, 0, 0],
                    [1, 1, 0, 0],
                    [1, 1, 1, 1],
                    [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(m, exp)
    # left-chunk limit
    m = fc.subsequent_chunk_mask_np(6, 2, num_left_chunks=1)
    assert m[4, 0] == False and m[4, 2] == True and m[4, 5] == True  # noqa: E712


def test_full_context_chunk_mask_is_noop(rng):
    cfg = tiny_cfg(kernel=15)
    params = fc.init_conformer(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
    lens = jnp.asarray([40, 31], jnp.int32)
    base, l0 = fc.conformer_encode(params, cfg, feats, lens)
    # chunk_size = full length -> identical outputs
    chunked, l1 = fc.conformer_encode(params, cfg, feats, lens,
                                      chunk_size=feats.shape[1])
    np.testing.assert_allclose(np.asarray(base), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


@pytest.mark.parametrize("left_chunks", [-1, 1])
def test_chunk_by_chunk_matches_chunk_masked_full(rng, left_chunks):
    """With kernel-1 convs (no temporal context outside attention) the
    streaming decode must EXACTLY reproduce the chunk-masked full encode,
    both for unlimited and limited left context."""
    cfg = tiny_cfg(kernel=1)
    params = fc.init_conformer(jax.random.PRNGKey(1), cfg)
    t = 37
    feats = jnp.asarray(rng.standard_normal((1, t, 8)).astype(np.float32))
    chunk = 4

    ys = fc.conformer_encode_chunk_by_chunk(params, cfg, feats, chunk,
                                            num_decoding_left_chunks=left_chunks)
    n = ys.shape[1]
    # full-utterance pass over exactly the frames streaming consumed
    spec = fc.subsampling_spec(cfg.subsampling)
    consumed = (n - 1) * spec["rate"] + spec["right_context"] + 1
    full, _ = fc.conformer_encode(params, cfg, feats[:, :consumed],
                                  jnp.asarray([consumed], jnp.int32),
                                  chunk_size=chunk, num_left_chunks=left_chunks)
    assert full.shape[1] == n, (full.shape, n)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_subsampled_time_matches_encoder():
    for sub in ("linear", "conv2d", "conv2d4", "conv2d8"):
        cfg = fc.ConformerConfig(input_dim=40, output_size=16,
                                 attention_heads=2, linear_units=32,
                                 num_blocks=1, cnn_module_kernel=1,
                                 subsampling=sub)
        params = fc.init_conformer(jax.random.PRNGKey(0), cfg)
        t = 50
        out, _ = fc.conformer_encode(params, cfg,
                                     jnp.zeros((1, t, 40)),
                                     jnp.asarray([t], jnp.int32))
        assert out.shape[1] == fc.subsampled_time(sub, t), sub


def test_dynamic_chunk_training_mask(rng):
    """use_dynamic_chunk path: a host-sampled chunk mask changes the encoder
    output vs full context, and the ASR train step accepts it."""
    import optax

    from f5e_tts_tpu.models import conformer_train as ct

    cfg = tiny_cfg(kernel=15)
    params = fc.init_conformer(jax.random.PRNGKey(3), cfg)
    t = 40
    feats = jnp.asarray(rng.standard_normal((2, t, 8)).astype(np.float32))
    lens = jnp.asarray([t, 33], jnp.int32)

    cm = fc.sample_train_chunk_mask(cfg, t, np.random.default_rng(1))
    assert cm.shape == (fc.subsampled_time(cfg.subsampling, t),) * 2
    # force a strictly-chunked mask for the comparison
    tt = cm.shape[0]
    cm = fc.subsequent_chunk_mask_np(tt, 3)
    full, _ = fc.conformer_encode(params, cfg, feats, lens)
    chunked, _ = fc.conformer_encode(params, cfg, feats, lens,
                                     chunk_mask=jnp.asarray(cm))
    assert not np.allclose(np.asarray(full), np.asarray(chunked), atol=1e-3)

    heads = ct.init_asr_heads(jax.random.PRNGKey(4), cfg, vocab_size=11)
    opt = optax.adam(1e-4)
    step = ct.make_asr_train_step(cfg, opt)
    batch = {"feats": feats, "feat_lens": lens,
             "frame_labels": jnp.zeros((2, tt), jnp.int32),
             "chunk_mask": jnp.asarray(cm)}
    p2, h2, _, out = step(params, heads, opt.init((params, heads)), batch)
    assert np.isfinite(float(out.loss))


def test_forward_chunk_cache_trimming(rng):
    """required_cache_size > 0 keeps only that much history (encoder.py:259-266)."""
    cfg = tiny_cfg(kernel=1)
    params = fc.init_conformer(jax.random.PRNGKey(2), cfg)
    feats = jnp.asarray(rng.standard_normal((1, 60, 8)).astype(np.float32))
    spec = fc.subsampling_spec(cfg.subsampling)
    chunk, left = 4, 2
    window = (chunk - 1) * spec["rate"] + spec["right_context"] + 1
    required = chunk * left

    caches, offset = None, 0
    for cur in range(0, feats.shape[1] - spec["right_context"], chunk * spec["rate"]):
        end = min(cur + window, feats.shape[1])
        if end - cur < spec["right_context"] + 1:
            break
        y, caches = fc.conformer_forward_chunk(params, cfg, feats[:, cur:end],
                                               offset, required, caches)
        offset += y.shape[1]
        assert caches["sub"].shape[1] <= required
        assert all(c.shape[1] <= required for c in caches["layers"])
    assert offset > 0
