"""Conformer encoder parity vs the ACTUAL reference WeNet code
(/root/reference/src/f5_tts/ppg/wenet/transformer/encoder.py), via the
tests/oracle offline import shims: full encode, chunk-masked encode, and the
streaming forward_chunk_by_chunk cache machinery."""

import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from f5e_tts_tpu.models import conformer as fc

from tests.oracle import loader


@pytest.fixture(scope="module")
def ref_encoder_mod():
    loader.load()
    return importlib.import_module("f5_tts.ppg.wenet.transformer.encoder")


def build_pair(ref_encoder_mod, input_layer="conv2d", kernel=15, seed=0):
    """Reference ConformerEncoder + our params ingested from its state_dict."""
    cfg = fc.ConformerConfig(input_dim=40, output_size=16, attention_heads=2,
                             linear_units=32, num_blocks=2,
                             cnn_module_kernel=kernel, subsampling=input_layer)
    torch.manual_seed(seed)
    m = ref_encoder_mod.ConformerEncoder(
        input_size=40, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=2, input_layer=input_layer, pos_enc_layer_type="rel_pos",
        normalize_before=True, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=kernel, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        use_dynamic_chunk=True)
    m.eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    # ASRModel's content linear sits outside the encoder (asr_model.py:77-78);
    # identity here — these tests compare raw encoder outputs
    sd["linear.weight"] = np.eye(16, dtype=np.float32)
    sd["linear.bias"] = np.zeros(16, np.float32)
    params = fc.conformer_from_torch(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)
    return m, params, cfg


def test_full_encode_matches_reference(ref_encoder_mod, rng):
    m, params, cfg = build_pair(ref_encoder_mod)
    feats = rng.standard_normal((2, 50, 40)).astype(np.float32)
    lens = np.asarray([50, 41])
    with torch.no_grad():
        # decoding_chunk_size=-1 = full context (0 would sample a random
        # training chunk because use_dynamic_chunk=True)
        ys, masks = m(torch.from_numpy(feats), torch.from_numpy(lens), None,
                      decoding_chunk_size=-1)
    ours, out_lens = fc.conformer_encode(params, cfg, jnp.asarray(feats),
                                         jnp.asarray(lens))
    ref_lens = masks.squeeze(1).sum(-1).numpy()
    np.testing.assert_array_equal(np.asarray(out_lens), ref_lens)
    for b, L in enumerate(ref_lens):
        np.testing.assert_allclose(np.asarray(ours)[b, :L], ys.numpy()[b, :L],
                                   rtol=2e-4, atol=2e-4)


def test_chunk_masked_encode_matches_reference(ref_encoder_mod, rng):
    """decoding_chunk_size / num_decoding_left_chunks path of
    add_optional_chunk_mask (encoder.py:193-199)."""
    m, params, cfg = build_pair(ref_encoder_mod, seed=1)
    feats = rng.standard_normal((1, 50, 40)).astype(np.float32)
    lens = np.asarray([50])
    with torch.no_grad():
        ys, _ = m(torch.from_numpy(feats), torch.from_numpy(lens), None,
                  decoding_chunk_size=4, num_decoding_left_chunks=1)
    ours, _ = fc.conformer_encode(params, cfg, jnp.asarray(feats),
                                  jnp.asarray(lens), chunk_size=4,
                                  num_left_chunks=1)
    np.testing.assert_allclose(np.asarray(ours)[0], ys.numpy()[0],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("left_chunks", [-1, 2])
def test_streaming_matches_reference(ref_encoder_mod, rng, left_chunks):
    """forward_chunk_by_chunk with attention caches and required_cache_size
    trimming must match the reference bit-for-bit (same math, same conv-edge
    approximation)."""
    m, params, cfg = build_pair(ref_encoder_mod, seed=2)
    feats = rng.standard_normal((1, 67, 40)).astype(np.float32)
    with torch.no_grad():
        ys, _ = m.forward_chunk_by_chunk(torch.from_numpy(feats), 4,
                                         num_decoding_left_chunks=left_chunks)
    ours = fc.conformer_encode_chunk_by_chunk(params, cfg, jnp.asarray(feats),
                                              4,
                                              num_decoding_left_chunks=left_chunks)
    assert ours.shape[1] == ys.shape[1]
    np.testing.assert_allclose(np.asarray(ours)[0], ys.numpy()[0],
                               rtol=2e-4, atol=2e-4)
