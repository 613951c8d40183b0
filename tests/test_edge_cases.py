"""Edge-case coverage: text longer than mel, single-frame spans, extreme
durations, empty vocab entries, zero-length inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f5e_tts_tpu.config import CFMConfig, DiTConfig
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.models import dit as fdit
from f5e_tts_tpu.utils.masks import mask_from_frac_lengths

TINY = DiTConfig(dim=32, depth=1, heads=1, dim_head=32, ff_mult=2, mel_dim=8,
                 text_dim=16, conv_layers=1, dropout=0.0)
VOCAB = 10


@pytest.fixture(scope="module")
def model():
    return fdit.init_dit(jax.random.PRNGKey(0), TINY, VOCAB)


def test_text_longer_than_mel(model, rng):
    """Text curtails to the mel length (dit.py:59)."""
    params, state = model
    b, n = 1, 8
    x = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (b, 30)).astype(np.int32))  # longer than n
    pred, _ = fdit.dit_forward(params, state, TINY, x=x, cond=x, text_ids=text,
                               time=jnp.asarray([0.5]), drop_audio_cond=jnp.zeros((b,), bool),
                               drop_text=jnp.zeros((b,), bool), drop_ppg=jnp.zeros((b,), bool),
                               compute_dtype=jnp.float32)
    assert pred.shape == (b, n, TINY.mel_dim)
    assert np.isfinite(np.asarray(pred)).all()


def test_cfm_loss_seq_len_one_span():
    """frac mask with tiny sequences stays valid."""
    key = jax.random.PRNGKey(0)
    m = mask_from_frac_lengths(key, jnp.asarray([1, 2]), jnp.asarray([1.0, 0.7]), 4)
    assert int(m[0].sum()) == 1
    assert np.isfinite(np.asarray(m, np.float32)).all()


def test_sampler_duration_equals_ref_len(model, rng):
    """duration == ref length + 1 (minimum generation, cfm.py:403-406 floor)."""
    params, state = model
    cond = jnp.asarray(rng.standard_normal((1, 16, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, VOCAB, (1, 4)).astype(np.int32))
    inputs = fcfm.prepare_inputs(cond, jnp.asarray([15]), jnp.asarray([16]), 16,
                                 text_ids=text)
    out, _ = fcfm.sample(params, state, TINY, CFMConfig(), inputs, jax.random.PRNGKey(1),
                         steps=1, cfg_strength=0.0, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()


def test_edit_mask_all_kept(model, rng):
    """edit_mask == all True means nothing is regenerated inside the prompt."""
    params, state = model
    cond = jnp.asarray(rng.standard_normal((1, 16, TINY.mel_dim)).astype(np.float32))
    em = jnp.ones((1, 16), bool)
    inputs = fcfm.prepare_inputs(cond, jnp.asarray([16]), jnp.asarray([16]), 16,
                                 text_ids=jnp.zeros((1, 4), jnp.int32), edit_mask=em)
    out, _ = fcfm.sample(params, state, TINY, CFMConfig(), inputs, jax.random.PRNGKey(2),
                         steps=1, cfg_strength=0.0, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(inputs.cond), atol=1e-6)


def test_chunk_text_single_long_word():
    from f5e_tts_tpu.infer.pipeline import chunk_text

    # no sentence boundary at all — one oversized chunk survives
    text = "a" * 500
    chunks = chunk_text(text, max_chars=100)
    assert len(chunks) == 1 and chunks[0] == text


def test_collate_single_item():
    from f5e_tts_tpu.config import MelConfig
    from f5e_tts_tpu.data.dataset import collate
    from f5e_tts_tpu.utils.text import list_str_to_idx

    mel = MelConfig(hop_length=64, target_sample_rate=8000, n_mel_channels=8)
    vocab = {" ": 0, "a": 1}
    batch = collate([{"audio": np.zeros(640, np.float32), "text": "a"}],
                    lambda t: list_str_to_idx([list(x) for x in t], vocab), mel,
                    len_multiple=32, text_multiple=8)
    assert batch["audio"].shape[0] == 1
    assert batch["text_ids"].shape == (1, 8)
    assert batch["mel_lens"][0] > 0
