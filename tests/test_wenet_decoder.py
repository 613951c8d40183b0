"""WeNet attention decoder vs the ACTUAL reference decoder (VERDICT #6):
forward parity (plain + bidirectional), label smoothing, target prep, decode
searches, average_model, recognize round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from f5e_tts_tpu.models import wenet_decoder as wd
from f5e_tts_tpu.models.wenet_decoder import DecoderConfig

from tests.oracle import loader


@pytest.fixture(scope="module")
def ref():
    return loader.load()


CFG = DecoderConfig(vocab_size=30, dim=32, attention_heads=2, linear_units=48,
                    num_blocks=2, r_num_blocks=0)


def _mk_ref_decoder(ref, cfg: DecoderConfig, bidirectional=False, seed=0):
    torch.manual_seed(seed)
    if bidirectional:
        m = ref.wenet_decoder.BiTransformerDecoder(
            vocab_size=cfg.vocab_size, encoder_output_size=cfg.dim,
            attention_heads=cfg.attention_heads, linear_units=cfg.linear_units,
            num_blocks=cfg.num_blocks, r_num_blocks=cfg.r_num_blocks,
            dropout_rate=0.0, positional_dropout_rate=0.0)
    else:
        m = ref.wenet_decoder.TransformerDecoder(
            vocab_size=cfg.vocab_size, encoder_output_size=cfg.dim,
            attention_heads=cfg.attention_heads, linear_units=cfg.linear_units,
            num_blocks=cfg.num_blocks, dropout_rate=0.0,
            positional_dropout_rate=0.0)
    m.eval()
    return m


def _inputs(rng, cfg, b=2, t=12, u=6):
    memory = rng.standard_normal((b, t, cfg.dim)).astype(np.float32)
    memory_lens = np.asarray([t, t - 4], np.int64)
    ys = rng.integers(3, cfg.vocab_size - 1, (b, u)).astype(np.int64)
    ys[1, 4:] = wd.IGNORE_ID
    return memory, memory_lens, ys


def test_decoder_forward_matches_reference(ref, rng):
    m = _mk_ref_decoder(ref, CFG)
    sd = {f"decoder.{k}": v.detach().numpy().astype(np.float32)
          for k, v in m.state_dict().items()}
    params = wd.decoder_from_torch(sd, CFG)

    memory, memory_lens, ys = _inputs(rng, CFG)
    ys_in, ys_out = wd.add_sos_eos(ys, sos=1, eos=2)
    ys_in_lens = (ys != wd.IGNORE_ID).sum(axis=1) + 1

    t_mask = (torch.arange(memory.shape[1])[None]
              < torch.from_numpy(memory_lens)[:, None]).unsqueeze(1)
    with torch.no_grad():
        expect, _, _ = m(torch.from_numpy(memory), t_mask,
                         torch.from_numpy(ys_in.astype(np.int64)),
                         torch.from_numpy(ys_in_lens.astype(np.int64)))
    got, _, olens = wd.decoder_forward(
        jax.tree.map(jnp.asarray, params), CFG, jnp.asarray(memory),
        jnp.asarray(memory_lens), jnp.asarray(ys_in), jnp.asarray(ys_in_lens))
    # padded query rows attend nothing in our mask but garbage-in garbage-out
    # rows differ; compare valid rows only (the loss masks them anyway)
    for i, n in enumerate(ys_in_lens):
        np.testing.assert_allclose(np.asarray(got)[i, :n], expect.numpy()[i, :n],
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(olens), ys_in_lens)


def test_bidecoder_forward_matches_reference(ref, rng):
    cfg = DecoderConfig(vocab_size=30, dim=32, attention_heads=2,
                        linear_units=48, num_blocks=2, r_num_blocks=1)
    m = _mk_ref_decoder(ref, cfg, bidirectional=True)
    sd = {f"decoder.{k}": v.detach().numpy().astype(np.float32)
          for k, v in m.state_dict().items()}
    params = wd.decoder_from_torch(sd, cfg)
    assert "right" in params

    memory, memory_lens, ys = _inputs(rng, cfg)
    ys_lens = (ys != wd.IGNORE_ID).sum(axis=1)
    ys_in, ys_out = wd.add_sos_eos(ys, 1, 2)
    r_ys = wd.reverse_pad_list(ys, ys_lens)
    r_ys_in, r_ys_out = wd.add_sos_eos(r_ys, 1, 2)
    ys_in_lens = ys_lens + 1

    t_mask = (torch.arange(memory.shape[1])[None]
              < torch.from_numpy(memory_lens)[:, None]).unsqueeze(1)
    with torch.no_grad():
        lx, rx, _ = m(torch.from_numpy(memory), t_mask,
                      torch.from_numpy(ys_in.astype(np.int64)),
                      torch.from_numpy(ys_in_lens.astype(np.int64)),
                      torch.from_numpy(r_ys_in.astype(np.int64)),
                      reverse_weight=0.3)
    glx, grx, _ = wd.decoder_forward(
        jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(memory),
        jnp.asarray(memory_lens), jnp.asarray(ys_in), jnp.asarray(ys_in_lens),
        r_ys_in=jnp.asarray(r_ys_in), reverse_weight=0.3)
    for i, n in enumerate(ys_in_lens):
        np.testing.assert_allclose(np.asarray(glx)[i, :n], lx.numpy()[i, :n],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(grx)[i, :n], rx.numpy()[i, :n],
                                   rtol=2e-4, atol=2e-4)


def test_add_sos_eos_and_reverse_match_reference(ref):
    ys = np.asarray([[1, 2, 3, 4, 5], [4, 5, 6, -1, -1], [7, 8, 9, -1, -1]])
    ys_in, ys_out = wd.add_sos_eos(ys, 10, 11)
    t_in, t_out = ref.wenet_common.add_sos_eos(torch.from_numpy(ys), 10, 11, -1)
    np.testing.assert_array_equal(ys_in, t_in.numpy())
    np.testing.assert_array_equal(ys_out, t_out.numpy())

    lens = np.asarray([4, 3, 2])
    x = np.asarray([[1, 2, 3, 4], [5, 6, 7, 0], [8, 9, 0, 0]])
    r = wd.reverse_pad_list(x, lens, 0)
    t_r = ref.wenet_common.reverse_pad_list(torch.from_numpy(x),
                                            torch.from_numpy(lens), 0)
    np.testing.assert_array_equal(r, t_r.numpy())


def test_label_smoothing_matches_reference(ref, rng):
    v = 30
    logits = rng.standard_normal((2, 7, v)).astype(np.float32)
    target = rng.integers(0, v, (2, 7)).astype(np.int64)
    target[1, 4:] = wd.IGNORE_ID
    for normalize_length in (False, True):
        crit = ref.wenet_label_smoothing.LabelSmoothingLoss(
            size=v, padding_idx=wd.IGNORE_ID, smoothing=0.1,
            normalize_length=normalize_length)
        with torch.no_grad():
            expect = crit(torch.from_numpy(logits), torch.from_numpy(target))
        got = wd.label_smoothing_loss(jnp.asarray(logits), jnp.asarray(target),
                                      smoothing=0.1,
                                      normalize_length=normalize_length)
        np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_th_accuracy_matches_reference(ref, rng):
    v = 30
    logits = rng.standard_normal((2, 7, v)).astype(np.float32)
    target = rng.integers(0, v, (2, 7)).astype(np.int64)
    target[1, 4:] = wd.IGNORE_ID
    expect = ref.wenet_common.th_accuracy(
        torch.from_numpy(logits.reshape(-1, v)), torch.from_numpy(target), -1)
    got = float(wd.th_accuracy(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_attention_loss_runs(rng):
    params = wd.init_decoder(jax.random.PRNGKey(0), CFG)
    memory, memory_lens, ys = _inputs(rng, CFG)
    loss, acc = wd.attention_loss(params, CFG, jnp.asarray(memory),
                                  jnp.asarray(memory_lens), ys, sos=1, eos=2)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert 0.0 <= float(acc) <= 1.0


def test_ctc_greedy_search():
    # blank=0; collapse repeats then drop blanks
    logits = np.zeros((1, 6, 4), np.float32)
    for t, tok in enumerate([1, 1, 0, 2, 2, 3]):
        logits[0, t, tok] = 5.0
    assert wd.ctc_greedy_search(logits, np.asarray([6])) == [[1, 2, 3]]
    # length clipping
    assert wd.ctc_greedy_search(logits, np.asarray([2])) == [[1]]


def test_attention_greedy_decode_terminates(rng):
    params = wd.init_decoder(jax.random.PRNGKey(0), CFG)
    memory, memory_lens, _ = _inputs(rng, CFG)
    hyps = wd.attention_greedy_decode(params, CFG, jnp.asarray(memory),
                                      jnp.asarray(memory_lens), sos=1, eos=2,
                                      max_len=8)
    assert len(hyps) == 2
    for h in hyps:
        assert len(h) <= 8
        assert all(t != 2 for t in h)  # eos stripped


def test_average_checkpoints(tmp_path):
    from f5e_tts_tpu.models.wenet_tools import average_checkpoints

    a = {"x": torch.ones(3), "y": torch.zeros(2)}
    b = {"x": torch.full((3,), 3.0), "y": torch.ones(2)}
    torch.save(a, tmp_path / "a.pt")
    torch.save(b, tmp_path / "b.pt")
    avg = average_checkpoints([str(tmp_path / "a.pt"), str(tmp_path / "b.pt")])
    np.testing.assert_allclose(avg["x"], np.full(3, 2.0))
    np.testing.assert_allclose(avg["y"], np.full(2, 0.5))


def test_recognize_roundtrip(tmp_path, rng):
    """recognize_main over a synthetic 33.pt-style checkpoint: ctc greedy +
    attention modes produce hypotheses end-to-end."""
    import json
    import yaml

    from f5e_tts_tpu.models.conformer import ConformerConfig
    from f5e_tts_tpu.models import wenet_tools
    from tests.test_wenet_ingest import _mk_wenet_ckpt

    ccfg = ConformerConfig(input_dim=20, output_size=16, attention_heads=2,
                           linear_units=32, num_blocks=1, cnn_module_kernel=7,
                           subsampling="conv2d")
    _mk_wenet_ckpt(str(tmp_path / "33.pt"), ccfg, rng)
    # append a decoder to the checkpoint
    dcfg = DecoderConfig(vocab_size=12, dim=16, attention_heads=2,
                         linear_units=24, num_blocks=1)
    dparams = wd.init_decoder(jax.random.PRNGKey(1), dcfg)
    sd = torch.load(tmp_path / "33.pt", weights_only=True)
    left = dparams["left"]
    sd["decoder.embed.0.weight"] = torch.from_numpy(np.asarray(left["embed"]["w"]))
    sd["decoder.after_norm.weight"] = torch.from_numpy(np.asarray(left["after_norm"]["g"]))
    sd["decoder.after_norm.bias"] = torch.from_numpy(np.asarray(left["after_norm"]["b"]))
    sd["decoder.output_layer.weight"] = torch.from_numpy(np.asarray(left["output_layer"]["w"]).T.copy())
    sd["decoder.output_layer.bias"] = torch.from_numpy(np.asarray(left["output_layer"]["b"]))
    lay = left["layers"][0]
    for attn in ("self_attn", "src_attn"):
        for n in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[f"decoder.decoders.0.{attn}.{n}.weight"] = torch.from_numpy(
                np.asarray(lay[attn][n]["w"]).T.copy())
            sd[f"decoder.decoders.0.{attn}.{n}.bias"] = torch.from_numpy(
                np.asarray(lay[attn][n]["b"]))
    sd["decoder.decoders.0.feed_forward.w_1.weight"] = torch.from_numpy(
        np.asarray(lay["ff"]["w1"]["w"]).T.copy())
    sd["decoder.decoders.0.feed_forward.w_1.bias"] = torch.from_numpy(
        np.asarray(lay["ff"]["w1"]["b"]))
    sd["decoder.decoders.0.feed_forward.w_2.weight"] = torch.from_numpy(
        np.asarray(lay["ff"]["w2"]["w"]).T.copy())
    sd["decoder.decoders.0.feed_forward.w_2.bias"] = torch.from_numpy(
        np.asarray(lay["ff"]["w2"]["b"]))
    for n in ("norm1", "norm2", "norm3"):
        sd[f"decoder.decoders.0.{n}.weight"] = torch.from_numpy(
            np.asarray(lay[n]["g"]))
        sd[f"decoder.decoders.0.{n}.bias"] = torch.from_numpy(
            np.asarray(lay[n]["b"]))
    torch.save(sd, tmp_path / "33.pt")

    conf = {"input_dim": 20,
            "encoder_conf": {"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 1,
                             "cnn_module_kernel": 7, "input_layer": "conv2d"},
            "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                             "num_blocks": 1}}
    (tmp_path / "train.yaml").write_text(yaml.safe_dump(conf))
    feats = rng.standard_normal((25, 20)).astype(np.float32)
    np.save(tmp_path / "f.npy", feats)
    vocab = "\n".join(f"tok{i} {i}" for i in range(12))
    (tmp_path / "dict.txt").write_text(vocab + "\n")

    for mode in ("ctc_greedy_search", "attention"):
        out = wenet_tools.recognize_main(
            ["--checkpoint", str(tmp_path / "33.pt"),
             "--config", str(tmp_path / "train.yaml"),
             "--feats", str(tmp_path / "f.npy"),
             "--mode", mode, "--dict", str(tmp_path / "dict.txt"),
             "--result_file", str(tmp_path / f"res_{mode}.jsonl")])
        assert len(out) == 1 and isinstance(out[0]["ids"], list)
        line = json.loads((tmp_path / f"res_{mode}.jsonl").read_text().strip())
        assert line["feats"].endswith("f.npy")
