"""scripts/parity_check.py self-test: fabricate a tiny artifact set in the
reference's exact layout and drive every stage of the gate end-to-end.

With real artifacts (SWivid safetensors, vocos, WeNet 33.pt) the same command
produces the real parity table; this test proves the gate machinery itself
(ingest, reference-side strict load, per-stage tolerances, checklist +
report) works before those artifacts are available.
"""

import json
import os
import string
import subprocess
import sys

import numpy as np
import jax
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_artifacts(tmp_path, rng):
    from f5e_tts_tpu.config import DiTConfig
    from f5e_tts_tpu.models.dit import init_dit
    from f5e_tts_tpu.utils.torch_ckpt import dit_to_torch
    from tests.test_wenet_ingest import _mk_wenet_ckpt
    from f5e_tts_tpu.models.conformer import ConformerConfig
    import yaml
    from safetensors.numpy import save_file

    # --- vocab (ascii) ---
    mdl = tmp_path / "F5TTS_v1_Base"
    mdl.mkdir()
    chars = [" "] + list(string.ascii_letters) + list(".,'\":-!?")
    (mdl / "vocab.txt").write_text("\n".join(chars) + "\n")

    # --- tiny DiT ckpt in the EMA safetensors layout ---
    cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                    text_dim=32, conv_layers=2, dropout=0.0)
    params, state = init_dit(jax.random.PRNGKey(0), cfg, len(chars))

    def dezero(p):
        return jax.tree.map(
            lambda a: np.asarray(rng.standard_normal(a.shape), np.float32) * 0.05
            if float(np.abs(np.asarray(a)).max()) == 0 else a, p)

    for k in ("proj_out", "norm_out"):
        params[k] = dezero(params[k])
    params["blocks"]["attn_norm"] = dezero(params["blocks"]["attn_norm"])
    sd = dit_to_torch(params, state, cfg, prefix="ema_model.transformer.")
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(mdl / "model_1250000.safetensors"))

    # --- vocos ckpt (pip-package key layout, full-size) ---
    voc = tmp_path / "vocos"
    voc.mkdir()
    vsd = {}

    def t(shape, scale=0.02):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * scale)

    vsd["backbone.embed.weight"] = t((512, 100, 7))
    vsd["backbone.embed.bias"] = t((512,))
    for k in ("backbone.norm", "backbone.final_layer_norm"):
        vsd[f"{k}.weight"] = torch.ones(512)
        vsd[f"{k}.bias"] = torch.zeros(512)
    for i in range(8):
        b = f"backbone.convnext.{i}"
        vsd[f"{b}.dwconv.weight"] = t((512, 1, 7))
        vsd[f"{b}.dwconv.bias"] = t((512,))
        vsd[f"{b}.norm.weight"] = torch.ones(512)
        vsd[f"{b}.norm.bias"] = torch.zeros(512)
        vsd[f"{b}.pwconv1.weight"] = t((1536, 512))
        vsd[f"{b}.pwconv1.bias"] = t((1536,))
        vsd[f"{b}.pwconv2.weight"] = t((512, 1536))
        vsd[f"{b}.pwconv2.bias"] = t((512,))
        vsd[f"{b}.gamma"] = torch.full((512,), 1.0 / 8)
    vsd["head.out.weight"] = t((1026, 512))
    vsd["head.out.bias"] = t((1026,))
    torch.save(vsd, str(voc / "pytorch_model.bin"))

    # --- WeNet ppg artifacts ---
    ppg = tmp_path / "ppg"
    ppg.mkdir()
    ccfg = ConformerConfig(input_dim=80, output_size=32, attention_heads=2,
                           linear_units=64, num_blocks=2, cnn_module_kernel=15,
                           subsampling="conv2d2")
    _mk_wenet_ckpt(str(ppg / "33.pt"), ccfg, rng)
    cmvn = {"mean_stat": list(rng.standard_normal(80) * 10),
            "var_stat": list(np.abs(rng.standard_normal(80)) * 100 + 50),
            "frame_num": 1000}
    (ppg / "global_cmvn").write_text(json.dumps(cmvn))
    conf = {"input_dim": 80, "encoder_conf": {
        "output_size": 32, "attention_heads": 2, "linear_units": 64,
        "num_blocks": 2, "cnn_module_kernel": 15, "input_layer": "conv2d2"},
        "cmvn_file": str(ppg / "global_cmvn"), "is_json_cmvn": True}
    (ppg / "train.yaml").write_text(yaml.safe_dump(conf))
    return tmp_path


def test_parity_gate_end_to_end(tmp_path, rng):
    art = _mk_artifacts(tmp_path, rng)
    report = tmp_path / "report.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_check.py"),
         "--artifacts-dir", str(art), "--arch", "tiny", "--steps", "4",
         "--require-all", "--report", str(report)],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"

    results = {r["stage"]: r for r in json.loads(report.read_text())}
    for stage in ("mel_frontend", "dit_ckpt_keys", "dit_forward_fp32",
                  "cfm_sample_e2e_fp32", "vocos_decode", "wenet_ckpt_keys",
                  "wenet_ppg_extract"):
        assert stage in results, f"stage {stage} missing: {list(results)}"
        assert results[stage]["status"] == "ok", results[stage]

    # every numeric stage must print a real max|err| — no finiteness-only rows
    for stage in ("mel_frontend", "dit_forward_fp32", "cfm_sample_e2e_fp32",
                  "vocos_decode", "wenet_ppg_extract"):
        assert results[stage]["max_abs_err"] is not None, results[stage]
        assert results[stage]["tol"] is not None, results[stage]


def test_parity_gate_checklist_when_artifacts_missing(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_check.py"),
         "--artifacts-dir", str(tmp_path / "nope"), "--require-all"],
        capture_output=True, text=True, env=env, timeout=300)
    assert proc.returncode == 1
    assert "missing artifact" in proc.stdout
    assert "model_1250000.safetensors" in proc.stdout
    assert "33.pt" in proc.stdout
