"""YAML config loading: example.yaml layout -> ModelConfig/TrainConfig.

reference: the Hydra-consumed training YAMLs (src/f5_tts/configs/*.yaml);
this build reads the same keys via f5e_tts_tpu.config.load_yaml /
load_train_yaml, plus a TPU-only `mesh:` section (no reference equivalent).
"""

import os
import textwrap

import pytest

from f5e_tts_tpu.config import load_train_yaml, load_yaml

EXAMPLE = os.path.join(os.path.dirname(__file__), "..", "configs", "example.yaml")


def _write(tmp_path, body):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_example_yaml_roundtrip():
    mc = load_yaml(EXAMPLE)
    assert mc.backbone == "DiT"
    assert mc.arch.dim == 768 and mc.arch.depth == 18
    assert mc.arch.ppg.use_ppg and mc.arch.codebook.use_codebook
    tc = load_train_yaml(EXAMPLE)
    assert tc.learning_rate == pytest.approx(7.5e-5)
    # no mesh section -> defaults (all DP)
    assert (tc.mesh.data, tc.mesh.fsdp, tc.mesh.model, tc.mesh.seq) == (-1, 1, 1, 1)


def test_mesh_section_parses(tmp_path):
    path = _write(tmp_path, """
    optim: {epochs: 3, learning_rate: 1.0e-4}
    mesh: {data: 2, fsdp: 4, model: 2, seq: 1}
    model:
      backbone: DiT
      arch: {dim: 64, depth: 2, heads: 2, text_dim: 32, conv_layers: 1,
             remat_policy: save_attn, checkpoint_activations: true}
    """)
    tc = load_train_yaml(path)
    assert (tc.mesh.data, tc.mesh.fsdp, tc.mesh.model, tc.mesh.seq) == (2, 4, 2, 1)
    mc = load_yaml(path)
    assert mc.arch.remat_policy == "save_attn"
    assert mc.arch.checkpoint_activations


def test_mesh_bare_key_is_defaults(tmp_path):
    # `mesh:` present but empty parses as None — must fall back to defaults
    path = _write(tmp_path, """
    mesh:
    model: {backbone: DiT, arch: {dim: 64, depth: 2, heads: 2}}
    """)
    tc = load_train_yaml(path)
    assert (tc.mesh.data, tc.mesh.fsdp, tc.mesh.model, tc.mesh.seq) == (-1, 1, 1, 1)


def test_mesh_partial_defaults(tmp_path):
    path = _write(tmp_path, """
    mesh: {fsdp: 8}
    model: {backbone: DiT, arch: {dim: 64, depth: 2, heads: 2}}
    """)
    tc = load_train_yaml(path)
    assert (tc.mesh.data, tc.mesh.fsdp, tc.mesh.model, tc.mesh.seq) == (-1, 8, 1, 1)
