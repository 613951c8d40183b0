"""Structured configuration for every entry point.

The reference uses four coexisting config layers (Hydra YAML for training,
OmegaConf YAML at inference, TOML+argparse for the CLI, plain argparse for
eval/benchmark — reference: src/f5_tts/train/train.py:18,
src/f5_tts/infer/infer_cli.py:176-211). Here a single set of frozen
dataclasses feeds all entry points; YAML/TOML files are parsed into these.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class MelConfig:
    """Log-mel frontend config (reference: src/f5_tts/model/modules.py:104-143)."""

    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 100
    target_sample_rate: int = 24_000
    mel_spec_type: str = "vocos"  # "vocos" (HTK mel, center=True) | "bigvgan" (Slaney mel, center=False)


@dataclass(frozen=True)
class PPGConfig:
    """PPG conditioning path config (reference: src/f5_tts/configs/example.yaml ppg_config)."""

    use_ppg: bool = False
    ppg_dim: int = 256
    use_transformer: bool = False
    transformer_nhead: int = 4
    transformer_dim_feedforward: int = 1024
    transformer_dropout: float = 0.1
    transformer_num_layers: int = 2
    # CFG combined condition-drop table: [keep both, drop text keep ppg,
    # keep text drop ppg, drop everything] (reference: src/f5_tts/model/cfm.py:549-569)
    combined_cond_drop_prob: Tuple[float, float, float, float] = (0.3, 0.1, 0.5, 0.1)
    use_cross_mask: bool = False
    cross_mask_prob: float = 0.5
    # Frozen encoder frame geometry: PPG is 20 ms frames vs 10 ms mel-16k frames
    frame_length: int = 20
    mel_frame_shift: int = 10
    output_type: str = "ppg"  # "ppg" | "map"
    map_mix_ratio: float = 1.0


@dataclass(frozen=True)
class CodebookConfig:
    """Shared Gumbel-VQ codebook regularizer (reference: src/f5_tts/model/backbones/dit.py:296-307)."""

    use_codebook: bool = False
    num_vars: int = 100
    temp_start: float = 2.0
    temp_stop: float = 0.5
    temp_decay: float = 0.999995
    groups: int = 2
    combine_groups: bool = False
    weight_proj_depth: int = 1
    weight_proj_factor: int = 1
    use_perplex_loss: bool = False
    perplex_loss_prob: float = 0.1
    perplex_loss_weight: float = 0.1
    use_align_loss: bool = False
    align_loss_weight: float = 1.0


@dataclass(frozen=True)
class DiTConfig:
    """DiT backbone hyperparameters (reference: src/f5_tts/model/backbones/dit.py:183-271).

    Presets mirror src/f5_tts/train/finetune_cli.py:88-139.
    """

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int = 512
    text_mask_padding: bool = True
    qk_norm: Optional[str] = None  # None | "rms_norm"
    conv_layers: int = 4
    pe_attn_head: Optional[int] = None  # rope only on first N heads (F5TTS_Base legacy)
    long_skip_connection: bool = False
    checkpoint_activations: bool = False
    # remat policy when checkpoint_activations: "block" recomputes the whole
    # block in the backward; "save_attn" additionally saves each block's
    # attention output (B*N*dim bf16 per layer, ~41 MB at Base b12 n1664) so
    # the backward recompute skips the attention kernel — measured ~10% step
    # win at Base (the kernel is VPU-softmax-bound, the priciest recompute).
    # "save_attn_ff" also saves the FF gelu activation (2x the attn_out
    # bytes) skipping the ff1+gelu recompute — use when the batch still fits.
    remat_policy: str = "block"
    dropout: float = 0.1
    ppg: PPGConfig = field(default_factory=PPGConfig)
    codebook: CodebookConfig = field(default_factory=CodebookConfig)
    # TPU additions
    max_pos: int = 4096  # precomputed abs/rope position table length (~44 s @ 24 kHz hop 256)
    # lax.scan unroll over the depth axis (1 = off). XLA keeps the scan
    # carry + stacked per-layer params in a while-loop tuple; unrolling N
    # blocks per iteration halves/quarters the loop round trips (same lever
    # as CFMConfig.ode_unroll for the NFE loop) at N x the traced block's
    # compile size. Numerically equivalent but NOT bitwise: XLA re-fuses
    # across unrolled blocks at ulp level (measured max|err| ~4e-9 fp32).
    scan_unroll: int = 1


@dataclass(frozen=True)
class UNetTConfig:
    """UNetT (E2-TTS flat UNet transformer) hyperparameters
    (reference: src/f5_tts/model/backbones/unett.py:106-250)."""

    dim: int = 1024
    depth: int = 24
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: Optional[int] = None  # None -> mel_dim
    text_mask_padding: bool = False
    qk_norm: Optional[str] = None
    conv_layers: int = 0
    pe_attn_head: Optional[int] = 1
    skip_connect_type: str = "concat"  # "none" | "add" | "concat"
    dropout: float = 0.1
    max_pos: int = 4096
    scan_unroll: int = 1  # depth-scan unroll, see DiTConfig.scan_unroll


@dataclass(frozen=True)
class MMDiTConfig:
    """MMDiT (SD3-style dual stream) hyperparameters
    (reference: src/f5_tts/model/backbones/mmdit.py:84-188)."""

    dim: int = 1024
    depth: int = 8
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_depth: int = 0  # unused placeholder for parity with upstream kwargs
    qk_norm: Optional[str] = None
    dropout: float = 0.1
    max_pos: int = 4096
    scan_unroll: int = 1  # depth-scan unroll, see DiTConfig.scan_unroll


@dataclass(frozen=True)
class CFMConfig:
    """Conditional flow matching wrapper config (reference: src/f5_tts/model/cfm.py:34-87)."""

    sigma: float = 0.0
    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: Tuple[float, float] = (0.7, 1.0)
    ode_method: str = "euler"  # "euler" | "midpoint"
    # lax.scan unroll for the NFE loop: >1 passes the carry between unrolled
    # bodies without a loop-tuple round trip (XLA inserts per-iteration
    # layout copies of the (K*B, N, mel) carry that grow superlinearly with
    # batch — 329 ms at bs=8/NFE32 in the round-3 duty trace). Bitwise
    # identical output; pure scheduling lever.
    ode_unroll: int = 1


@dataclass(frozen=True)
class InferConfig:
    """Inference defaults (reference: src/f5_tts/infer/utils_infer.py:49-62)."""

    nfe_steps: int = 32
    cfg_strength: float = 2.0
    sway_sampling_coef: float = -1.0
    speed: float = 1.0
    max_duration: int = 4096
    cross_fade_duration: float = 0.15
    target_rms: float = 0.1


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes for GSPMD. data = DP, fsdp = ZeRO-3-style fully
    sharded DP (params/grads/optimizer state sharded, all-gathered per layer),
    model = TP, seq = SP/CP. Batches shard over (data, fsdp) jointly."""

    data: int = -1  # -1: all remaining devices
    fsdp: int = 1
    model: int = 1
    seq: int = 1
    pipe: int = 1  # pipeline stages over transformer depth (GPipe)


@dataclass(frozen=True)
class TrainConfig:
    """Training loop config (reference: src/f5_tts/model/trainer.py:25-141 +
    src/f5_tts/configs/example.yaml optim/ckpts sections)."""

    epochs: int = 100
    learning_rate: float = 7.5e-5
    num_warmup_updates: int = 20_000
    # `update` counts OPTIMIZER updates (micro-steps / accumulation), exactly
    # like the reference's global_update (trainer.py:416); save/log cadence,
    # EMA gating and the LR schedule all run in update units.
    grad_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    # 8-bit Adam moments (reference: trainer.py:134-137 bnb.optim.AdamW8bit
    # behind `bnb_optimizer`; here train/adamw8bit.py, int8 block quantization)
    bnb_optimizer: bool = False
    batch_size_per_device: int = 19_200
    batch_size_type: str = "frame"  # "frame" | "sample"
    max_samples: int = 64
    # EMA — ema_pytorch defaults, which the reference trainer uses unmodified
    # (trainer.py:104 EMA(model, include_online_model=False)): the decay RAMPS
    # as 1 - (1 + step/inv_gamma)^(-power) clamped to [min_value, beta]; the
    # first update_after_step updates hard-copy online -> ema; gated to every
    # `update_every` updates. Checkpoints ship EMA-only weights, so this
    # schedule is training-parity-critical.
    ema_beta: float = 0.9999
    ema_update_after_step: int = 100
    ema_update_every: int = 10
    ema_inv_gamma: float = 1.0
    ema_power: float = 2.0 / 3.0
    # GPipe microbatch count when mesh.pipe > 1 (None -> one per stage)
    pp_microbatches: Optional[int] = None
    ema_min_value: float = 0.0
    save_per_updates: int = 50_000
    last_per_updates: int = 5_000
    keep_last_n_checkpoints: int = -1
    log_samples_per_updates: int = 10_000
    save_dir: str = "ckpts"
    logger: Optional[str] = None  # "tensorboard" | None (wandb not bundled)
    seed: int = 666
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # PRNG implementation for training rngs: "rbg" swaps threefry for the
    # TPU-native hardware RBG (jax_default_prng_impl). Dropout draws
    # B x N x dim bits per layer x2 per pass; threefry computes them on the
    # VPU, rbg is near-free. Bit-different masks, statistically equivalent.
    prng_impl: str = "default"  # "default" (threefry) | "rbg"


@dataclass(frozen=True)
class ModelConfig:
    """Top-level model bundle: backbone + mel + cfm + tokenizer."""

    name: str = "F5TTS_v1_Base"
    backbone: str = "DiT"  # "DiT" | "UNetT" | "MMDiT"
    tokenizer: str = "pinyin"
    tokenizer_path: Optional[str] = None
    vocab_size: int = 2545  # F5TTS_v1_Base vocab.txt size; overridden by tokenizer load
    arch: Any = field(default_factory=DiTConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    cfm: CFMConfig = field(default_factory=CFMConfig)
    infer: InferConfig = field(default_factory=InferConfig)


def _build(cls, data: dict):
    """Recursively build a dataclass from a plain dict, ignoring unknown keys."""
    if not dataclasses.is_dataclass(cls):
        return data
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            continue
        ftype = fields[key].type
        default = fields[key].default_factory() if fields[key].default_factory is not dataclasses.MISSING else None  # type: ignore[misc]
        if isinstance(value, dict) and default is not None and dataclasses.is_dataclass(default):
            kwargs[key] = _build(type(default), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


# Architecture presets (reference: src/f5_tts/train/finetune_cli.py:88-139)
def preset(name: str) -> ModelConfig:
    if name == "F5TTS_v1_Base":
        return ModelConfig(
            name=name,
            backbone="DiT",
            arch=DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512, conv_layers=4),
        )
    if name == "F5TTS_Base":
        return ModelConfig(
            name=name,
            backbone="DiT",
            arch=DiTConfig(
                dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                text_mask_padding=False, conv_layers=4, pe_attn_head=1,
            ),
        )
    if name == "F5TTS_Small":
        return ModelConfig(
            name=name,
            backbone="DiT",
            arch=DiTConfig(
                dim=768, depth=18, heads=12, ff_mult=2, text_dim=512,
                text_mask_padding=False, conv_layers=4, pe_attn_head=1,
                checkpoint_activations=True,  # example.yaml arch default
            ),
        )
    if name == "E2TTS_Base":
        return ModelConfig(
            name=name,
            backbone="UNetT",
            arch=UNetTConfig(dim=1024, depth=24, heads=16, ff_mult=4,
                             text_mask_padding=False, pe_attn_head=1),
        )
    raise ValueError(f"unknown preset {name!r}")


def load_yaml(path: str) -> ModelConfig:
    """Load a training/inference YAML (example.yaml layout) into a ModelConfig."""
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    model = raw.get("model", raw)
    arch_cls = {"DiT": DiTConfig, "UNetT": UNetTConfig, "MMDiT": MMDiTConfig}[model.get("backbone", "DiT")]
    arch_raw = dict(model.get("arch", {}))
    if "ppg_config" in model or "use_ppg" in model:
        ppg_raw = dict(model.get("ppg_config", {}))
        ppg_raw["use_ppg"] = model.get("use_ppg", False)
        if "dim" in ppg_raw:
            ppg_raw["ppg_dim"] = ppg_raw.pop("dim")
        arch_raw["ppg"] = ppg_raw
    if "codebook_config" in model or "use_codebook" in model:
        cb_raw = dict(model.get("codebook_config", {}))
        cb_raw["use_codebook"] = model.get("use_codebook", False)
        if "codebook_prob" in cb_raw:
            cb_raw["perplex_loss_prob"] = cb_raw.pop("codebook_prob")
            cb_raw["use_perplex_loss"] = True
        if "codebook_loss_weight" in cb_raw:
            cb_raw["perplex_loss_weight"] = cb_raw.pop("codebook_loss_weight")
        arch_raw["codebook"] = cb_raw
    arch = _build(arch_cls, arch_raw)
    mel = _build(MelConfig, model.get("mel_spec", {}))
    return ModelConfig(
        name=model.get("name", "custom"),
        backbone=model.get("backbone", "DiT"),
        tokenizer=model.get("tokenizer", "pinyin"),
        tokenizer_path=model.get("tokenizer_path"),
        arch=arch,
        mel=mel,
    )


def load_train_yaml(path: str):
    """Load the optim/ckpts/datasets sections of a training YAML into TrainConfig."""
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    optim = raw.get("optim", {})
    ckpts = raw.get("ckpts", {})
    ds = raw.get("datasets", {})
    # optional mesh section (no reference equivalent — Accelerate DDP is the
    # only upstream layout):  mesh: {data: -1, fsdp: 1, model: 1, seq: 1}
    mesh_raw = raw.get("mesh") or {}  # a bare `mesh:` key parses as None
    mesh = MeshConfig(
        data=mesh_raw.get("data", -1), fsdp=mesh_raw.get("fsdp", 1),
        model=mesh_raw.get("model", 1), seq=mesh_raw.get("seq", 1),
        pipe=mesh_raw.get("pipe", 1))
    return TrainConfig(
        mesh=mesh,
        epochs=optim.get("epochs", 100),
        learning_rate=optim.get("learning_rate", 7.5e-5),
        num_warmup_updates=optim.get("num_warmup_updates", 20_000),
        grad_accumulation_steps=optim.get("grad_accumulation_steps", 1),
        max_grad_norm=optim.get("max_grad_norm", 1.0),
        bnb_optimizer=optim.get("bnb_optimizer", False),
        batch_size_per_device=ds.get("batch_size_per_gpu", 19_200),
        batch_size_type=ds.get("batch_size_type", "frame"),
        max_samples=ds.get("max_samples", 64),
        save_per_updates=ckpts.get("save_per_updates", 50_000),
        last_per_updates=ckpts.get("last_per_updates", 5_000),
        keep_last_n_checkpoints=ckpts.get("keep_last_n_checkpoints", -1),
        log_samples_per_updates=ckpts.get("log_samples_per_updates", 10_000),
        save_dir=ckpts.get("save_dir", "ckpts"),
        logger=ckpts.get("logger"),
    )
