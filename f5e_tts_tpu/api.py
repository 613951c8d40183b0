"""Python API: the `F5TTS` class.

reference: src/f5_tts/api.py:23-149. Loads a model preset/config + checkpoint +
vocoder and exposes `infer(ref_file, ref_text, gen_text, ...)`.

Model weights: pass explicit local paths (`ckpt_file`, `vocoder_path`,
`vocab_file`) — there is no HuggingFace auto-download in this offline build;
the reference's checkpoints (SWivid/F5-TTS safetensors, charactr/vocos) load
directly once present on disk.
"""

from __future__ import annotations

import random
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.config import CFMConfig, ModelConfig, load_yaml, preset
from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.infer.pipeline import TTSEngine
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.models.vocos import VocosConfig, init_vocos, load_vocos, vocos_decode
from f5e_tts_tpu.utils import text as ftext
from f5e_tts_tpu.utils.torch_ckpt import backbone_from_torch, load_torch_state_dict


def load_vocoder(vocoder_path: Optional[str] = None, compute_dtype=jnp.bfloat16):
    """Vocos decoder callable. Random-init fallback when no weights are given
    (reference downloads charactr/vocos-mel-24khz, utils_infer.py:101-124)."""
    cfg = VocosConfig()
    if vocoder_path:
        params = jax.tree.map(jnp.asarray, load_vocos(vocoder_path, cfg))
    else:
        params = init_vocos(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(compute_dtype), params)

    # jit with params as an ARGUMENT (closing over them would embed ~50 MB of
    # constants per compile — HTTP 413 on the remote-compile path). Unjitted,
    # the decode ran op-by-op: 131 ms per serving batch vs 0.1 ms compiled.
    jitted = jax.jit(lambda p, m: vocos_decode(p, cfg, m, compute_dtype=compute_dtype))

    def decode(mel):
        return np.asarray(jitted(params, jnp.asarray(mel, compute_dtype)), np.float32)

    # device-resident variant: mel stays on device, the wav comes back as a
    # device array the caller blocks/fetches itself. The serving batcher uses
    # this to vocode straight from the sampler output without the
    # mel fetch -> host slice -> re-upload round trip (~2x the generated
    # mel bytes over the device link per batch).
    decode.device = lambda mel_dev: jitted(params, mel_dev.astype(compute_dtype))

    # fused slice+vocode: ONE dispatch extracts each row's generated window
    # from the padded sampler output AND decodes it (dispatch round trips are
    # ~10-20 ms each through a tunneled device; XLA also fuses the mask into
    # the vocoder's first ops instead of materializing the sliced mel).
    # Returns (wav_dev, mel_dev) — fetch only what the caller needs.
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("L",))
    def _sliced(p, out, starts, gen_lens, L):
        from f5e_tts_tpu.infer.pipeline import slice_gen_core

        mel = slice_gen_core(out, starts, gen_lens, L)
        return vocos_decode(p, cfg, mel.astype(compute_dtype),
                            compute_dtype=compute_dtype), mel

    decode.device_sliced = lambda out, starts, gen_lens, L: _sliced(
        params, out, starts, gen_lens, L)

    # int16 wire variant: quantize the wav to pcm16 ON DEVICE inside the same
    # fused dispatch, so the device->host fetch moves HALF the bytes. Through
    # a tunneled device (~14 MB/s) the wav fetch dominates end-to-end serving
    # RTF; pcm16 keeps >96 dB SNR — inaudible for speech. Opt-in via
    # DynamicBatcher(wire_dtype="int16").
    @_partial(jax.jit, static_argnames=("L",))
    def _sliced_i16(p, out, starts, gen_lens, L):
        from f5e_tts_tpu.infer.pipeline import slice_gen_core

        mel = slice_gen_core(out, starts, gen_lens, L)
        wav = vocos_decode(p, cfg, mel.astype(compute_dtype),
                           compute_dtype=compute_dtype)
        wav_i16 = jnp.clip(jnp.round(wav.astype(jnp.float32) * 32767.0),
                           -32768, 32767).astype(jnp.int16)
        return wav_i16, mel

    decode.device_sliced_i16 = lambda out, starts, gen_lens, L: _sliced_i16(
        params, out, starts, gen_lens, L)
    return decode


class F5TTS:
    """reference: api.py:23-149 (same call surface, TPU/JAX execution)."""

    def __init__(
        self,
        model: str = "F5TTS_v1_Base",
        ckpt_file: str = "",
        vocab_file: str = "",
        ode_method: str = "euler",
        use_ema: bool = True,
        vocoder_local_path: Optional[str] = None,
        config_file: Optional[str] = None,
        compute_dtype=jnp.bfloat16,
        engine_dir: Optional[str] = None,
        asr_model: Optional[str] = None,  # local whisper dir (or F5E_ASR_MODEL)
        model_cfg: Optional[dict] = None,  # arch overrides for custom ckpts
        quantize: Optional[str] = None,  # "int8": W8A8 DiT trunk (ops/quant.py)
    ):
        self.asr_model = asr_model
        self.model_cfg: ModelConfig = load_yaml(config_file) if config_file else preset(model)
        arch = self.model_cfg.arch
        if model_cfg:
            # custom-model arch overrides, e.g. {"dim": 1024, "depth": 22, ...}
            # (reference: infer_gradio.py:75-95 load_custom model_cfg json)
            import dataclasses as _dc

            known = {f.name for f in _dc.fields(arch)}
            arch = _dc.replace(arch, **{k: v for k, v in model_cfg.items()
                                        if k in known})
        self.target_sample_rate = self.model_cfg.mel.target_sample_rate

        if vocab_file:
            vocab, vocab_size = ftext.get_tokenizer(vocab_file, "custom")
            tokenizer = "custom"
        elif self.model_cfg.tokenizer == "g2p-mix":
            vocab, vocab_size = ftext.get_tokenizer("", "g2p-mix")
            tokenizer = "g2p-mix"
        else:
            vocab, vocab_size = None, self.model_cfg.vocab_size
            tokenizer = self.model_cfg.tokenizer

        if ckpt_file:
            sd = load_torch_state_dict(ckpt_file, use_ema=use_ema)
            params, state = backbone_from_torch(sd, arch)
            params = jax.tree.map(jnp.asarray, params)
            state = jax.tree.map(jnp.asarray, state)
        else:
            params, state = fbb.init_backbone(jax.random.PRNGKey(0), arch, vocab_size)
        params = jax.tree.map(
            lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, params)
        if quantize == "int8":
            # EXPERIMENTAL single-chip serving path: int8 MXU for the
            # backbone's big matmuls (2x bf16 peak on v5e); not TP-shardable
            from f5e_tts_tpu.ops.quant import quantize_backbone_params

            params = quantize_backbone_params(params, self.model_cfg.backbone)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r} (use 'int8')")

        cfm = CFMConfig(ode_method=ode_method)
        # pinyin tokenizer needs a vocab map; fall back to char when absent
        if vocab is None and tokenizer in ("pinyin", "char"):
            tokenizer = "byte"

        self.engine = TTSEngine(
            params=params, state=state, arch=arch, vocab=vocab,
            mel=self.model_cfg.mel, cfm=cfm, infer_cfg=self.model_cfg.infer,
            tokenizer=tokenizer,
            vocoder_decode=load_vocoder(vocoder_local_path, compute_dtype),
            compute_dtype=compute_dtype,
            engine_dir=engine_dir,
            use_intersperse=(arch.codebook.use_align_loss or arch.ppg.use_cross_mask)
            if hasattr(arch, "codebook") else False,
        )
        self.seed: Optional[int] = None

    def transcribe(self, ref_audio: str, language: Optional[str] = None,
                   asr_model_path: Optional[str] = None) -> str:
        """Transcribe a reference audio file (reference: api.py:87-88) via the
        shared lazy Whisper pipeline (infer/transcribe.py). Local weights from
        asr_model_path, the constructor's asr_model, or F5E_ASR_MODEL."""
        from f5e_tts_tpu.infer.transcribe import transcribe as _transcribe

        return _transcribe(ref_audio, language=language,
                           model_dir=asr_model_path or self.asr_model)

    def export_wav(self, wav: np.ndarray, file_wave: str, remove_silence: bool = False):
        if remove_silence:
            wav = faudio.remove_silence_edges(wav, self.target_sample_rate)
        faudio.write_wav(file_wave, wav, self.target_sample_rate)

    def export_spectrogram(self, spec: np.ndarray, file_spec: str):
        """Save (N, mel) log-mel to .npy (matplotlib is not bundled)."""
        np.save(file_spec, spec)

    def infer(
        self,
        ref_file: str,
        ref_text: str,
        gen_text: str,
        *,
        target_rms: float = 0.1,
        cross_fade_duration: float = 0.15,
        sway_sampling_coef: float = -1.0,
        cfg_strength: float = 2.0,
        nfe_step: int = 32,
        speed: float = 1.0,
        fix_duration: Optional[float] = None,
        remove_silence: bool = False,
        file_wave: Optional[str] = None,
        file_spec: Optional[str] = None,
        seed: Optional[int] = None,
        timesteps: Optional[tuple] = None,  # EPSS/custom ODE grid
    ):
        if seed is None:
            seed = random.randint(0, 2**31 - 1)
        self.seed = seed

        wav, sr = faudio.read_wav(ref_file)
        # reference api.py preprocesses the ref (silence clip + punctuation +
        # auto-transcription when ref_text is empty, utils_infer.py:293-361)
        from f5e_tts_tpu.infer.pipeline import preprocess_ref_audio_text
        from f5e_tts_tpu.infer.transcribe import make_cached_transcriber

        self._transcriber = getattr(self, "_transcriber", None) or \
            make_cached_transcriber(self.asr_model)
        wav, ref_text = preprocess_ref_audio_text(
            wav, sr, ref_text, transcribe=self._transcriber)
        out, sr, spec = self.engine.infer(
            wav, sr, ref_text, gen_text, seed=seed, speed=speed,
            fix_duration=fix_duration, nfe_steps=nfe_step, cfg_strength=cfg_strength,
            sway=sway_sampling_coef, cross_fade_duration=cross_fade_duration,
            timesteps=timesteps)
        if file_wave is not None:
            self.export_wav(out, file_wave, remove_silence)
        if file_spec is not None:
            self.export_spectrogram(spec, file_spec)
        return out, sr, spec
