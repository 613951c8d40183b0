"""Inference orchestration: the `infer_process` equivalent.

reference: src/f5_tts/infer/utils_infer.py:367-556. Host-side dynamics (text
chunking, byte-ratio duration estimate, cross-fade stitching) stay in Python;
each chunk's synthesis is ONE jitted sampler call on a static duration bucket,
so XLA compiles once per bucket and every subsequent utterance in that bucket
is compile-free (the reference's TRT engine achieves this with one fixed max
shape; buckets give us the same without wasting FLOPs on short text).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.config import CFMConfig, DiTConfig, InferConfig, MelConfig
from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.ops.mel import mel_spectrogram
from f5e_tts_tpu.utils import text as ftext


def chunk_text(text: str, max_chars: int = 135) -> List[str]:
    """Split text at sentence boundaries into <= max_chars (utf-8 bytes) chunks.

    reference: utils_infer.py:70-97.
    """
    chunks: List[str] = []
    current = ""
    sentences = re.split(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])", text)
    for sentence in sentences:
        if len(current.encode("utf-8")) + len(sentence.encode("utf-8")) <= max_chars:
            current += sentence + " " if sentence and len(sentence[-1].encode("utf-8")) == 1 else sentence
        else:
            if current:
                chunks.append(current.strip())
            current = sentence + " " if sentence and len(sentence[-1].encode("utf-8")) == 1 else sentence
    if current:
        chunks.append(current.strip())
    return chunks


def estimate_duration(ref_audio_len: int, ref_text: str, gen_text: str,
                      speed: float = 1.0, fix_duration: Optional[float] = None,
                      sample_rate: int = 24_000, hop_length: int = 256) -> int:
    """Frame-count estimate from byte-length ratio (utils_infer.py:464-471)."""
    if fix_duration is not None:
        return int(fix_duration * sample_rate / hop_length)
    if len(gen_text.encode("utf-8")) < 10:
        speed = 0.3  # very short text slows down (utils_infer.py:457-459)
    ref_bytes = max(len(ref_text.encode("utf-8")), 1)
    gen_bytes = len(gen_text.encode("utf-8"))
    return ref_audio_len + int(ref_audio_len / ref_bytes * gen_bytes / speed)


# 256-frame rungs through the common serving range (~2.7 s per 256 frames),
# coarser beyond: masked padding frames still cost sampler FLOPs, so a
# missing rung taxes every request that lands just above the previous one
# (e.g. duration 1130 on a 1024->1536 ladder pays 26% padding compute).
# More rungs = more one-time warm-up compiles (persist via
# --compilation_cache / engine files).
DEFAULT_BUCKETS = (256, 512, 768, 1024, 1280, 1536, 1792, 2048, 3072, 4096)


def pick_bucket(duration: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest static bucket >= duration (cap at the largest)."""
    for b in buckets:
        if duration <= b:
            return b
    return buckets[-1]


def slice_gen_core(out, starts, gen_lens, L: int):
    """Traceable core of slice_gen (composable into larger jitted graphs,
    e.g. the fused slice+vocode dispatch in api.load_vocoder)."""
    floor = jnp.float32(float(np.log(1e-5)))
    opad = jnp.pad(out.astype(jnp.float32), ((0, 0), (0, L), (0, 0)))
    g = jax.vmap(
        lambda o, s: jax.lax.dynamic_slice(o, (s, 0), (L, o.shape[-1]))
    )(opad, starts)
    idx = jnp.arange(L)[None, :, None]
    return jnp.where(idx < gen_lens[:, None, None], g, floor)


@partial(jax.jit, static_argnames=("L",))
def slice_gen(out, starts, gen_lens, L: int):
    """Device-side window extract: row i yields out[i, starts[i]:starts[i]+L],
    frames past gen_lens[i] replaced by the mel silence floor (ops/mel.py
    clamp). Keeps the generated mel on device so the vocoder can run without
    a host round trip; one compile per (batch, bucket, L). Used by both the
    serving batcher finish and the direct infer path."""
    return slice_gen_core(out, starts, gen_lens, L)


def cross_fade_stitch(waves: List[np.ndarray], sr: int, cross_fade_duration: float) -> np.ndarray:
    """Linear cross-fade concatenation (utils_infer.py:520-556)."""
    if not waves:
        return np.zeros(0, np.float32)
    if cross_fade_duration <= 0:
        return np.concatenate(waves)
    final = waves[0]
    for nxt in waves[1:]:
        n = int(cross_fade_duration * sr)
        n = min(n, len(final), len(nxt))
        if n <= 0:
            final = np.concatenate([final, nxt])
            continue
        fade_out = np.linspace(1.0, 0.0, n)
        fade_in = np.linspace(0.0, 1.0, n)
        overlap = final[-n:] * fade_out + nxt[:n] * fade_in
        final = np.concatenate([final[:-n], overlap, nxt[n:]])
    return final.astype(np.float32)


class CachedTranscriber:
    """Wraps an ASR callable with an audio-hash keyed cache.

    reference: utils_infer.py:148-179, 334-348 — the reference caches Whisper
    transcriptions by the md5 of the (clipped) reference audio so repeated
    calls with the same prompt skip ASR.
    """

    def __init__(self, transcribe):
        self._transcribe = transcribe
        self._cache: dict = {}

    def __call__(self, wav: np.ndarray, sr: int) -> str:
        import hashlib

        key = hashlib.md5(np.ascontiguousarray(wav, np.float32).tobytes()).hexdigest()
        if key not in self._cache:
            self._cache[key] = self._transcribe(wav, sr)
        return self._cache[key]


def preprocess_ref_audio_text(
    wav: np.ndarray,
    sr: int,
    ref_text: str = "",
    *,
    clip_short: bool = True,
    transcribe=None,  # optional callable(path_or_wav, sr) -> str
    show_info=print,
) -> Tuple[np.ndarray, str]:
    """Reference-audio preparation (reference: utils_infer.py:293-361):

    - clip to <= 12 s at a silence boundary (search long then short silences,
      else hard cut at 12 s),
    - trim trailing silence off the clip edge,
    - auto-transcribe when ref_text is empty (requires an ASR callable — the
      reference lazily loads Whisper-large-v3-turbo; offline builds must pass
      one in, otherwise an error is raised),
    - ensure terminating punctuation ('. ' appended, reference :353-360).
    """
    from f5e_tts_tpu.infer.audio import detect_leading_silence, remove_silence_edges

    max_samples = 12 * sr
    if clip_short and len(wav) > max_samples:
        clipped = None
        # prefer cutting at a long (>=500ms) silence after 6s, else short
        for thresh_ms in (500, 200):
            pos = 6 * sr
            step = int(0.05 * sr)
            best = None
            while pos < min(len(wav), max_samples):
                lead = detect_leading_silence(wav[pos:], sr)
                if lead >= int(thresh_ms / 1000 * sr):
                    best = pos
                    break
                pos += step
            if best is not None:
                clipped = wav[:best]
                break
        if clipped is None:
            show_info("no proper silence found for clipping, hard cut at 12s")
            clipped = wav[:max_samples]
        else:
            show_info(f"ref audio clipped to {len(clipped) / sr:.1f}s at a silence")
        wav = remove_silence_edges(clipped, sr)

    if not ref_text.strip():
        if transcribe is None:
            raise RuntimeError(
                "ref_text is empty and no ASR transcriber was provided "
                "(the reference auto-transcribes with Whisper; pass "
                "transcribe=... with local ASR weights in this offline build)")
        ref_text = transcribe(wav, sr)
        show_info(f"transcribed ref text: {ref_text}")

    ref_text = ref_text.strip()
    if not ref_text.endswith((".", "。")):
        ref_text += ". " if ref_text.endswith('"') else ". "
    elif ref_text.endswith("."):
        ref_text += " "
    return wav, ref_text


@dataclass
class TTSEngine:
    """Holds model params + configs and serves synthesis requests.

    The reference equivalent is the (load_model -> infer_process) pair of
    utils_infer.py plus the F5TTS api class (api.py:23-149).
    """

    params: dict
    state: dict
    arch: DiTConfig
    vocab: dict
    mel: MelConfig = field(default_factory=MelConfig)
    cfm: CFMConfig = field(default_factory=CFMConfig)
    infer_cfg: InferConfig = field(default_factory=InferConfig)
    tokenizer: str = "pinyin"
    vocoder_decode: Optional[Callable[[jnp.ndarray], np.ndarray]] = None
    compute_dtype: object = jnp.bfloat16
    buckets: Sequence[int] = DEFAULT_BUCKETS
    text_pad_to: int = 32  # text length bucket granularity (compile stability)
    use_intersperse: bool = False  # align-loss/cross-mask models intersperse text
    # directory of jax.export engine files (utils/aot.py export_sampler_buckets);
    # matching buckets skip JIT entirely at serving start (TRT engine-file moral
    # equivalent, reference run.sh stage "build engine")
    engine_dir: Optional[str] = None
    _aot_cache: dict = field(default_factory=dict, repr=False)
    _ref_mel_cache: dict = field(default_factory=dict, repr=False)
    # dynamic batcher (serving/batcher.py); attach via enable_batching().
    # Concurrent infer() calls then coalesce chunks into one folded sampler
    # call (Triton dynamic_batching equivalent, config.pbtxt:15-18).
    batcher: Optional[object] = None
    # vocoder length ladder: generated-mel lengths are data-dependent (the
    # duration formula), so exact-shape decodes would JIT-compile the vocoder
    # once per distinct utterance length. Pad to a multiple of this (with the
    # log-mel silence floor) and trim the wav — one compile per ladder rung.
    # 0 disables (exact-shape decode).
    vocoder_pad_to: int = 128

    def decode_mel(self, mel_gen: np.ndarray, device_out: bool = False):
        """Vocoder decode with length bucketing. (L, D) -> (L*hop,) or
        (B, L, D) -> (B, L*hop). Padding frames hold log(1e-5) — the mel
        silence floor (ops/mel.py clamp) — and sit past the trim point, so
        they only supply 'silence continues' conv context for the tail.

        device_out=True returns the UN-transferred device array (padded,
        untrimmed) plus the trim length, so callers that want to account
        device compute separately from device→host transfer (the serving
        batcher's stage timings) can block and fetch themselves."""
        single = mel_gen.ndim == 2
        m = np.asarray(mel_gen, np.float32)
        if single:
            m = m[None]
        b, length, d = m.shape
        if self.vocoder_decode is None:
            w = np.zeros((b, length * self.mel.hop_length), np.float32)
            if device_out:
                return jnp.asarray(w), length * self.mel.hop_length
            return w[0] if single else w
        pad = self.vocoder_pad_to
        if pad:
            lp = max(-(-max(length, 1) // pad) * pad, pad)
            if lp != length:
                floor = float(np.log(1e-5))
                m = np.concatenate(
                    [m, np.full((b, lp - length, d), floor, np.float32)], axis=1)
        dev = self.vocoder_decode(jnp.asarray(m))
        trim = length * self.mel.hop_length
        if device_out:
            return dev, trim
        wav = np.asarray(dev)[:, :trim]
        return wav[0] if single else wav

    def enable_batching(self, max_batch: int = 4, window_ms: float = 20.0,
                        nfe_steps: Optional[int] = None, return_mel: bool = True,
                        wire_dtype: str = "float32", xfer_chunks: int = 1,
                        timesteps: Optional[tuple] = None,
                        cfg_strength: Optional[float] = None):
        """Attach a DynamicBatcher. infer() chunks at the batcher's exact
        sampler configuration (nfe + default cfg/sway, plain-CFG mode) route
        through it; anything else falls back to the direct jit path.
        return_mel=False skips the generated-mel device fetch (wav-only
        servers); wire_dtype="int16" quantizes the wav to pcm16 on device so
        the fetch moves half the bytes (futures still resolve float32);
        xfer_chunks>1 (wav-only) fetches the batch's wavs in row chunks so
        early requests resolve before the whole batch has crossed the link;
        cfg_strength bakes a non-default guidance weight (0 = the
        CFG-distilled single-pass serving mode, train/distill.py)."""
        from f5e_tts_tpu.serving.batcher import DynamicBatcher

        self.batcher = DynamicBatcher(self, max_batch=max_batch,
                                      window_ms=window_ms, nfe_steps=nfe_steps,
                                      cfg_strength=cfg_strength,
                                      text_pad_to=self.text_pad_to,
                                      return_mel=return_mel,
                                      wire_dtype=wire_dtype,
                                      xfer_chunks=xfer_chunks,
                                      timesteps=timesteps)
        return self.batcher

    def _aot_sampler(self, nfe: int, ref_frames: int, bucket: int, min_text: int,
                     timesteps=None, cfg_strength=None):
        """Exported-sampler lookup; None when absent or text doesn't fit.

        timesteps/cfg_strength select variant engines (EPSS pruned grids,
        cfg-distilled cfg=0 serving) exported with the matching options."""
        if not self.engine_dir:
            return None
        key = (nfe, ref_frames, bucket, timesteps, cfg_strength)
        if key not in self._aot_cache:
            from f5e_tts_tpu.utils.aot import find_sampler_engine, load_fn

            found = find_sampler_engine(self.engine_dir, nfe, ref_frames, bucket,
                                        min_text, timesteps=timesteps,
                                        cfg_strength=cfg_strength)
            self._aot_cache[key] = (load_fn(found[0]), found[1]) if found else None
        entry = self._aot_cache[key]
        if entry is None or entry[1] < min_text:
            return None
        return entry

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        if self.vocab is None:
            return ftext.list_str_to_bytes(list(texts))
        if self.tokenizer in ("pinyin", "char-level-pinyin"):
            toks = ftext.convert_char_to_pinyin(list(texts))
        elif self.tokenizer == "phone-level-pinyin":
            toks = ftext.convert_char_to_finer_pinyin(list(texts))
        elif self.tokenizer == "g2p-mix":
            # reference: eval/utils_eval.py:135-137 — G2pMix phonemization with
            # a space between word tokens (except symbols); raw phones (no rime
            # split — that is the train-side convention, dataset.py:141-181)
            toks = ftext.g2p_mix_phonemize(list(texts), split_rimes=False,
                                           g2p=getattr(self, "_g2p", None))
        else:  # char / custom pre-tokenized
            toks = [list(t) for t in texts]
        if self.use_intersperse:
            toks = ftext.intersperse(toks)
        return ftext.list_str_to_idx(toks, self.vocab)

    def synthesize_chunk(
        self,
        ref_mel: np.ndarray,  # (1, ref_frames, mel)
        full_text: str,  # ref_text + gen_text
        duration: int,
        *,
        seed: int = 0,
        nfe_steps: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        sway: Optional[float] = None,
        mode: str = "tts_cfg",  # "cfg" | "tts" | "vc"
        alpha_spk: float = 1.0,
        alpha_txt: float = 1.0,
        alpha_ppg: float = 1.0,
        ppg: Optional[np.ndarray] = None,
        timesteps: Optional[tuple] = None,  # EPSS/custom grid, overrides nfe+sway
        device_out: bool = False,
    ):
        """One jitted sampler call on a static bucket -> generated mel (frames, d).

        device_out=True returns (out_device (1, bucket, d), ref_frames,
        duration) WITHOUT fetching — the caller slices/vocodes on device
        (infer's direct path pairs it with slice_gen + vocoder_decode.device
        to skip the mel host round trip)."""
        icfg = self.infer_cfg
        nfe = nfe_steps if nfe_steps is not None else icfg.nfe_steps
        cfg = cfg_strength if cfg_strength is not None else icfg.cfg_strength
        sway = sway if sway is not None else icfg.sway_sampling_coef

        ref_frames = ref_mel.shape[1]
        text_ids = self.tokenize([full_text])
        # duration floor: at least text len + 1 and ref + 1 (cfm.py:403-406)
        duration = max(duration, text_ids.shape[1] + 1, ref_frames + 1)
        duration = min(duration, icfg.max_duration)
        bucket = pick_bucket(duration, self.buckets)
        # the largest bucket caps duration (the host path's out[rf:duration]
        # numpy slice clamped implicitly; the device path must clamp too)
        duration = min(duration, bucket)

        nt = min(-(-text_ids.shape[1] // self.text_pad_to) * self.text_pad_to, bucket)
        padded = np.full((1, nt), -1, np.int32)
        padded[0, : min(text_ids.shape[1], nt)] = text_ids[0, :nt]

        # AOT engine fast path (plain-CFG only). Default cfg/sway uses the
        # untagged engine files; an EPSS grid or cfg override dispatches to a
        # variant engine exported with those options (absent -> jit fallback).
        if (mode not in ("tts", "vc") and ppg is None
                and sway == icfg.sway_sampling_coef):
            ts_key = tuple(float(t) for t in timesteps) if timesteps is not None else None
            cfg_key = None if cfg == icfg.cfg_strength else cfg
            aot = self._aot_sampler(nfe, ref_frames, bucket, nt,
                                    timesteps=ts_key, cfg_strength=cfg_key)
            if aot is not None:
                fn, tl = aot
                wide = np.full((1, tl), -1, np.int32)
                wide[0, :nt] = padded[0]
                out = fn(self.params, jnp.asarray(ref_mel),
                         jnp.asarray([ref_frames], jnp.int32),
                         jnp.asarray([duration], jnp.int32), jnp.asarray(wide),
                         jnp.asarray([seed], jnp.int32))
                if device_out:
                    return out, ref_frames, duration
                out = np.asarray(out[0], np.float32)
                return out[ref_frames:duration]

        inputs = fcfm.prepare_inputs(
            jnp.asarray(ref_mel), jnp.asarray([ref_frames]), jnp.asarray([duration]),
            bucket, text_ids=jnp.asarray(padded),
            ppg=jnp.asarray(ppg) if ppg is not None else None,
        )
        key = jax.random.PRNGKey(seed)
        if mode == "tts":
            out, _ = fcfm.sample_tts(self.params, self.state, self.arch, self.cfm, inputs,
                                     key, steps=nfe, alpha_spk=alpha_spk, alpha_txt=alpha_txt,
                                     sway_coef=sway, use_mask=True, timesteps=timesteps,
                                     compute_dtype=self.compute_dtype)
        elif mode == "vc":
            out, _ = fcfm.sample_vc(self.params, self.state, self.arch, self.cfm, inputs,
                                    key, steps=nfe, alpha_spk=alpha_spk, alpha_ppg=alpha_ppg,
                                    sway_coef=sway, use_mask=True, timesteps=timesteps,
                                    compute_dtype=self.compute_dtype)
        else:
            out, _ = fcfm.sample(self.params, self.state, self.arch, self.cfm, inputs,
                                 key, steps=nfe, cfg_strength=cfg, sway_coef=sway,
                                 use_mask=True, timesteps=timesteps,
                                 compute_dtype=self.compute_dtype)
        if device_out:
            return out, ref_frames, duration
        out = np.asarray(out[0], np.float32)
        return out[ref_frames:duration]  # generated region only (utils_infer.py:495)

    def infer(
        self,
        ref_wav: np.ndarray,
        ref_sr: int,
        ref_text: str,
        gen_text: str,
        *,
        seed: int = 0,
        speed: Optional[float] = None,
        fix_duration: Optional[float] = None,
        nfe_steps: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        sway: Optional[float] = None,
        cross_fade_duration: Optional[float] = None,
        timesteps: Optional[tuple] = None,  # EPSS/custom grid (pruned_sway_timesteps)
        streaming: bool = False,
        chunk_size: int = 2048,
    ):
        """Full pipeline: normalize ref -> chunk text -> synth -> vocode -> stitch.

        reference: utils_infer.py:367-556 (infer_process + infer_batch_process).
        Returns (wave, sr, mel) or a streaming generator of (chunk, sr).
        """
        icfg = self.infer_cfg
        speed = speed if speed is not None else icfg.speed
        xf = cross_fade_duration if cross_fade_duration is not None else icfg.cross_fade_duration

        # ref-mel cache: serving hits the same reference audio on every
        # request; hashing the raw samples skips the normalize/resample/mel
        # work (and a device round-trip) on repeats
        import hashlib

        ck = (hashlib.md5(ref_wav.tobytes()).hexdigest(), ref_sr)
        hit = self._ref_mel_cache.get(ck)
        if hit is None:
            audio, orig_rms = faudio.normalize_rms(ref_wav.astype(np.float32),
                                                   icfg.target_rms)
            audio = faudio.resample(audio, ref_sr, self.mel.target_sample_rate)
            ref_mel = np.asarray(mel_spectrogram(jnp.asarray(audio[None, :]), self.mel))
            if len(self._ref_mel_cache) >= 8:
                self._ref_mel_cache.pop(next(iter(self._ref_mel_cache)))
            self._ref_mel_cache[ck] = (audio, orig_rms, ref_mel)
        else:
            audio, orig_rms, ref_mel = hit
        ref_audio_len = audio.shape[-1] // self.mel.hop_length

        if ref_text and len(ref_text[-1].encode("utf-8")) == 1:
            ref_text = ref_text + " "
        # ref-length-derived chunk budget (utils_infer.py:386-388)
        max_chars = int(
            len(ref_text.encode("utf-8")) / max(audio.shape[-1] / self.mel.target_sample_rate, 1e-6) * (22 - audio.shape[-1] / self.mel.target_sample_rate)
        ) if ref_text else 135
        max_chars = max(max_chars, 10)
        chunks = chunk_text(gen_text, max_chars=max_chars)

        # chunks are batchable when the effective sampler config equals the
        # batcher's compiled configuration (plain CFG at defaults)
        eff_nfe = nfe_steps if nfe_steps is not None else icfg.nfe_steps
        # the batcher bakes ONE sampler configuration; a request matches when
        # its explicit grid equals the batcher's (both usually None) — a grid
        # subsumes nfe+sway, which only need checking in the None/None case
        req_grid = tuple(timesteps) if timesteps is not None else None
        use_batcher = (
            self.batcher is not None
            and req_grid == self.batcher.timesteps
            and (req_grid is not None or eff_nfe == self.batcher.nfe)
            and (cfg_strength is None or cfg_strength == self.batcher.cfg_strength)
            and (req_grid is not None or sway is None or sway == self.batcher.sway)
        )

        def gen():
            for i, chunk in enumerate(chunks):
                duration = estimate_duration(ref_audio_len, ref_text, chunk, speed,
                                             fix_duration, self.mel.target_sample_rate,
                                             self.mel.hop_length)
                if use_batcher:
                    ids = self.tokenize([ref_text + chunk])[0]
                    ids = ids[ids >= 0] if (ids < 0).any() else ids
                    fut = self.batcher.submit(ref_mel[0], np.asarray(ids),
                                              min(duration, icfg.max_duration),
                                              seed=seed + i)
                    wav, mel_gen = fut.result()
                else:
                    dev_decode = getattr(self.vocoder_decode, "device", None)
                    if dev_decode is not None:
                        # device-resident: slice + vocode without pulling the
                        # padded mel to host and re-uploading it
                        out_dev, rf, dur = self.synthesize_chunk(
                            ref_mel, ref_text + chunk, duration, seed=seed + i,
                            nfe_steps=nfe_steps, cfg_strength=cfg_strength,
                            sway=sway, timesteps=timesteps, device_out=True)
                        gl = dur - rf
                        pad = self.vocoder_pad_to or 1
                        L = max(-(-gl // pad) * pad, pad)
                        mel_dev = slice_gen(out_dev, jnp.asarray([rf], jnp.int32),
                                            jnp.asarray([gl], jnp.int32), L)
                        wav = np.asarray(dev_decode(mel_dev),
                                         np.float32)[0, : gl * self.mel.hop_length]
                        mel_gen = np.asarray(mel_dev, np.float32)[0, :gl]
                    else:
                        mel_gen = self.synthesize_chunk(
                            ref_mel, ref_text + chunk, duration, seed=seed + i,
                            nfe_steps=nfe_steps, cfg_strength=cfg_strength, sway=sway,
                            timesteps=timesteps)
                        wav = self.decode_mel(mel_gen)
                if 0 < orig_rms < icfg.target_rms:
                    wav = wav * orig_rms / icfg.target_rms
                yield wav, mel_gen

        if streaming:
            def stream():
                for wav, _ in gen():
                    for j in range(0, len(wav), chunk_size):
                        yield wav[j : j + chunk_size], self.mel.target_sample_rate
            return stream()

        waves, mels = [], []
        for wav, mel_gen in gen():
            waves.append(wav)
            if mel_gen is not None:  # batcher return_mel=False skips the fetch
                mels.append(mel_gen)
        final = cross_fade_stitch(waves, self.mel.target_sample_rate, xf)
        combined_mel = np.concatenate(mels, axis=0) if mels else np.zeros((0, self.mel.n_mel_channels))
        return final, self.mel.target_sample_rate, combined_mel
