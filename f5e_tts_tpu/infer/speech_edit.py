"""Speech editing: infill selected time spans of an utterance with new text.

reference: src/f5_tts/infer/speech_edit.py:140-186 — zero the audio inside the
edit spans, build a frame-level edit mask (True = keep original), and run the
sampler with `edit_mask` so only the masked spans are regenerated (the CFM
prompt-keep mask is cond_mask & edit_mask, cfm.py:396-397).

The reference derives spans from an external ctc-forced-aligner (its
documented workflow, reference speech_edit.py:66-72); here spans may be given
in seconds directly (any aligner), or derived natively from CTC posteriors
via `token_spans_from_alignment` / `derive_edit_spans` below, built on the
framework's own `ctc_forced_align` (models/conformer_train.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.config import MelConfig
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.ops.mel import mel_spectrogram


def token_spans_from_alignment(
    logprobs: np.ndarray,
    tokens: Sequence[int],
    frame_shift_s: float,
    blank: int = 0,
) -> List[Tuple[float, float]]:
    """Per-token (start_s, end_s) spans via CTC forced alignment.

    Native replacement for the reference's external ctc-forced-aligner step
    (reference: infer/speech_edit.py:66-72 documents running
    MahmoudAshraf97/ctc-forced-aligner by hand). logprobs: (T, V) log-softmax
    frame posteriors; tokens: the transcript as token ids; frame_shift_s: the
    posterior frame shift in seconds (e.g. 0.02 for the 20 ms PPG encoder).
    """
    from f5e_tts_tpu.models.conformer_train import ctc_forced_align

    _, spath = ctc_forced_align(logprobs, tokens, blank, return_states=True)
    spans: List[Optional[List[int]]] = [None] * len(tokens)
    for t, s in enumerate(spath):
        if s % 2 == 1:  # odd CTC state = label token (s-1)//2
            u = (s - 1) // 2
            if spans[u] is None:
                spans[u] = [t, t + 1]
            else:
                spans[u][1] = t + 1
    # forced alignment must visit every label state
    assert all(sp is not None for sp in spans), "alignment skipped a token"
    return [(sp[0] * frame_shift_s, sp[1] * frame_shift_s) for sp in spans]


def derive_edit_spans(
    logprobs: np.ndarray,
    tokens: Sequence[int],
    edit_token_ranges: Sequence[Tuple[int, int]],
    frame_shift_s: float,
    blank: int = 0,
) -> List[Tuple[float, float]]:
    """(start_s, end_s) edit spans for token index ranges [i0, i1] inclusive.

    Glue from "which tokens to replace" to build_edit_mask's parts_to_edit:
    each range maps to (start of its first token, end of its last token).
    """
    per_tok = token_spans_from_alignment(logprobs, tokens, frame_shift_s, blank)
    out = []
    for i0, i1 in edit_token_ranges:
        assert 0 <= i0 <= i1 < len(per_tok), (i0, i1, len(per_tok))
        out.append((per_tok[i0][0], per_tok[i1][1]))
    return out


def build_edit_mask(
    parts_to_edit: Sequence[Tuple[float, float]],
    audio_len_samples: int,
    mel: MelConfig,
    fix_durations: Optional[Sequence[float]] = None,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Return (edited audio zeroing mask (T,), frame edit mask (N,), out_frames).

    reference: speech_edit.py:140-161 — each edited span may be re-timed via
    fix_durations; the output timeline stretches accordingly.
    """
    sr, hop = mel.target_sample_rate, mel.hop_length
    keep_audio = []  # segments of original audio to copy
    frame_keep = []
    cursor = 0
    offset = 0.0
    for i, (start_s, end_s) in enumerate(parts_to_edit):
        start, end = int(start_s * sr), int(end_s * sr)
        part_dur = (end - start) if fix_durations is None else int(fix_durations[i] * sr)
        # keep region before the span
        keep_audio.append((cursor, start))
        frame_keep.append((True, (start - cursor) // hop))
        frame_keep.append((False, part_dur // hop))
        cursor = end
        offset += part_dur - (end - start)
    keep_audio.append((cursor, audio_len_samples))
    frame_keep.append((True, (audio_len_samples - cursor) // hop))

    total_frames = sum(n for _, n in frame_keep)
    mask = np.zeros(total_frames, bool)
    pos = 0
    for keep, n in frame_keep:
        mask[pos : pos + n] = keep
        pos += n
    return np.asarray(keep_audio, np.int64), mask, total_frames


def edit_speech(
    engine,
    wav: np.ndarray,
    sr: int,
    orig_text: str,
    target_text: str,
    parts_to_edit: Sequence[Tuple[float, float]],
    *,
    fix_durations: Optional[Sequence[float]] = None,
    seed: int = 0,
    nfe_steps: Optional[int] = None,
    cfg_strength: Optional[float] = None,
    sway: Optional[float] = None,
):
    """Infill the edit spans; returns (waveform, sr).

    engine: infer.pipeline.TTSEngine. The non-edited regions keep the original
    mel exactly (prompt overwrite, cfm.py:476); only edited spans are sampled.
    """
    from f5e_tts_tpu.infer.audio import resample

    icfg = engine.infer_cfg
    nfe = nfe_steps if nfe_steps is not None else icfg.nfe_steps
    cfg = cfg_strength if cfg_strength is not None else icfg.cfg_strength
    sway = sway if sway is not None else icfg.sway_sampling_coef

    wav = resample(wav.astype(np.float32), sr, engine.mel.target_sample_rate)
    sr = engine.mel.target_sample_rate
    hop = engine.mel.hop_length

    keep_segments, frame_mask, total_frames = build_edit_mask(
        parts_to_edit, len(wav), engine.mel, fix_durations)

    # build the time-stretched audio with zeros in edited spans
    # (speech_edit.py:147-159)
    out_audio = np.zeros(total_frames * hop, np.float32)
    pos = 0
    seg_iter = iter(keep_segments)
    for keep, n in _runs(frame_mask):
        if keep:
            a, b = next(seg_iter)
            seg = wav[a : a + n * hop]
            out_audio[pos : pos + len(seg)] = seg
        pos += n * hop
    cond_mel = np.asarray(mel_spectrogram(jnp.asarray(out_audio[None]), engine.mel))
    n_frames = min(cond_mel.shape[1], total_frames)

    from f5e_tts_tpu.infer.pipeline import pick_bucket

    bucket = pick_bucket(n_frames, engine.buckets)
    text_ids = engine.tokenize([target_text])
    edit_mask = np.zeros((1, bucket), bool)
    edit_mask[0, :n_frames] = frame_mask[:n_frames]

    inputs = fcfm.prepare_inputs(
        jnp.asarray(cond_mel[:, :bucket]), jnp.asarray([n_frames]),
        jnp.asarray([n_frames]), bucket, text_ids=jnp.asarray(text_ids),
        edit_mask=jnp.asarray(edit_mask))
    out, _ = fcfm.sample(engine.params, engine.state, engine.arch, engine.cfm, inputs,
                         jax.random.PRNGKey(seed), steps=nfe, cfg_strength=cfg,
                         sway_coef=sway, use_mask=True, compute_dtype=engine.compute_dtype)
    mel_out = np.asarray(out[0, :n_frames], np.float32)
    wave = engine.decode_mel(mel_out)  # length-laddered vocoder decode
    return wave, sr


def _runs(mask: np.ndarray) -> List[Tuple[bool, int]]:
    """RLE of a boolean array."""
    runs = []
    if len(mask) == 0:
        return runs
    cur, count = bool(mask[0]), 0
    for v in mask:
        if bool(v) == cur:
            count += 1
        else:
            runs.append((cur, count))
            cur, count = bool(v), 1
    runs.append((cur, count))
    return runs
