"""Voice-conversion eval prompts: PPG extracted from prompt+ground-truth audio.

reference: src/f5_tts/eval/utils_eval.py:245-393 (get_vc_inference_prompt) and
eval_infer_batch_vc.py — the PPG conditioning for the generated region comes
from the concatenated (prompt, ground-truth) 16 kHz audio, and the total
duration is the concatenated length (VC preserves timing).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.eval.harness import PromptBatch
from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.ops.mel import mel_spectrogram


def get_vc_inference_prompts(
    metainfo: Sequence[Tuple[str, str, str, str, str]],
    ppg_extractor,
    mel_cfg,
    *,
    target_rms: float = 0.1,
    infer_batch_size: int = 1,
    num_buckets: int = 200,
    min_secs: float = 3.0,
    max_secs: float = 40.0,
    read_audio=None,
    seed: int = 666,
) -> List[Tuple[PromptBatch, np.ndarray, np.ndarray]]:
    """Returns [(batch, ppg (B, NP, D), ppg_lens (B,))]."""
    read_audio = read_audio or faudio.read_wav
    sr, hop = mel_cfg.target_sample_rate, mel_cfg.hop_length
    min_tokens = int(min_secs * sr // hop)
    max_tokens = int(max_secs * sr // hop)
    bucket_w = (max_tokens - min_tokens) / num_buckets

    buckets: List[List[dict]] = [[] for _ in range(num_buckets)]
    for utt, _prompt_text, prompt_wav, _gt_text, gt_wav in metainfo:
        wav, wav_sr = read_audio(prompt_wav)
        wav, rms = faudio.normalize_rms(wav, target_rms)
        wav = faudio.resample(wav, wav_sr, sr)
        gt, gt_sr = read_audio(gt_wav)
        gt = faudio.resample(gt, gt_sr, sr)

        ref_mel = np.asarray(mel_spectrogram(jnp.asarray(wav[None]), mel_cfg))[0]
        ref_mel_len = len(wav) // hop
        total_mel_len = ref_mel_len + len(gt) // hop
        if not (min_tokens <= total_mel_len <= max_tokens):
            continue

        # PPG over prompt+gt at 16 kHz (utils_eval.py:300-330 semantics)
        concat = np.concatenate([wav, gt])
        wav16 = faudio.resample(concat, sr, 16_000)
        ppg, ppg_len = ppg_extractor.audio_to_ppg(jnp.asarray(wav16[None]))
        ppg = np.asarray(ppg[0])[: int(ppg_len[0])]

        idx = min(int((total_mel_len - min_tokens) / bucket_w), num_buckets - 1)
        buckets[idx].append(dict(utt=utt, ref_mel=ref_mel, ref_mel_len=ref_mel_len,
                                 total_mel_len=total_mel_len, ppg=ppg, rms=rms))

    out = []
    for bucket in buckets:
        for i in range(0, len(bucket), infer_batch_size):
            group = bucket[i : i + infer_batch_size]
            if not group:
                continue
            n_ref = max(g["ref_mel"].shape[0] for g in group)
            n_ppg = max(g["ppg"].shape[0] for g in group)
            d_ppg = group[0]["ppg"].shape[-1]
            mels = np.zeros((len(group), n_ref, mel_cfg.n_mel_channels), np.float32)
            ppgs = np.zeros((len(group), n_ppg, d_ppg), np.float32)
            for j, g in enumerate(group):
                mels[j, : g["ref_mel"].shape[0]] = g["ref_mel"]
                ppgs[j, : g["ppg"].shape[0]] = g["ppg"]
            batch = PromptBatch(
                utts=[g["utt"] for g in group],
                ref_mels=mels,
                ref_mel_lens=np.asarray([g["ref_mel_len"] for g in group], np.int32),
                total_mel_lens=np.asarray([g["total_mel_len"] for g in group], np.int32),
                text_ids=np.full((len(group), 1), -1, np.int32),
                ref_rms=np.asarray([g["rms"] for g in group], np.float32),
            )
            out.append((batch, ppgs,
                        np.asarray([g["ppg"].shape[0] for g in group], np.int32)))
    rng = np.random.default_rng(seed)
    rng.shuffle(out)
    return out
