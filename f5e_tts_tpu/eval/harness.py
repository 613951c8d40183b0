"""Batch eval inference: testset metainfo -> bucketed batches -> sampler -> wavs.

reference: src/f5_tts/eval/utils_eval.py:21-219 (metainfo parsing + 200-bucket
duration batching) and src/f5_tts/eval/eval_infer_batch.py:40-227 (the
Accelerate multi-GPU runner). TPU redesign:

- prompt-list sharding across hosts via jax.process_index()/process_count()
  (replaces accelerator.split_between_processes, eval_infer_batch.py:187),
- batches padded to static duration buckets so the jitted sampler compiles a
  bounded set of shapes,
- per-utterance wall-clock + RTF reporting (eval_infer_batch.py:220-223).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.infer import audio as faudio
from f5e_tts_tpu.infer.pipeline import pick_bucket
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.ops.mel import mel_spectrogram


def get_seedtts_metainfo(metalst: str) -> List[Tuple[str, str, str, str, str]]:
    """Parse seed-tts meta.lst: utt|prompt_text|prompt_wav|gt_text[|gt_wav].

    reference: utils_eval.py:21-38.
    """
    metainfo = []
    base = os.path.dirname(metalst)
    with open(metalst, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) == 5:
                utt, prompt_text, prompt_wav, gt_text, gt_wav = parts
                if not os.path.isabs(gt_wav):
                    gt_wav = os.path.join(base, gt_wav)
            elif len(parts) == 4:
                utt, prompt_text, prompt_wav, gt_text = parts
                gt_wav = os.path.join(base, "wavs", utt + ".wav")
            else:
                continue
            if not os.path.isabs(prompt_wav):
                prompt_wav = os.path.join(base, prompt_wav)
            metainfo.append((utt, prompt_text, prompt_wav, gt_text, gt_wav))
    return metainfo


def get_librispeech_metainfo(metalst: str, librispeech_path: str):
    """Parse librispeech_pc cross-sentence .lst (utils_eval.py:41-60)."""
    metainfo = []
    with open(metalst, "r", encoding="utf-8") as f:
        for line in f:
            ref_utt, _ref_dur, ref_txt, gen_utt, _gen_dur, gen_txt = line.strip().split("\t")
            rs, rc, _ = ref_utt.split("-")
            gs, gc, _ = gen_utt.split("-")
            ref_wav = os.path.join(librispeech_path, rs, rc, ref_utt + ".flac")
            gen_wav = os.path.join(librispeech_path, gs, gc, gen_utt + ".flac")
            metainfo.append((gen_utt, ref_txt, ref_wav, " " + gen_txt, gen_wav))
    return metainfo


@dataclass
class PromptBatch:
    utts: List[str]
    ref_mels: np.ndarray  # (B, N_ref_max, mel)
    ref_mel_lens: np.ndarray  # (B,)
    total_mel_lens: np.ndarray  # (B,)
    text_ids: np.ndarray  # (B, NT)
    ref_rms: np.ndarray  # (B,)


def get_inference_prompts(
    metainfo: Sequence[Tuple[str, str, str, str, str]],
    tokenize,
    mel_cfg,
    *,
    speed: float = 1.0,
    target_rms: float = 0.1,
    use_truth_duration: bool = False,
    infer_batch_size: int = 1,
    num_buckets: int = 200,
    min_secs: float = 3.0,
    max_secs: float = 40.0,
    read_audio=None,
    seed: int = 666,
) -> List[PromptBatch]:
    """Duration-bucketed, padded prompt batches (utils_eval.py:77-219).

    read_audio(path) -> (wav float32, sr); defaults to wav-only stdlib reader.
    """
    read_audio = read_audio or faudio.read_wav
    sr, hop = mel_cfg.target_sample_rate, mel_cfg.hop_length
    min_tokens = int(min_secs * sr // hop)
    max_tokens = int(max_secs * sr // hop)

    buckets: List[List[dict]] = [[] for _ in range(num_buckets)]
    for utt, prompt_text, prompt_wav, gt_text, gt_wav in metainfo:
        wav, wav_sr = read_audio(prompt_wav)
        wav, rms = faudio.normalize_rms(wav, target_rms)
        wav = faudio.resample(wav, wav_sr, sr)
        if prompt_text and len(prompt_text[-1].encode("utf-8")) == 1:
            prompt_text = prompt_text + " "

        ref_mel_len = len(wav) // hop
        if use_truth_duration:
            gt, gt_sr = read_audio(gt_wav)
            total_mel_len = ref_mel_len + int(len(gt) / gt_sr * sr / hop / speed)
        else:
            rt = max(len(prompt_text.encode("utf-8")), 1)
            gt_len = len(gt_text.encode("utf-8"))
            total_mel_len = ref_mel_len + int(ref_mel_len / rt * gt_len / speed)
        if not (min_tokens <= total_mel_len <= max_tokens):
            continue

        ref_mel = np.asarray(mel_spectrogram(jnp.asarray(wav[None]), mel_cfg))[0]
        # reference bucket index: floor((L - min) / (max - min + 1) * N)
        # (utils_eval.py:172)
        idx = min(int((total_mel_len - min_tokens)
                      / (max_tokens - min_tokens + 1) * num_buckets),
                  num_buckets - 1)
        buckets[idx].append(dict(utt=utt, ref_mel=ref_mel, ref_mel_len=ref_mel_len,
                                 total_mel_len=total_mel_len,
                                 text=prompt_text + gt_text, rms=rms))

    def _flush(group) -> PromptBatch:
        ids = tokenize([g["text"] for g in group])
        n_ref = max(g["ref_mel"].shape[0] for g in group)
        mels = np.zeros((len(group), n_ref, mel_cfg.n_mel_channels), np.float32)
        for j, g in enumerate(group):
            mels[j, : g["ref_mel"].shape[0]] = g["ref_mel"]
        return PromptBatch(
            utts=[g["utt"] for g in group],
            ref_mels=mels,
            ref_mel_lens=np.asarray([g["ref_mel_len"] for g in group], np.int32),
            total_mel_lens=np.asarray([g["total_mel_len"] for g in group], np.int32),
            text_ids=ids,
            ref_rms=np.asarray([g["rms"] for g in group], np.float32),
        )

    # reference batching: accumulate FRAMES per bucket and flush when the
    # accumulated total reaches infer_batch_size — a frame budget despite the
    # name (utils_eval.py:181-198); infer_batch_size=1 -> one utt per batch
    batches: List[PromptBatch] = []
    for bucket in buckets:
        accum, group = 0, []
        for g in bucket:
            group.append(g)
            accum += g["total_mel_len"]
            if accum >= infer_batch_size:
                batches.append(_flush(group))
                accum, group = 0, []
        if group:
            batches.append(_flush(group))
    # python-random shuffle with the reference's fixed seed so the batch
    # ORDER (and hence per-host shards) matches (utils_eval.py:216-217)
    import random as pyrandom

    pyrandom.Random(seed).shuffle(batches)
    return batches


def shard_for_host(items: Sequence, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> List:
    """Host-sharded split (replaces accelerator.split_between_processes)."""
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return list(items[pi::pc])


def run_batch_inference(
    engine,
    batches: Sequence[PromptBatch],
    output_dir: str,
    *,
    nfe_steps: int = 32,
    cfg_strength: float = 2.0,
    sway: float = -1.0,
    seed: int = 0,
    mode: str = "cfg",  # "cfg" | "tts" | "vc"
    alpha_spk: float = 1.0,
    alpha_txt: float = 1.0,
    alpha_ppg: float = 1.0,
    target_rms: float = 0.1,
) -> Dict[str, float]:
    """Generate + vocode + save per-utterance wavs; return timing stats.

    reference: eval_infer_batch.py:184-227 (generation loop + wall-clock) and
    the sample_tts/sample_vc variants (eval_infer_batch_tts.py / _vc.py).
    """
    os.makedirs(output_dir, exist_ok=True)
    t0 = time.time()
    total_audio_s = 0.0
    sr, hop = engine.mel.target_sample_rate, engine.mel.hop_length

    for bi, batch in enumerate(batches):
        bucket = pick_bucket(int(batch.total_mel_lens.max()), engine.buckets)
        inputs = fcfm.prepare_inputs(
            jnp.asarray(batch.ref_mels[:, :bucket]),
            jnp.asarray(batch.ref_mel_lens),
            jnp.asarray(np.minimum(batch.total_mel_lens, bucket)),
            bucket, text_ids=jnp.asarray(batch.text_ids))
        key = jax.random.PRNGKey(seed)
        if mode == "tts":
            out, _ = fcfm.sample_tts(engine.params, engine.state, engine.arch, engine.cfm,
                                     inputs, key, steps=nfe_steps, alpha_spk=alpha_spk,
                                     alpha_txt=alpha_txt, sway_coef=sway,
                                     compute_dtype=engine.compute_dtype)
        elif mode == "vc":
            out, _ = fcfm.sample_vc(engine.params, engine.state, engine.arch, engine.cfm,
                                    inputs, key, steps=nfe_steps, alpha_spk=alpha_spk,
                                    alpha_ppg=alpha_ppg, sway_coef=sway,
                                    compute_dtype=engine.compute_dtype)
        else:
            out, _ = fcfm.sample(engine.params, engine.state, engine.arch, engine.cfm,
                                 inputs, key, steps=nfe_steps, cfg_strength=cfg_strength,
                                 sway_coef=sway, compute_dtype=engine.compute_dtype)
        out = np.asarray(out, np.float32)
        for j, utt in enumerate(batch.utts):
            lo, hi = int(batch.ref_mel_lens[j]), int(batch.total_mel_lens[j])
            mel_gen = out[j, lo:hi]
            # length-laddered decode: eval utterance lengths are all distinct,
            # exact shapes would recompile the vocoder per utterance
            wav = engine.decode_mel(mel_gen)
            if 0 < batch.ref_rms[j] < target_rms:
                wav = wav * batch.ref_rms[j] / target_rms
            faudio.write_wav(os.path.join(output_dir, f"{utt}.wav"), wav, sr)
            total_audio_s += len(wav) / sr

    dt = time.time() - t0
    return {"wall_s": dt, "audio_s": total_audio_s,
            "rtf": dt / max(total_audio_s, 1e-9), "n_batches": len(batches)}
