"""Scoring CLI: WER / SIM / UTMOS over a directory of generated wavs.

reference: src/f5_tts/eval/eval_seedtts_testset.py + eval_librispeech_test_clean.py
+ eval_utmos.py. The external scoring models load from local paths (gated in
scorers.py); results go to *_results.jsonl + a mean line, same contract as the
reference (eval_seedtts_testset.py:76-85).

Usage:
  python -m f5e_tts_tpu.eval.score_cli wer --gen_dir results/... --metalst meta.lst \
      --lang en --asr_model /path/whisper-large-v3
  python -m f5e_tts_tpu.eval.score_cli sim --gen_dir ... --metalst ... --embedder ...
  python -m f5e_tts_tpu.eval.score_cli utmos --gen_dir ... --utmos /path/utmos.pt
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _pairs_from_meta(metalst: str, gen_dir: str, field: str):
    from f5e_tts_tpu.eval.harness import get_seedtts_metainfo

    info = get_seedtts_metainfo(metalst)
    pairs = []
    for utt, prompt_text, prompt_wav, gt_text, _gt_wav in info:
        gen_wav = os.path.join(gen_dir, f"{utt}.wav")
        if not os.path.exists(gen_wav):
            continue
        if field == "wer":
            pairs.append((utt, gt_text, gen_wav))
        else:
            pairs.append((utt, gen_wav, prompt_wav))
    return pairs


def main(argv=None):
    from f5e_tts_tpu.eval import scorers as fs

    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="metric", required=True)
    pw = sub.add_parser("wer")
    pw.add_argument("--gen_dir", required=True)
    pw.add_argument("--metalst", required=True)
    pw.add_argument("--lang", default="en", choices=["en", "zh"])
    pw.add_argument("--asr_model", default="",
                    help="local ASR weights dir (paraformer-zh parent for zh, "
                         "whisper dir/size for en)")
    pw.add_argument("--backend", default=None,
                    choices=[None, "funasr", "faster_whisper", "hf_whisper"],
                    help="default: funasr for zh, faster_whisper for en "
                         "(utils_eval.py:472-488)")
    pw.add_argument("--mode", default="whisper_v3", choices=["seedtts", "whisper_v3"],
                    help="normalization pipeline: run_asr_wer vs "
                         "run_asr_wer_whisper_large_v3")
    pw.add_argument("--workers", type=int, default=1,
                    help="parallel scoring workers, one ASR model each "
                         "(eval_seedtts_testset.py:60-67)")
    pw.add_argument("--device", default="cpu")
    ps = sub.add_parser("sim")
    ps.add_argument("--gen_dir", required=True)
    ps.add_argument("--metalst", required=True)
    ps.add_argument("--embedder", required=True, help="local speaker-embedder weights")
    pu = sub.add_parser("utmos")
    pu.add_argument("--gen_dir", required=True)
    pu.add_argument("--utmos", required=True, help="local UTMOS scripted ckpt")
    args = p.parse_args(argv)

    if args.metric == "wer":
        meta_pairs = _pairs_from_meta(args.metalst, args.gen_dir, "wer")
        # (gen_wav, prompt_wav, truth) triplets, reference test-set layout
        test_set = [(gen_wav, "", ref_text) for _utt, ref_text, gen_wav in meta_pairs]
        import functools

        make = functools.partial(_make_transcriber, backend=args.backend,
                                 ckpt_dir=args.asr_model, device=args.device)
        rows = fs.run_asr_wer_parallel(test_set, make, lang=args.lang,
                                       mode=args.mode, n_jobs=args.workers)
        mean = fs.write_results_jsonl(
            rows, "wer", os.path.join(args.gen_dir, "_wer_results.jsonl"))
        out = {"wer": mean, "n": len(rows)}
    elif args.metric == "sim":
        embed = _load_speaker_embedder(args.embedder)
        pairs = _pairs_from_meta(args.metalst, args.gen_dir, "sim")
        out = fs.score_sim(pairs, embed_fn=embed,
                           results_path=os.path.join(args.gen_dir, "_sim_results.jsonl"))
    else:
        utmos = fs.load_utmos(args.utmos)
        wavs = sorted(glob.glob(os.path.join(args.gen_dir, "*.wav")))
        out = fs.score_utmos(wavs, utmos,
                             results_path=os.path.join(args.gen_dir, "_utmos_results.jsonl"))
    print(json.dumps(out))
    return out


def _make_transcriber(rank: int, lang: str, *, backend=None, ckpt_dir="",
                      device="cpu"):
    """Per-worker ASR factory (picklable; one model per mp.Pool worker,
    mirroring the per-GPU model in eval_seedtts_testset.py:60-67)."""
    from f5e_tts_tpu.eval import scorers as fs

    return fs.load_asr_backend(lang, backend=backend, ckpt_dir=ckpt_dir,
                               device=device)


def _load_speaker_embedder(path: str):
    """WavLM-large + ECAPA speaker embedder (reference: eval/ecapa_tdnn.py +
    utils_eval.py:714-719). Loads a torchscript export; offline builds must
    provide the scripted model."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"speaker embedder not found at {path} (offline build; export the "
            "WavLM-ECAPA model to torchscript and pass its path)")
    import numpy as np
    import torch

    model = torch.jit.load(path).eval()

    def embed(wav_path: str) -> np.ndarray:
        from f5e_tts_tpu.infer.audio import read_wav, resample

        wav, sr = read_wav(wav_path)
        wav = resample(wav, sr, 16_000)
        with torch.no_grad():
            return model(torch.from_numpy(wav[None])).numpy().reshape(-1)

    return embed


if __name__ == "__main__":
    main()
