#!/usr/bin/env python
"""Real-checkpoint parity gate vs the reference artifacts.

Ingests the reference's published checkpoints and reports per-module and
end-to-end parity between this framework and the reference implementation
(run offline via tests/oracle shims). This is the gate that converts
"golden-tested against a twin" into "proven against the reference"
(BASELINE.md north star: Seed-TTS WER/SIM within 1% when ingesting the
reference safetensors).

Usage:
    python scripts/parity_check.py --artifacts-dir /path/to/artifacts \
        [--wav ref.wav --text "..."] [--steps 32] [--report out.json]

Expected artifact layout (reference: src/f5_tts/infer/utils_infer.py:101-227,
src/f5_tts/ppg/ppg_model.py:11-28, README.md:32-38):

    artifacts/
      F5TTS_v1_Base/model_1250000.safetensors   # hf://SWivid/F5-TTS (EMA keys)
      F5TTS_v1_Base/vocab.txt                   # pinyin vocab
      vocos/pytorch_model.bin (or .safetensors) # charactr/vocos-mel-24khz
      vocos/config.yaml
      ppg/33.pt                                 # WeNet Conformer ASR ckpt
      ppg/train.yaml
      ppg/global_cmvn
      ppg/phn_center.npy                        # optional ("map" output mode)
      ppg/ce_layer.pkl                          # optional

Each stage runs only when its artifacts are present; the final summary lists
what was checked, what was skipped, and the max-abs-err per module. Exit code
is non-zero if any RUN stage exceeds its tolerance, OR if --require-all is
set and artifacts are missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

RESULTS = []


def record(stage: str, status: str, detail: str = "", err: float | None = None,
           tol: float | None = None):
    ok = status == "ok" if err is None else (err <= tol)
    RESULTS.append(dict(stage=stage, status="ok" if ok else status,
                        max_abs_err=err, tol=tol, detail=detail))
    flag = "PASS" if ok else ("SKIP" if status == "skip" else "FAIL")
    errs = f"  max|err|={err:.3e} (tol {tol:.1e})" if err is not None else ""
    print(f"[{flag}] {stage}{errs}  {detail}")
    return ok


def artifact(path: str, what: str) -> str | None:
    if os.path.exists(path):
        return path
    record(what, "skip", f"missing artifact: {path}")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts-dir", default=os.environ.get("F5E_ARTIFACTS", "artifacts"))
    ap.add_argument("--wav", default=None, help="reference audio for end-to-end synth parity")
    ap.add_argument("--text", default="This is a parity check of the TPU framework.")
    ap.add_argument("--ref-text", default="And the reference audio says this.")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--report", default=None, help="write JSON report here")
    ap.add_argument("--require-all", action="store_true",
                    help="exit non-zero when any artifact is missing")
    ap.add_argument("--arch", default="base", choices=["base", "tiny"],
                    help="'base' = F5TTS_v1_Base (the real ckpt); 'tiny' = small "
                         "test architecture for gate self-tests with fake artifacts")
    ap.add_argument("--ckpt-name", default="model_1250000.safetensors")
    args = ap.parse_args()
    A = args.artifacts_dir

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from oracle import loader
    ref = loader.load()

    from f5e_tts_tpu.config import CFMConfig, DiTConfig, MelConfig
    from f5e_tts_tpu.models import cfm as fcfm
    from f5e_tts_tpu.models import dit as fdit
    from f5e_tts_tpu.ops import mel as fmel
    from f5e_tts_tpu.utils import text as ftext
    from f5e_tts_tpu.utils.torch_ckpt import dit_from_torch, load_torch_state_dict

    # ------------------------------------------------------------------
    # stage 1: mel frontend on real audio (or synthetic if no wav given)
    # ------------------------------------------------------------------
    if args.wav and os.path.exists(args.wav):
        import soundfile as sf
        wav, sr = sf.read(args.wav, dtype="float32")
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        detail = f"wav={args.wav} sr={sr}"
    else:
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(72000) * 0.1).astype(np.float32)
        sr = 24000
        detail = "synthetic noise (pass --wav for real audio)"
    mel_cfg = MelConfig()
    ms = ref.modules.MelSpec(n_fft=1024, hop_length=256, win_length=1024,
                             n_mel_channels=100, target_sample_rate=24000)
    with torch.no_grad():
        ref_mel = ms(torch.from_numpy(wav[None])).numpy().transpose(0, 2, 1)
    our_mel = np.asarray(fmel.mel_spectrogram(jnp.asarray(wav[None]), mel_cfg))
    record("mel_frontend", "fail", detail,
           float(np.abs(our_mel - ref_mel).max()), 5e-4)

    # ------------------------------------------------------------------
    # stage 2: DiT checkpoint ingest + per-module forward parity
    # ------------------------------------------------------------------
    ckpt = artifact(os.path.join(A, "F5TTS_v1_Base", args.ckpt_name),
                    "dit_checkpoint")
    vocab_path = artifact(os.path.join(A, "F5TTS_v1_Base", "vocab.txt"), "vocab")
    out = None
    if ckpt and vocab_path:
        vocab = ftext.load_vocab_file(vocab_path)
        if args.arch == "base":
            cfg = DiTConfig(dim=1024, depth=22, heads=16, dim_head=64, ff_mult=2,
                            mel_dim=100, text_dim=512, conv_layers=4, dropout=0.0)
        else:
            cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                            mel_dim=100, text_dim=32, conv_layers=2, dropout=0.0)
        sd = load_torch_state_dict(ckpt, use_ema=True)
        params, state = dit_from_torch(sd, cfg)
        params = jax.tree.map(jnp.asarray, params)

        # reference side: build the real DiT and load the same state dict
        m = ref.dit.DiT(dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                        dim_head=cfg.dim_head, dropout=0.0, ff_mult=cfg.ff_mult,
                        mel_dim=cfg.mel_dim, text_num_embeds=len(vocab),
                        text_dim=cfg.text_dim, conv_layers=cfg.conv_layers)
        m.eval()
        m.use_cross_mask = False
        tsd = {k[len("transformer."):]: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items() if k.startswith("transformer.")}
        missing, unexpected = m.load_state_dict(tsd, strict=False)
        record("dit_ckpt_keys", "fail" if unexpected else "ok",
               f"missing={len(missing)} unexpected={len(unexpected)}")

        rng = np.random.default_rng(1)
        b, n, nt = 2, 256, 64
        x = rng.standard_normal((b, n, 100)).astype(np.float32)
        cond = rng.standard_normal((b, n, 100)).astype(np.float32)
        ids = rng.integers(0, len(vocab), (b, nt)).astype(np.int32)
        ids[1, 40:] = -1
        time = np.asarray([0.3, 0.8], np.float32)

        with torch.no_grad():
            expect = m(x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                       text=torch.from_numpy(ids).long(), ppg=None,
                       time=torch.from_numpy(time), drop_audio_cond=False,
                       drop_text=False, drop_ppg=True).numpy()
        pred, _ = fdit.dit_forward(
            params, state, cfg, x=jnp.asarray(x), cond=jnp.asarray(cond),
            text_ids=jnp.asarray(ids), time=jnp.asarray(time),
            drop_audio_cond=jnp.zeros((b,), bool), drop_text=jnp.zeros((b,), bool),
            drop_ppg=jnp.ones((b,), bool), compute_dtype=jnp.float32)
        record("dit_forward_fp32", "fail", "full 22-block forward, real weights",
               float(np.abs(np.asarray(pred) - expect).max()), 5e-3)

        # end-to-end sampler parity at the real size
        if args.wav and os.path.exists(args.wav):
            ref_mel_j = our_mel  # (1, N, 100)
        else:
            ref_mel_j = our_mel
        cond_len = min(ref_mel_j.shape[1], 512)
        conv = ftext.convert_char_to_pinyin([args.ref_text + " " + args.text])
        tid = ftext.list_str_to_idx(conv, vocab)
        dur = min(cond_len + cond_len // 2 + 64, 1024)
        lens = np.asarray([cond_len])
        durs = np.asarray([dur])

        with torch.no_grad():
            expect, _ = ref.cfm.CFM(
                transformer=m, num_channels=100,
                mel_spec_kwargs=dict(n_mel_channels=100)).sample(
                cond=torch.from_numpy(ref_mel_j[:, :cond_len].copy()),
                text=torch.from_numpy(np.asarray(tid)).long(),
                duration=torch.from_numpy(durs.copy()),
                lens=torch.from_numpy(lens.copy()),
                steps=args.steps, cfg_strength=2.0, sway_sampling_coef=-1.0, seed=0)
        expect = expect.numpy()
        max_dur = int(durs.max())
        y0 = np.zeros((1, max_dur, 100), np.float32)
        torch.manual_seed(0)
        y0[0, :max_dur] = torch.randn(max_dur, 100).numpy()
        orig_noise = fcfm.noise_like
        fcfm.noise_like = lambda *a, **k: jnp.asarray(y0)
        try:
            inputs = fcfm.prepare_inputs(
                cond=jnp.asarray(ref_mel_j[:, :cond_len]), lens=jnp.asarray(lens),
                duration=jnp.asarray(durs), max_duration=max_dur,
                text_ids=jnp.asarray(tid))
            out, _ = fcfm.sample(params, state, cfg, CFMConfig(), inputs,
                                 jax.random.PRNGKey(0), steps=args.steps,
                                 cfg_strength=2.0, sway_coef=-1.0,
                                 use_mask=False, compute_dtype=jnp.float32)
            out = np.asarray(out)
        finally:
            fcfm.noise_like = orig_noise
        record("cfm_sample_e2e_fp32", "fail",
               f"NFE={args.steps} dur={dur} frames, real weights",
               float(np.abs(out - expect).max()), 2e-2)

    # ------------------------------------------------------------------
    # stage 2b: int8 (W8A8) sampler vs the float sampler
    # The serving flagship's opt-in quantization (ops/quant.py,
    # F5TTS(quantize="int8")) — measured on REAL weights the moment the
    # checkpoint artifact lands; random-weight bound until then. When eval
    # scorers are present too, run eval/score_cli over int8 output for the
    # WER/SIM delta (BENCHMARKS.md int8 caveat).
    # ------------------------------------------------------------------
    from f5e_tts_tpu.ops.quant import quantize_dit_params

    def int8_vs_float(q_label, cfg_q, params_q, state_q, vocab_n, steps, dur_q):
        rngq = np.random.default_rng(3)
        cond_q = rngq.standard_normal((1, 24, cfg_q.mel_dim)).astype(np.float32)
        tid_q = rngq.integers(0, vocab_n, (1, 16)).astype(np.int32)
        inputs_q = fcfm.prepare_inputs(
            cond=jnp.asarray(cond_q), lens=jnp.asarray([24]),
            duration=jnp.asarray([dur_q]), max_duration=dur_q,
            text_ids=jnp.asarray(tid_q))
        kw = dict(steps=steps, cfg_strength=2.0, sway_coef=-1.0,
                  use_mask=False, compute_dtype=jnp.float32)
        ref_o, _ = fcfm.sample(params_q, state_q, cfg_q, CFMConfig(), inputs_q,
                               jax.random.PRNGKey(0), **kw)
        int8_o, _ = fcfm.sample(quantize_dit_params(params_q), state_q, cfg_q,
                                CFMConfig(), inputs_q, jax.random.PRNGKey(0), **kw)
        a = np.asarray(ref_o)[0, 24:]
        b8 = np.asarray(int8_o)[0, 24:]
        cos = float(np.dot(a.ravel(), b8.ravel())
                    / max(np.linalg.norm(a) * np.linalg.norm(b8), 1e-9))
        record(f"int8_sample_vs_fp32_{q_label}", "fail",
               f"NFE={steps} dur={dur_q}, max|err|={np.abs(a - b8).max():.3e}, "
               f"cosine={cos:.5f}", 1.0 - cos, 5e-3)

    if ckpt and vocab_path:
        int8_vs_float("real_weights", cfg, params, state, len(vocab),
                      args.steps, 96)
    else:
        q_cfg = DiTConfig(dim=128, depth=4, heads=4, dim_head=32, ff_mult=2,
                          mel_dim=100, text_dim=64, conv_layers=2, dropout=0.0)
        q_params, q_state = fdit.init_dit(jax.random.PRNGKey(11), q_cfg, 64)
        # init_dit is AdaLN-Zero (identity trunk, zero proj_out) — randomize
        # the gates + output head so the bound measures a live network
        for key, k2, s in (("blocks", "attn_norm", 0.1), ("proj_out", None, 0.05)):
            tgt = q_params[key][k2] if k2 else q_params[key]
            tgt["w"] = s * jax.random.normal(
                jax.random.PRNGKey(12 if k2 else 13), tgt["w"].shape)
        record("int8_real_weights", "skip",
               "real ckpt absent -> random-weight bound below")
        int8_vs_float("random_weights", q_cfg, q_params, q_state, 64, 8, 64)

    # ------------------------------------------------------------------
    # stage 3: Vocos vocoder
    # ------------------------------------------------------------------
    voc = None
    for cand in ("pytorch_model.bin", "model.safetensors", "pytorch_model.safetensors"):
        p = os.path.join(A, "vocos", cand)
        if os.path.exists(p):
            voc = p
            break
    if voc is None:
        record("vocos", "skip", f"missing artifact: {os.path.join(A, 'vocos')}/"
               "{pytorch_model.bin|model.safetensors}")
    else:
        import torch as _torch

        from f5e_tts_tpu.models.vocos import VocosConfig, vocos_decode, vocos_from_torch
        from oracle import vocos_torch

        vcfg = VocosConfig()
        if voc.endswith(".safetensors"):
            from safetensors.numpy import load_file
            vsd = load_file(voc)
        else:
            vsd = {k: v.numpy() for k, v in _torch.load(
                voc, map_location="cpu", weights_only=True).items()}
        vparams = jax.tree.map(jnp.asarray, vocos_from_torch(vsd, vcfg))
        mel_in = (our_mel[:, :256] if out is None else out[:, :256]).astype(np.float32)
        wav_out = np.asarray(vocos_decode(vparams, vcfg, jnp.asarray(mel_in)))
        # oracle: torch backbone twin + the reference's own conv-STFT head
        # (runtime/triton_trtllm/scripts/{export_vocoder_to_onnx,conv_stft}.py,
        # ported in tests/oracle/trt_math.py)
        wav_ref = vocos_torch.decode(vsd, mel_in, vcfg.num_layers, vcfg.n_fft,
                                     vcfg.hop_length)
        n = min(wav_out.shape[1], wav_ref.shape[1])
        scale = max(float(np.abs(wav_ref[:, :n]).max()), 1e-6)
        record("vocos_decode", "fail",
               f"decoded {wav_out.shape} vs conv-STFT oracle, peak={scale:.3f} "
               "(rel max|err|)",
               float(np.abs(wav_out[:, :n] - wav_ref[:, :n]).max()) / scale, 2e-3)

    # ------------------------------------------------------------------
    # stage 4: WeNet PPG extractor
    # ------------------------------------------------------------------
    wenet = artifact(os.path.join(A, "ppg", "33.pt"), "wenet_ckpt")
    wyaml = artifact(os.path.join(A, "ppg", "train.yaml"), "wenet_yaml")
    if wenet and wyaml:
        import importlib

        import torch as _torch
        import yaml as _yaml

        from f5e_tts_tpu.models.conformer import load_ppg_extractor
        extractor = load_ppg_extractor(wenet, wyaml, output_type="ppg")
        ccfg = extractor.cfg
        rng = np.random.default_rng(2)
        fbank = rng.standard_normal((2, 200, ccfg.input_dim)).astype(np.float32)
        lens = np.asarray([200, 144])
        ppg, true_len = extractor.mel_to_ppg(jnp.asarray(fbank), jnp.asarray(lens))
        ppg, true_len = np.asarray(ppg), np.asarray(true_len)

        # oracle: the ACTUAL reference ConformerEncoder built from the real
        # train.yaml (reference: ppg/wenet/transformer/encoder.py:403-495,
        # ppg/asr_model.py:222-244 extract = encoder -> content linear)
        enc_mod = importlib.import_module("f5_tts.ppg.wenet.transformer.encoder")
        cmvn_mod = importlib.import_module("f5_tts.ppg.wenet.transformer.cmvn")
        with open(wyaml, "r", encoding="utf-8") as f:
            wconf = _yaml.safe_load(f)
        enc_conf = dict(wconf.get("encoder_conf", {}))
        for k in ("dropout_rate", "positional_dropout_rate", "attention_dropout_rate"):
            enc_conf.setdefault(k, 0.0)
        # the fork's encoder calls rate-2 subsampling "conv2d"
        # (encoder.py:105-106); our config accepts "conv2d2" as an alias
        if enc_conf.get("input_layer") == "conv2d2":
            enc_conf["input_layer"] = "conv2d"
        gcmvn = cmvn_mod.GlobalCMVN(
            _torch.from_numpy(np.asarray(extractor.params["cmvn_mean"])).float(),
            _torch.from_numpy(np.asarray(extractor.params["cmvn_istd"])).float())
        m = enc_mod.ConformerEncoder(input_size=ccfg.input_dim,
                                     global_cmvn=gcmvn, **enc_conf)
        m.eval()
        wsd = _torch.load(wenet, map_location="cpu", weights_only=True)
        esd = {k[len("encoder."):]: v for k, v in wsd.items()
               if k.startswith("encoder.") and not k.startswith("encoder.global_cmvn")}
        missing, unexpected = m.load_state_dict(esd, strict=False)
        # unused-in-extract params: global_cmvn fed explicitly; concat_linear
        # only when concat_after=True; linear_xs_embs only when a speaker
        # embedding is passed (encoder.py:190-192)
        missing = [k for k in missing
                   if not k.startswith("global_cmvn")
                   and "concat_linear" not in k
                   and not k.startswith("linear_xs_embs")]
        record("wenet_ckpt_keys", "fail" if (missing or unexpected) else "ok",
               f"missing={len(missing)} unexpected={len(unexpected)}")
        with _torch.no_grad():
            ys, masks = m(_torch.from_numpy(fbank), _torch.from_numpy(lens),
                          None, decoding_chunk_size=-1)
            ref_ppg = (ys @ _torch.from_numpy(wsd["linear.weight"].numpy()).float().T
                       + _torch.from_numpy(wsd["linear.bias"].numpy()).float()).numpy()
        # compare per-sample valid frames only: the wrapper zeroes beyond
        # true_len (ppg_model.py:132-141) but the encoder's own valid length
        # (from masks) can be one frame shorter at conv edges
        ref_lens = masks.squeeze(1).sum(-1).numpy()
        n = min(ppg.shape[1], ref_ppg.shape[1])
        ours_cmp = ppg[:, :n].copy()
        ref_cmp = ref_ppg[:, :n].copy()
        for b in range(len(lens)):
            valid = min(int(true_len[b]), int(ref_lens[b]))
            ours_cmp[b, valid:] = 0.0
            ref_cmp[b, valid:] = 0.0
        record("wenet_ppg_extract", "fail",
               f"ppg {ppg.shape} vs reference ConformerEncoder from train.yaml",
               float(np.abs(ours_cmp - ref_cmp).max()), 5e-3)

    # ------------------------------------------------------------------
    # summary
    # ------------------------------------------------------------------
    ran = [r for r in RESULTS if r["status"] != "skip"]
    skipped = [r for r in RESULTS if r["status"] == "skip"]
    failed = [r for r in ran if r["status"] != "ok" and
              (r["max_abs_err"] is None or r["max_abs_err"] > (r["tol"] or 0))]
    print(f"\n=== parity summary: {len(ran)} ran, {len(skipped)} skipped, "
          f"{len(failed)} failed ===")
    if skipped:
        print("Skipped stages (provide these artifacts to run them):")
        for r in skipped:
            print(f"  - {r['stage']}: {r['detail']}")
    if args.report:
        with open(args.report, "w") as f:
            json.dump(RESULTS, f, indent=2)
    if failed or (args.require_all and skipped):
        sys.exit(1)


if __name__ == "__main__":
    main()
