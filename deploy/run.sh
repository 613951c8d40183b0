#!/usr/bin/env bash
# Serving deployment stages (reference: runtime/triton_trtllm/run.sh stages 0-8:
# download -> convert -> build engine -> export vocoder -> serve -> bench).
# TPU equivalents: no engine build step — stage 2 AOT-exports the jitted
# sampler per bucket; stage 3 starts the warm server; stage 4 benchmarks.
set -euo pipefail

STAGE=${1:-all}
CKPT=${CKPT:-ckpts/model_1250000.safetensors}
VOCAB=${VOCAB:-data/Emilia_ZH_EN_pinyin/vocab.txt}
VOCODER=${VOCODER:-pretrained_models/vocos-mel-24khz/pytorch_model.bin}
REF_AUDIO=${REF_AUDIO:-examples/basic/basic_ref_en.wav}
REF_TEXT=${REF_TEXT:-"Some call me nature, others call me mother nature."}
PORT=${PORT:-8000}
NFE=${NFE:-16}
QUANTIZE=${QUANTIZE:-}   # "int8": W8A8 backbone (ops/quant.py)
WIRE=${WIRE:-float32}    # "int16": on-device pcm16 wav fetch
XFER_CHUNKS=${XFER_CHUNKS:-1}  # >1: chunked wav fetch — measured-NEGATIVE under
                               # closed-loop load (BENCHMARKS.md round-4); leave at 1
PRUNE=${PRUNE:-}         # EPSS keep indices into the $NFE sway grid, e.g. "0,1,2,4,8,16"
CFG=${CFG:-}             # cfg_strength override; "0" = CFG-distilled single-pass serving

stage_check() {  # 0: artifacts present?
    for f in "$CKPT" "$VOCAB" "$VOCODER" "$REF_AUDIO"; do
        [ -e "$f" ] || { echo "missing artifact: $f"; exit 1; }
    done
}

stage_export() {  # 2: AOT-export the sampler bucket ladder (engine files)
    python - <<PY
from f5e_tts_tpu.api import F5TTS
from f5e_tts_tpu.utils.aot import export_sampler_buckets
import numpy as np, jax.numpy as jnp
from f5e_tts_tpu.infer.audio import read_wav
from f5e_tts_tpu.ops.mel import mel_spectrogram
tts = F5TTS(ckpt_file="$CKPT", vocab_file="$VOCAB", vocoder_local_path="$VOCODER",
            quantize=("$QUANTIZE" or None))
wav, sr = read_wav("$REF_AUDIO")
ref_mel = np.asarray(mel_spectrogram(jnp.asarray(wav[None]), tts.engine.mel))
grid = None
if "$PRUNE":
    from f5e_tts_tpu.models.cfm import pruned_sway_timesteps
    grid = pruned_sway_timesteps([int(i) for i in "$PRUNE".split(",")], base_steps=$NFE)
cfg = float("$CFG") if "$CFG" else None
paths = export_sampler_buckets(tts.engine, ref_mel.shape[1], "engines/", nfe=$NFE,
                               timesteps=grid, cfg_strength=cfg)
print("exported:", paths)
PY
}

stage_serve() {  # 3: HTTP server with bucket warm-up
    exec python -m f5e_tts_tpu.serving.http_server \
        --ckpt_file "$CKPT" --vocab_file "$VOCAB" \
        --vocoder_local_path "$VOCODER" \
        --ref_audio "$REF_AUDIO" --ref_text "$REF_TEXT" \
        --port "$PORT" --nfe "$NFE" --wire_device "$WIRE" \
        --xfer_chunks "$XFER_CHUNKS"
}

stage_bench() {  # 4: offline + client-server benchmarks
    python -m f5e_tts_tpu.serving.benchmark offline \
        --ckpt "$CKPT" --vocab "$VOCAB" --vocoder_local_path "$VOCODER" \
        --ref_audio "$REF_AUDIO" --ref_text "$REF_TEXT" --nfe "$NFE"
}

stage_bench_openloop() {  # 5: open-loop (Poisson arrivals) through the batcher
    python -m f5e_tts_tpu.serving.benchmark openloop \
        --ckpt "$CKPT" --vocab "$VOCAB" --vocoder_local_path "$VOCODER" \
        --ref_audio "$REF_AUDIO" --ref_text "$REF_TEXT" --nfe "$NFE" \
        --qps "${QPS:-2.0}" --max_batch "${MAX_BATCH:-4}"
}

case "$STAGE" in
    check) stage_check ;;
    export) stage_export ;;
    serve) stage_check && stage_serve ;;
    bench) stage_check && stage_bench ;;
    bench_openloop) stage_check && stage_bench_openloop ;;
    all) stage_check && stage_export && stage_serve ;;
    *) echo "usage: $0 {check|export|serve|bench|bench_openloop|all}"; exit 2 ;;
esac
