#!/bin/bash
# Round-4 on-chip evidence chain (VERDICT r3 next-round #1).
# Run when the axon tunnel is up:  bash scripts/onchip_round4.sh [outdir]
#
# Re-establishes every number the round-3 outage voided, in priority order:
#  1. verify drive (end-to-end correctness on chip)
#  2. bench.py headline: NFE32 bf16, NFE16 bf16, NFE16 int8
#  3. serving matrix conc-2/conc-4 NFE16, f32 vs int16 wire (the headline
#     to beat end-to-end: TRT-LLM RTF 0.0394, triton_trtllm/README.md:64)
#  4. train step timing: b32 save_attn (the 2.051 s / 20.7% MFU row) +
#     per-op trace breakdown (profile_train) for the MFU attack
#  5. prefetch overlap + pipeline-PP profitability (pipe=2 vs dp on chip)
set -u
OUT=${1:-/tmp/onchip_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:$PWD
# persistent compile cache: tunnel compiles are minutes each; reruns are free
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}

run() {  # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag: $* ===" | tee -a "$OUT/summary.log"
  timeout 3000 "$@" > "$OUT/$tag.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$tag.log" | tee -a "$OUT/summary.log"
  echo "--- rc=$rc ---" | tee -a "$OUT/summary.log"
}

run verify      python /tmp/verify_e2e.py
run bench_nfe32 python bench.py
run bench_nfe16 python bench.py --nfe 16
run bench_int8  python bench.py --nfe 16 --quantize int8
# EPSS-pruned schedule (arXiv 2505.19931): 8 kept steps of the NFE-32 sway
# grid — RTF point for the pruned-step serving mode (quality needs real ckpt)
run bench_epss8 python bench.py --nfe 32 --prune 0,1,2,3,4,6,10,18,32
# CFG-distilled serving mode (train/distill.py, arXiv 2504.20334): one pass
# per ODE step — RTF is weight-independent, so random weights give the number
run bench_cfg0  python bench.py --nfe 32 --cfg 0
run bench_cfg0_nfe16 python bench.py --nfe 16 --cfg 0
# serving needs a ref wav; synthesize one
python - <<'EOF'
import numpy as np, wave
sr = 24000; t = np.arange(int(2.5 * sr)) / sr
wav = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
with wave.open("/tmp/ref_r4.wav", "wb") as f:
    f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
    f.writeframes((wav * 32767).astype(np.int16).tobytes())
EOF
run serve_c2_f32  python -m f5e_tts_tpu.serving.benchmark concurrent \
    --ref_audio /tmp/ref_r4.wav --nfe 16 --concurrency 2 --wav_only
run serve_c2_i16  python -m f5e_tts_tpu.serving.benchmark concurrent \
    --ref_audio /tmp/ref_r4.wav --nfe 16 --concurrency 2 --wav_only --wire int16
run serve_c4_i16  python -m f5e_tts_tpu.serving.benchmark concurrent \
    --ref_audio /tmp/ref_r4.wav --nfe 16 --concurrency 4 --wav_only --wire int16
# chunked wav fetch: early requests resolve while later rows still cross the
# tunnel (end-to-end p50 lever on top of the int16 wire halving)
run serve_c2_i16x2 python -m f5e_tts_tpu.serving.benchmark concurrent \
    --ref_audio /tmp/ref_r4.wav --nfe 16 --concurrency 2 --wav_only \
    --wire int16 --xfer-chunks 2
run serve_c4_i16x4 python -m f5e_tts_tpu.serving.benchmark concurrent \
    --ref_audio /tmp/ref_r4.wav --nfe 16 --concurrency 4 --wav_only \
    --wire int16 --xfer-chunks 4
# EPSS pruned grid through the batcher (8 kept steps of the NFE-32 grid)
run serve_c2_epss8 python -m f5e_tts_tpu.serving.benchmark concurrent \
    --ref_audio /tmp/ref_r4.wav --nfe 32 --prune 0,1,2,3,4,6,10,18,32 \
    --concurrency 2 --wav_only --wire int16
# ode_unroll A/B: carry copies grew 27x at bs=8 in the round-3 duty trace;
# unroll=2 halves the loop-tuple round trips (bitwise-identical output)
run thru_b8_u1    python scripts/bench_throughput.py --batch 8 --nfe 32
run thru_b8_u2    python scripts/bench_throughput.py --batch 8 --nfe 32 --unroll 2
run train_b32     python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn
run trace_b32     python scripts/profile_train.py --batch 32 --len 1664 \
    --remat_policy save_attn
# MFU levers (round 4): hardware RBG for dropout rng + richer remat save set
run train_b32_rbg python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn --rbg
run train_b32_ff  python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn_ff --rbg
run train_b24_ff  python scripts/bench_train.py --batch 24 --len 1664 \
    --remat_policy save_attn_ff --rbg
# depth-scan unroll A/B (DiTConfig.scan_unroll): fewer while-loop round
# trips per layer, train + sampler sides
run bench_su2     python bench.py --nfe 16 --scan-unroll 2
run train_b32_su2 python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn --scan_unroll 2
echo "ALL DONE -> $OUT/summary.log"
