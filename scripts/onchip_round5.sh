#!/bin/bash
# Round-5 on-chip evidence chain. Run when the axon tunnel is up:
#   bash scripts/onchip_round5.sh [outdir]
#
# Priority order (VERDICT r4 next-round list):
#  0. artifact watch (autoruns parity/goldens the moment artifacts land)
#  1. verify drive on chip
#  2. canonical bench re-capture with the steady-state-median method
#  3. MFU composes at Base b32x1664 (r4 best: rbg alone 1.895 s / 22.4%):
#     rbg x su2, +bnb(adamw8bit) A/B, and the fresh trace that names the
#     top non-matmul categories for the next lever
#  4. bs=8 throughput inversion: duty traces at bs=8 vs bs=1, plus a
#     padding-hypothesis A/B (bucket 1536 vs content-matched 1440)
set -u
OUT=${1:-/tmp/onchip_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:$PWD
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}

run() {  # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag: $* ===" | tee -a "$OUT/summary.log"
  timeout 3000 "$@" > "$OUT/$tag.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$tag.log" | tee -a "$OUT/summary.log"
  echo "--- rc=$rc ---" | tee -a "$OUT/summary.log"
}

# 0. blocked-artifact status (and parity autorun if anything landed)
run artifacts   python scripts/artifact_watch.py --out "$OUT/artifacts"

# 1. end-to-end correctness on chip
run verify      python .claude/skills/verify/verify_e2e.py

# 2. canonical bench (steady-state median, 4 warm + 8 timed)
run bench_nfe32 python bench.py
run bench_nfe16 python bench.py --nfe 16
run bench_su2_nfe16 python bench.py --nfe 16 --scan-unroll 2
run bench_int8_su2  python bench.py --nfe 16 --quantize int8 --scan-unroll 2
run bench_cfg0_su2  python bench.py --nfe 16 --cfg 0 --scan-unroll 2
# paired A/B for the serving-default composition decision (drift-immune)
run ab_default  python scripts/bench_ab.py --nfe 16 --ab \
    scan_unroll=1 scan_unroll=2 'scan_unroll=2,quantize=int8' \
    'scan_unroll=2,cfg=0' 'scan_unroll=2,quantize=int8,cfg=0'

# 3. training MFU composes at Base b32x1664 (all vs r4 rbg row 1.895 s / 22.4%)
run train_rbg       python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn --rbg
run train_rbg_su2   python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn --rbg --scan_unroll 2
run train_rbg_su2_bnb python scripts/bench_train.py --batch 32 --len 1664 \
    --remat_policy save_attn --rbg --scan_unroll 2 --bnb
# fresh per-op trace on the BEST config above -> name the top 3 non-matmul
# categories in BENCHMARKS.md (the r4 MFU attack contract)
run trace_best      python scripts/profile_train.py --batch 32 --len 1664 \
    --remat_policy save_attn --rbg
# sequence-length sensitivity: padding share of the 1664 bucket
run train_rbg_1536  python scripts/bench_train.py --batch 32 --len 1536 \
    --remat_policy save_attn --rbg

# 4. bs=8 inversion diagnostics
run duty_b1         python scripts/profile_duty.py --batch 1 --bucket 1536
run duty_b8         python scripts/profile_duty.py --batch 8 --bucket 1536
run thru_b8_pad     python scripts/bench_throughput.py --batch 8 --nfe 32 --bucket 1440
run thru_b8_base    python scripts/bench_throughput.py --batch 8 --nfe 32 --bucket 1536
run thru_b4         python scripts/bench_throughput.py --batch 4 --nfe 32 --bucket 1536
run thru_b2         python scripts/bench_throughput.py --batch 2 --nfe 32 --bucket 1536

echo "ALL DONE -> $OUT/summary.log"
