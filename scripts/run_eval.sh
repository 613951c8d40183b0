#!/usr/bin/env bash
# Canonical eval invocations (reference: src/f5_tts/eval/eval_infer_batch.sh).
# Requires local checkpoints/vocab + testset lists.
set -euo pipefail

CKPT=${CKPT:-ckpts/model_1250000.safetensors}
VOCAB=${VOCAB:-data/Emilia_ZH_EN_pinyin/vocab.txt}
VOCODER=${VOCODER:-pretrained_models/vocos-mel-24khz/pytorch_model.bin}
SEED=${SEED:-0}

# Seed-TTS EN, NFE 32, standard CFG
python -m f5e_tts_tpu.eval.eval_infer_batch -s "$SEED" -n F5TTS_v1_Base \
    --ckpt "$CKPT" --vocab "$VOCAB" --vocoder_local_path "$VOCODER" \
    -nfe 32 -t seedtts --metalst data/seedtts_testset/en/meta.lst

# LibriSpeech-PC test-clean cross-sentence, NFE 32
python -m f5e_tts_tpu.eval.eval_infer_batch -s "$SEED" -n F5TTS_v1_Base \
    --ckpt "$CKPT" --vocab "$VOCAB" --vocoder_local_path "$VOCODER" \
    -nfe 32 -t ls_pc_test_clean \
    --metalst data/librispeech_pc_test_clean_cross_sentence.lst \
    --librispeech_path data/LibriSpeech/test-clean

# dual-alpha TTS CFG sweep point (paper Tables 3-4)
python -m f5e_tts_tpu.eval.eval_infer_batch -s "$SEED" -n F5TTS_v1_Base \
    --ckpt "$CKPT" --vocab "$VOCAB" --vocoder_local_path "$VOCODER" \
    -nfe 32 -t seedtts --metalst data/seedtts_testset/en/meta.lst \
    --mode tts --alpha_spk 3.5 --alpha_txt 3.0
